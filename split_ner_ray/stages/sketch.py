"""Mergeable approximate sketches: KMV distinct-count, Misra-Gries heavy
hitters.

At 10^12-turn scale exact distinct counts / full frequency tables over
high-cardinality keys (users, vocab, entity surfaces) are shuffle-bound;
both sketches here follow the partial+final shape: a bounded-size partial
per batch (map_batches, no shuffle), one tiny driver-side merge of the
partials (KB per partial regardless of input size). Both are
DETERMINISTIC — hashing is pandas' fixed-key siphash, trims are
value-ordered — so results are reproducible at any parallelism, and both
are EXACT below their capacity (KMV: distinct < k; MG: distinct <=
capacity with no trims), which is what makes the sf-small driver queries
SQL-hash-checkable while the same code degrades gracefully to a bounded
estimate at scale (error bounds covered by pytest in the estimator
regime).

No reference analog (the reference's distinct sets are exact driver sets,
analysis.py:124-137 / SURVEY §2.5 A7); these serve the
training-data-pipeline ops the north rule adds.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

_HASH_SPACE = float(2**64)


def _hash_col(values) -> np.ndarray:
    arr = np.asarray(values, dtype=object)
    if len(arr) == 0:
        return np.empty(0, dtype=np.uint64)
    return pd.util.hash_array(arr)


def kmv_partials(ds, col: str, *, k: int = 65536):
    """Per-batch KMV partial: the k smallest distinct uint64 hashes of
    ``col``, one list row per batch."""

    def partial(batch: pa.Table) -> pa.Table:
        h = np.unique(_hash_col(batch.column(col).to_pylist()))[:k]
        return pa.table({"kmv": pa.array([h], type=pa.list_(pa.uint64()))})

    return ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)


def approx_distinct(ds, col: str, *, k: int = 65536) -> tuple[int, bool]:
    """Approximate COUNT(DISTINCT col) via a k-minimum-values sketch.

    Returns ``(estimate, exact)``: while fewer than k distinct hashes
    exist the sketch holds all of them and the count is EXACT (exact =
    True); beyond that the standard KMV estimator (k-1) / kth_min *
    2^64 applies, with relative error ~1/sqrt(k-2). Partials are k
    uint64s per batch; the merge is a driver-side union of tiny lists.
    """
    parts = kmv_partials(ds, col, k=k).take_all()
    arrs = [np.asarray(p["kmv"], dtype=np.uint64) for p in parts]
    merged = np.unique(np.concatenate(arrs)) if arrs else np.empty(0, np.uint64)
    if len(merged) < k:
        return int(len(merged)), True
    kth = float(merged[k - 1])
    return int(round((k - 1) * _HASH_SPACE / kth)), False


def frequent_items(ds, col: str, *, capacity: int = 1024,
                   top: int | None = None) -> pd.DataFrame:
    """Misra-Gries heavy hitters over ``col``: (item, count) for the up-to
    ``capacity`` most frequent items, counts under-estimated by at most
    n/(capacity+1) overall. Each batch emits an MG-trimmed partial (<=
    capacity rows); partial counters merge by summing, and the merged
    table is MG-trimmed again (both trims are the standard decrement-by-
    the-(c+1)th-count step, so the union of partials keeps the MG
    guarantee). With total distinct <= capacity no trim ever fires and
    every count is EXACT. Output sorted by (count desc, item) —
    deterministic; ``top`` truncates after sorting."""

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        vc = batch[col].value_counts()
        if len(vc) > capacity:
            vc = vc - int(vc.iloc[capacity])
            vc = vc[vc > 0]
        out = vc.reset_index()
        out.columns = ["item", "count"]
        return out

    parts = ds.map_batches(partial, batch_format="pandas").to_pandas()
    merged = parts.groupby("item", as_index=False)["count"].sum()
    if len(merged) > capacity:
        kth = int(merged["count"].nlargest(capacity + 1).iloc[capacity])
        merged["count"] = merged["count"] - kth
        merged = merged[merged["count"] > 0]
    merged["count"] = merged["count"].astype("int64")
    merged = merged.sort_values(
        ["count", "item"], ascending=[False, True]
    ).reset_index(drop=True)
    return merged.head(top) if top is not None else merged
