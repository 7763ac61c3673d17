"""Relational operators: broadcast join, partitioned hash join, top-k.

The reference has no relational joins (its lookups are driver dicts —
SURVEY.md §2.4); these operators are the engine's general-purpose
equivalents, used by the TPC-H-style queries() entries and by linking's
large-canon-map fallback.

Design notes for 100 TB:
- broadcast_join: small side is ray.put ONCE; each actor resolves the ref
  in __init__ and merges per batch (never re-shipped per batch).
- partitioned_join: both sides get a bucket column (hash(key) % B); one
  groupby on (bucket) co-locates matching keys; pandas merge per bucket.
  B sizes the shuffle granularity; salt hot keys upstream if a single key
  exceeds a bucket's memory.
- topk: per-batch local top-k partials, then a single-block final top-k —
  no global sort of the full dataset.
"""

from __future__ import annotations

import pandas as pd
import pyarrow as pa


def _row_hash(batch: pd.DataFrame, keys: list[str]):
    """Deterministic per-row uint64 hash of the key columns. Uses pandas'
    vectorized row hashing (C-speed for numeric/string dtypes) — measured
    >2x faster than string-concatenating keys on million-row batches, and
    stable across worker processes (fixed hash key)."""
    return pd.util.hash_pandas_object(batch[keys], index=False).to_numpy()


# per-worker-process cache of the deserialized broadcast table (one
# resolve per worker, not per batch; elastic task pool instead of a
# fixed-size actor pool so the stage scales with free CPUs)
_SMALL_CACHE: dict[str, pd.DataFrame] = {}


def _small_frame(small_ref) -> pd.DataFrame:
    import ray

    key = small_ref.hex()
    df = _SMALL_CACHE.get(key)
    if df is None:
        small = ray.get(small_ref)
        df = small.to_pandas() if isinstance(small, pa.Table) else small
        if len(_SMALL_CACHE) > 8:
            _SMALL_CACHE.clear()
        _SMALL_CACHE[key] = df
    return df


def broadcast_join(big_ds, small, on, *, how: str = "inner", concurrency=None,
                   suffix: str = "_r"):
    """Join a big Dataset against a small in-memory table (pandas/Arrow).

    ``small`` is placed in the object store once; each worker process
    resolves + caches the deserialized table once and merges per batch.
    """
    import ray

    small_ref = ray.put(small)

    def merge(batch: pd.DataFrame) -> pd.DataFrame:
        return batch.merge(_small_frame(small_ref), on=on, how=how,
                           suffixes=("", suffix))

    kwargs = {}
    if concurrency is not None:
        kwargs["concurrency"] = concurrency
    return big_ds.map_batches(merge, batch_format="pandas", **kwargs)


def cogroup(left_ds, right_ds, on: list[str], per_bucket, *, num_buckets: int = 32):
    """Hash-partitioned co-group: both sides bucketized on hash(key) % B,
    ONE shuffle co-locates buckets, and ``per_bucket`` receives the
    combined frame (``__side`` in {'L','R'}, NA-padded superset schema)
    for each bucket — the primitive behind partitioned_join and any join
    variant that fuses downstream work into the merge (verify-and-project,
    aggregate-after-join) so the joined payload never materializes."""
    lcols = list(left_ds.schema().names)
    rcols = list(right_ds.schema().names)
    extra_r = [c for c in rcols if c not in lcols]
    all_cols = lcols + extra_r

    def bucketize(side: str):
        def fn(batch: pd.DataFrame) -> pd.DataFrame:
            bucket = (_row_hash(batch, on) % num_buckets).astype("int64")
            batch = batch.copy()
            for c in all_cols:
                if c not in batch.columns:
                    batch[c] = pd.NA
            batch = batch[all_cols]
            batch["__bucket"] = bucket
            batch["__side"] = side
            return batch

        return fn

    both = left_ds.map_batches(bucketize("L"), batch_format="pandas").union(
        right_ds.map_batches(bucketize("R"), batch_format="pandas")
    )
    return both.groupby("__bucket").map_groups(per_bucket, batch_format="pandas")


def partitioned_join(left_ds, right_ds, on: list[str], *, num_buckets: int = 32,
                     how: str = "inner"):
    """Explicit partitioned hash join: cogroup + pandas merge per bucket."""
    lcols = list(left_ds.schema().names)
    rcols = list(right_ds.schema().names)

    def merge_bucket(group: pd.DataFrame) -> pd.DataFrame:
        lg = group.loc[group["__side"] == "L", lcols]
        rg = group.loc[group["__side"] == "R", rcols]
        # restore native dtypes degraded by the NA-padded union schema
        return lg.merge(rg, on=on, how=how, suffixes=("", "_r")).infer_objects()

    return cogroup(left_ds, right_ds, on, merge_bucket, num_buckets=num_buckets)


def hash_aggregate(ds, keys: list[str], agg_fn, *, num_buckets: int = 64):
    """Grouped aggregation via explicit hash bucketing: bucket = hash(key)
    % B as an int column, ONE cheap int-key shuffle, then a pandas hash
    groupby per bucket (C-speed). Avoids Ray's sort-based groupby, which
    global-sorts the whole dataset by string keys — profiled 10x slower on
    many-group aggregations (70k groups / 357k rows: 41s sort-based vs ~4s
    bucketed).

    ``agg_fn``: DataFrame -> DataFrame, applied per bucket; it must itself
    group by ``keys`` (each key lives in exactly one bucket, so per-bucket
    results are globally correct).
    """

    def bucketize(batch: pd.DataFrame) -> pd.DataFrame:
        batch = batch.copy()
        batch["__bucket"] = (_row_hash(batch, keys) % num_buckets).astype("int64")
        return batch

    def per_bucket(group: pd.DataFrame) -> pd.DataFrame:
        return agg_fn(group.drop(columns="__bucket"))

    return (
        ds.map_batches(bucketize, batch_format="pandas", batch_size=16384)
        .groupby("__bucket")
        .map_groups(per_bucket, batch_format="pandas")
    )


def topk(ds, by: list[tuple[str, bool]], k: int):
    """Top-k rows without a global sort: local per-batch top-k, then one
    final top-k over the concatenated partials.

    ``by`` is [(column, descending), ...]; include a unique tie-break
    column for determinism.
    """
    cols = [c for c, _ in by]
    asc = [not d for _, d in by]

    def local(batch: pd.DataFrame) -> pd.DataFrame:
        # tie-safe partial: keep every row tied with the k-th row on the
        # full by-spec, so truncation can never drop a row the final sort
        # would keep even if the caller's by-spec is not a total order
        s = batch.sort_values(cols, ascending=asc)
        if len(s) <= k:
            return s
        kth = s[cols].iloc[k - 1]
        tied = (s[cols] == kth.values).all(axis=1)
        cut = max(k, int(tied.to_numpy().nonzero()[0].max()) + 1)
        return s.head(cut)

    def final_cut(batch: pd.DataFrame) -> pd.DataFrame:
        return batch.sort_values(cols, ascending=asc).head(k)

    partials = ds.map_batches(local, batch_format="pandas")
    return partials.repartition(1).map_batches(
        final_cut, batch_format="pandas", batch_size=None
    )
