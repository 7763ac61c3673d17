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


def _hash_col_md5(values) -> np.ndarray:
    """uint64 = first 16 hex chars of md5(str(v)) — the SQL-parity hash
    kernel: DuckDB computes the identical value as
    ``('0x'||substr(md5(v),1,16))::UBIGINT``, which is what lets the HLL
    driver queries carry a full register-exact SQL oracle. siphash
    (_hash_col) stays the default for scale paths (no per-row digest)."""
    import hashlib

    if not len(values):
        return np.empty(0, dtype=np.uint64)
    return np.array(
        [int(hashlib.md5(str(v).encode()).hexdigest()[:16], 16) for v in values],
        dtype=np.uint64,
    )


_HLL_HASHES = {"siphash": _hash_col, "md5": _hash_col_md5}


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


class QuantileCompactor:
    """KLL-lite quantile summary: level i holds an array whose elements
    each represent 2**i original values. When a level exceeds
    ``capacity`` its sorted values are halved by keeping the EVEN
    indices — no RNG (unlike randomized KLL), so a run is reproducible
    for a fixed batch partitioning; the compaction *history* still
    depends on chunk boundaries, so only the sub-capacity regime is
    batch-split-invariant. With no compaction (total values <=
    capacity) the summary is EXACT — that regime is what makes the
    driver query SQL-hash-checkable — and in the compacted regime the
    rank error stays O(levels * capacity/2), bounded empirically by
    pytest."""

    def __init__(self, capacity: int = 8192):
        self.capacity = capacity
        self.levels: list[np.ndarray] = [np.empty(0, dtype=np.float64)]
        self.compacted = False

    def add(self, values: np.ndarray, level: int = 0) -> None:
        while len(self.levels) <= level:
            self.levels.append(np.empty(0, dtype=np.float64))
        self.levels[level] = np.concatenate(
            [self.levels[level], np.asarray(values, dtype=np.float64)]
        )
        i = level
        while i < len(self.levels) and len(self.levels[i]) > self.capacity:
            promoted = np.sort(self.levels[i])[0::2]
            self.levels[i] = np.empty(0, dtype=np.float64)
            self.compacted = True
            if i + 1 == len(self.levels):
                self.levels.append(np.empty(0, dtype=np.float64))
            self.levels[i + 1] = np.concatenate([self.levels[i + 1], promoted])
            i += 1

    def merge(self, other: "QuantileCompactor") -> None:
        for lvl, vals in enumerate(other.levels):
            if len(vals):
                self.add(vals, level=lvl)
        self.compacted = self.compacted or other.compacted

    def quantiles(self, qs) -> list[float]:
        """Weighted discrete quantiles (percentile_disc semantics: the
        smallest value whose cumulative weight >= ceil(q * N)). Each q
        is a float, or a (num, den) tuple for exact-integer rank math —
        float ceil(q*N) can land one rank off the SQL oracle's integer
        expression when q*N is an exact integer (0.9*2010 ==
        1809.0000000000002 in binary)."""
        vals = np.concatenate([v for v in self.levels if len(v)] or
                              [np.empty(0, dtype=np.float64)])
        wts = np.concatenate(
            [np.full(len(v), 1 << i, dtype=np.int64)
             for i, v in enumerate(self.levels) if len(v)] or
            [np.empty(0, dtype=np.int64)]
        )
        if not len(vals):
            return [float("nan")] * len(qs)
        order = np.argsort(vals, kind="stable")
        vals, wts = vals[order], wts[order]
        cum = np.cumsum(wts)
        n = int(cum[-1])
        out = []
        for q in qs:
            if isinstance(q, tuple):
                num, den = q
                rank = max(1, -(-num * n // den))
            else:
                rank = max(1, int(np.ceil(q * n)))
            out.append(float(vals[np.searchsorted(cum, rank)]))
        return out


def quantile_partials_by(ds, col: str, by: str, *, capacity: int = 8192):
    """Per-batch quantile-summary partials grouped by ``by``: each row is
    (by, level, vals list) from a batch-local compactor — bounded at
    capacity * log2(batch/capacity) floats per (batch, group) regardless
    of batch size, so the driver merge reads a stream whose volume is a
    fraction of the raw column at scale."""

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        rows = {"by": [], "level": [], "vals": []}
        for key, sub in batch.groupby(by, sort=False):
            c = QuantileCompactor(capacity)
            c.add(sub[col].to_numpy(dtype=np.float64))
            for lvl, vals in enumerate(c.levels):
                if len(vals):
                    rows["by"].append(key)
                    rows["level"].append(lvl)
                    rows["vals"].append(vals.tolist())
        return pd.DataFrame(rows)

    return ds.map_batches(partial, batch_format="pandas")


def approx_quantiles_by(ds, col: str, by: str, qs: list[float],
                        *, capacity: int = 8192) -> pd.DataFrame:
    """Grouped approximate quantiles: one bounded compactor per group on
    the driver, fed by the streamed batch partials (no shuffle). EXACT
    (percentile_disc) whenever a group's total count <= capacity —
    which makes the driver query SQL-hash-checkable at compare sf while
    the same code degrades to a bounded-rank-error estimate at 10^12
    rows. Returns (by, q_mille, value, exact) sorted by (by, q_mille)."""
    comps: dict[object, QuantileCompactor] = {}
    for part in quantile_partials_by(ds, col, by, capacity=capacity).iter_batches(
        batch_format="pandas", batch_size=256
    ):
        for key, lvl, vals in zip(part["by"], part["level"], part["vals"]):
            c = comps.setdefault(key, QuantileCompactor(capacity))
            c.add(np.asarray(vals, dtype=np.float64), level=int(lvl))
    milles = [int(round(1000 * q)) for q in qs]
    rows = {"by": [], "q_mille": [], "value": [], "exact": []}
    for key in sorted(comps):
        c = comps[key]
        vals = c.quantiles([(m, 1000) for m in milles])
        for m, v in zip(milles, vals):
            rows["by"].append(key)
            rows["q_mille"].append(m)
            rows["value"].append(v)
            rows["exact"].append(not c.compacted)
    out = pd.DataFrame(rows)
    out["q_mille"] = out["q_mille"].astype("int64")
    return out.sort_values(["by", "q_mille"]).reset_index(drop=True)


def _hll_registers(h: np.ndarray, p: int, m: int) -> np.ndarray:
    """uint64 hashes -> one 2^p-byte HLL register array: register index =
    top p bits, rho = 1 + leading zeros of the remaining bits (a planted
    stop bit bounds rho <= 64-p+1). Shared by the global and grouped
    sketches so the estimator semantics cannot drift."""
    regs = np.zeros(m, dtype=np.uint8)
    if not len(h):
        return regs
    idx = (h >> np.uint64(64 - p)).astype(np.int64)
    rest = (h << np.uint64(p)) | np.uint64((1 << p) - 1)
    rho = np.zeros(len(h), dtype=np.uint8)
    probe = np.uint64(1) << np.uint64(63)
    alive = np.ones(len(h), dtype=bool)
    r = 1
    while alive.any() and r <= 64 - p + 1:
        hit = alive & ((rest & probe) != 0)
        rho[hit] = r
        alive &= ~hit
        probe >>= np.uint64(1)
        r += 1
    np.maximum.at(regs, idx, rho)
    return regs


def hll_partials(ds, col: str, *, p: int = 12, hash: str = "siphash"):
    """Per-batch HyperLogLog register partial: m = 2^p uint8 registers,
    register j = max over the batch's hashes landing in j of
    (1 + leading-zero count of the remaining 64-p bits). One m-byte row
    per batch regardless of batch size. ``hash="md5"`` selects the
    SQL-parity kernel (see _hash_col_md5)."""
    m = 1 << p
    hash_fn = _HLL_HASHES[hash]

    def partial(batch: pa.Table) -> pa.Table:
        h = hash_fn(batch.column(col).to_pylist())
        regs = _hll_registers(h, p, m)
        return pa.table({"hll": pa.array([regs], type=pa.list_(pa.uint8()))})

    return ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)


def hll_estimate(regs: np.ndarray) -> int:
    """Standard bias-corrected HLL estimator with the small-range
    linear-counting correction (deterministic given the registers)."""
    m = len(regs)
    alpha = 0.7213 / (1.0 + 1.079 / m)
    e = alpha * m * m / np.sum(np.exp2(-regs.astype(np.float64)))
    zeros = int((regs == 0).sum())
    if e <= 2.5 * m and zeros > 0:
        e = m * np.log(m / zeros)
    return int(round(e))


def hll_distinct(ds, col: str, *, p: int = 12) -> int:
    """Approximate COUNT(DISTINCT col) via HyperLogLog: fixed 2^p-byte
    state however large the input (KMV's memory grows with k for the
    same error; HLL's ~1.04/sqrt(m) error costs 4 KiB at p=12). The
    driver merge is an elementwise register max — associative and
    commutative, so the estimate is IDENTICAL at any batching or
    parallelism. Error bounds are pytest-verified (no SQL hash check:
    the estimator is approximate by construction; exact-path companion
    is sketch.approx_distinct / KMV below capacity)."""
    m = 1 << p
    regs = np.zeros(m, dtype=np.uint8)
    for row in hll_partials(ds, col, p=p).take_all():
        regs = np.maximum(regs, np.asarray(row["hll"], dtype=np.uint8))
    return hll_estimate(regs)


def hll_register_stats(regs: np.ndarray) -> dict:
    """Integer-exact summary of a merged register array, hash-checkable
    against a SQL oracle that recomputes the registers from md5 bits:
    zero_regs, sum/max of rho, an order-free register checksum
    sum((idx+1)*rho), plus the (rounded-int) estimate."""
    nz = np.nonzero(regs)[0]
    rho = regs[nz].astype(np.int64)
    return {
        "m": int(len(regs)),
        "zero_regs": int(len(regs) - len(nz)),
        "sum_rho": int(rho.sum()),
        "max_rho": int(rho.max()) if len(rho) else 0,
        "reg_checksum": int(((nz.astype(np.int64) + 1) * rho).sum()),
        "est": hll_estimate(regs),
    }


def hll_distinct_stats(ds, col: str, *, p: int = 12,
                       hash: str = "md5") -> dict:
    """hll_distinct plus the register stats — the driver-checkable form
    (md5 kernel by default so the oracle can rebuild the registers)."""
    m = 1 << p
    regs = np.zeros(m, dtype=np.uint8)
    for row in hll_partials(ds, col, p=p, hash=hash).take_all():
        regs = np.maximum(regs, np.asarray(row["hll"], dtype=np.uint8))
    return hll_register_stats(regs)


def hll_distinct_by(ds, key_col: str, col: str, *, p: int = 12,
                    num_buckets: int = 32, hash: str = "siphash",
                    full: bool = False):
    """Per-key HyperLogLog distinct counts: one 2^p-byte register row per
    (batch, key) partial (mergeable by elementwise max, so the estimate
    per key is batching-invariant), merged per key in ONE bucketed
    aggregate — the COUNT(DISTINCT x) GROUP BY k shape at cardinalities
    where exact per-key sets would dominate the shuffle. Returns a
    pandas DataFrame (key, est) — group-cardinality-sized."""
    import pandas as pd

    from .relational import hash_aggregate

    m = 1 << p
    hash_fn = _HLL_HASHES[hash]

    def partial(batch: pa.Table) -> "pd.DataFrame":
        df = pd.DataFrame({
            "k": batch.column(key_col).to_pandas(),
            "v": batch.column(col).to_pylist(),
        })
        rows = {"k": [], "regs": []}
        for k, grp in df.groupby("k", sort=False):
            regs = _hll_registers(hash_fn(grp["v"].to_numpy()), p, m)
            rows["k"].append(k)
            rows["regs"].append(regs.tobytes())
        return pd.DataFrame(rows)

    parts = ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        out = []
        for k, grp in g.groupby("k", sort=False):
            regs = np.zeros(m, dtype=np.uint8)
            for b in grp["regs"]:
                regs = np.maximum(regs, np.frombuffer(b, dtype=np.uint8))
            row = hll_register_stats(regs) if full else {"est": hll_estimate(regs)}
            out.append({"k": k, **row})
        cols = ["k"] + (["m", "zero_regs", "sum_rho", "max_rho",
                         "reg_checksum", "est"] if full else ["est"])
        df_out = pd.DataFrame(out, columns=cols)
        return df_out.astype({c: "int64" for c in cols if c != "k"})

    return hash_aggregate(parts, ["k"], merge, num_buckets=num_buckets).to_pandas()
