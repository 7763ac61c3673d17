"""Deduplication operators: exact, MinHash+LSH, SimHash, n-gram Jaccard,
embedding-cosine near-dup (driver-required training-data-pipeline ops).

All stages follow the guide's canonical shapes: vectorized per-batch
signature computation -> explode to (band, hash, id) rows -> groupby bands
-> candidate pairs -> verify -> connected components (stages/graph.py) for
cluster assignment. Every hash is seeded/deterministic (pandas' fixed-key
siphash for strings + fixed FNV folds + fixed linear perms mod a Mersenne
prime), so results are reproducible at any parallelism.

Scale-critical layout decisions (round 3): MinHash signatures live as
Arrow ``fixed_size_list(uint64, P)`` columns and shingle sets as
sorted-unique ``list(uint64)`` columns END TO END, viewed as numpy
matrices wherever they are read. And candidate-pair verification never
ships that payload through a shuffle at all: above the broadcast limit it
is a SHARD-GATHER join (relational.build_shard_lookup) — the payload
table is hash-sharded once into id-sorted object-store shards, and one
streaming map over the (int-only) pair rows gathers the two payload rows
per pair from worker-cached shards. The two earlier designs both failed
at the 2.17M-doc stress: Python ``bytes`` in pandas object columns
pickled per element through the join shuffles (157 s for 9.8M pairs),
and Arrow-native payload joins still made the second sort shuffle a
15.7 GB all-to-all (>14 min, 33 GB driver estimate).
"""

from __future__ import annotations

import hashlib
import random
import re

import numpy as np
import pandas as pd
import pyarrow as pa

_PRIME = (1 << 61) - 1
_WS = re.compile(r"\s+")

_FNV_OFF = np.uint64(1469598103934665603)
_FNV_PRIME = np.uint64(1099511628211)

PAIR_SCHEMA = pa.schema([("src", pa.int64()), ("dst", pa.int64())])

# per-worker cache of the broadcast (sorted ids, signature matrix) pair
# (one resolve per worker process, not per batch)
_SIG_CACHE: dict[str, tuple] = {}


def _sig_lookup(ref) -> tuple[np.ndarray, np.ndarray]:
    import ray

    key = ref.hex()
    hit = _SIG_CACHE.get(key)
    if hit is None:
        hit = ray.get(ref)
        _SIG_CACHE.clear()
        _SIG_CACHE[key] = hit
    return hit


# bump whenever the shingle/signature hashing kernel changes (blake2b ->
# siphash was v2): persistent MinHash index dirs embed this so a kernel
# change can never silently probe an index built with the old hashes
MINHASH_KERNEL_VERSION = 2


def _hash_strings(strs: list[str]) -> np.ndarray:
    """Vectorized deterministic uint64 hash of many strings in ONE C call
    (pandas' fixed-key siphash) — replaces a per-string blake2b loop that
    capped signature throughput at ~90k docs/s."""
    if not strs:
        return np.empty(0, dtype=np.uint64)
    return pd.util.hash_array(np.asarray(strs, dtype=object))


def _ranges(counts: np.ndarray) -> np.ndarray:
    """[0..c0), [0..c1), ... concatenated (vectorized arange-per-segment)."""
    total = int(counts.sum())
    ends = np.cumsum(counts)
    return np.arange(total, dtype=np.int64) - np.repeat(ends - counts, counts)


def _shingle_stream(texts: list[str], ngram: int):
    """Tokenize a batch and hash every word n-gram shingle: returns
    (shingle_hashes uint64, per-doc shingle counts int64). A doc with
    0 < tokens < ngram contributes ONE shingle (the fold of all its
    tokens — the hashed analog of word_shingles' single joined shingle);
    an empty doc contributes none. One vectorized string-hash call per
    batch, then pure-numpy FNV folds over consecutive token hashes —
    identical identity structure to the string shingles (two shingles
    collide iff their token tuples match, up to 2^-64 hash collisions)."""
    tok_lists = [t.split() for t in texts]
    counts = np.array([len(t) for t in tok_lists], dtype=np.int64)
    th = _hash_strings([w for toks in tok_lists for w in toks])
    starts = np.concatenate([[0], np.cumsum(counts)])

    sh_counts = np.where(
        counts >= ngram, counts - ngram + 1, np.where(counts > 0, 1, 0)
    ).astype(np.int64)
    out = np.empty(int(sh_counts.sum()), dtype=np.uint64)
    out_starts = np.concatenate([[0], np.cumsum(sh_counts)])

    big = np.nonzero(counts >= ngram)[0]
    if len(big):
        n_sh = counts[big] - ngram + 1
        pos = np.repeat(starts[big], n_sh) + _ranges(n_sh)
        sh = np.full(len(pos), _FNV_OFF, dtype=np.uint64)
        for j in range(ngram):
            sh = (sh ^ th[pos + j]) * _FNV_PRIME
        # scatter the contiguous runs into the output stream
        dst = np.repeat(out_starts[big], n_sh) + _ranges(n_sh)
        out[dst] = sh
    small = np.nonzero((counts > 0) & (counts < ngram))[0]
    mask64 = (1 << 64) - 1
    for d in small:  # rare path: short docs, tiny loop (python ints: no
        h = int(_FNV_OFF)  # numpy scalar overflow warnings, same wrap)
        for p in range(starts[d], starts[d + 1]):
            h = ((h ^ int(th[p])) * int(_FNV_PRIME)) & mask64
        out[out_starts[d]] = np.uint64(h)
    return out, sh_counts


def word_shingles(text: str, n: int = 3) -> set[str]:
    toks = _WS.split(text.strip()) if text.strip() else []
    if len(toks) < n:
        return {" ".join(toks)} if toks else set()
    return {" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)}


# ---------------------------------------------------------------------------
# exact dedup (op D1/D5 mechanics over documents)
# ---------------------------------------------------------------------------

def exact_dedup(ds, id_col: str = "doc_id", text_col: str = "text"):
    """content md5 -> bucketed hash aggregate -> (hash, keep_id=min id,
    n_dups). The vectorized hash runs inside map_batches; the shuffle moves
    only (hash, id) pairs, and the aggregation is ONE pandas groupby per
    int bucket (no per-distinct-hash UDF dispatch)."""
    from .relational import hash_aggregate

    def hash_batch(batch: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "h": [hashlib.md5(t.encode()).hexdigest() for t in batch[text_col]],
                id_col: batch[id_col].astype("int64"),
            }
        )

    hashed = ds.map_batches(hash_batch, batch_format="pandas")

    def agg(g: pd.DataFrame) -> pd.DataFrame:
        out = g.groupby("h", as_index=False).agg(
            keep_id=(id_col, "min"), n_dups=(id_col, "size")
        )
        out["keep_id"] = out["keep_id"].astype("int64")
        out["n_dups"] = out["n_dups"].astype("int64")
        return out

    return hash_aggregate(hashed, ["h"], agg)


def dedup_keep_newest(ds, keys: list[str], by: list[tuple[str, bool]],
                      *, num_buckets: int = 64):
    """Keep exactly ONE row per key group: the first under ``by``
    ([(col, descending), ...] — e.g. [("ts", True), ("event_id", True)]
    = newest, ties broken by id). The keep-latest-record dedup policy a
    training-data pipeline needs next to keep-min-id ``exact_dedup``.

    Partial+final shape: a vectorized per-BATCH combiner (sort +
    drop_duplicates, many keys per call) keeps one candidate per key
    before the shuffle, so the single bucketed exchange moves at most
    one row per (key, batch) — at 10^12 rows with duplicate-heavy keys
    the shuffle volume is the distinct-key count times the block count,
    not the input size. Include a unique tie-break column in ``by`` for
    determinism. No reference analog (SURVEY §2.6 D-ops are diff/union
    driven); this is an engine addition (§2.11)."""
    from .relational import hash_aggregate

    cols = [c for c, _ in by]
    asc = [not d for _, d in by]

    def keep_first(frame: pd.DataFrame) -> pd.DataFrame:
        s = frame.sort_values(cols + keys, ascending=asc + [True] * len(keys),
                              kind="stable")
        return s.drop_duplicates(subset=keys, keep="first")

    partials = ds.map_batches(keep_first, batch_format="pandas")
    return hash_aggregate(partials, keys, keep_first,
                          num_buckets=num_buckets)


# ---------------------------------------------------------------------------
# MinHash + LSH near-dup (shingle -> minhash -> band -> bucket groupby)
# ---------------------------------------------------------------------------

class MinHasher:
    """Seeded P-perm MinHash over word n-gram shingles; signatures are a
    pure function of the text (deterministic across workers). The batch
    path is fully vectorized: one string-hash call per batch, FNV shingle
    folds, a (P, S) modular-linear perm matrix, and per-doc mins via
    ``np.minimum.reduceat`` over the shingle stream."""

    # bound the (P, S) perm matrix to ~64 MB per task regardless of batch
    # shape (chunk over the shingle stream at doc granularity)
    MAX_SHINGLES_PER_CHUNK = 131_072

    def __init__(self, num_perm: int = 64, ngram: int = 3, seed: int = 7):
        rng = random.Random(seed)
        self.a = np.array([rng.randrange(1, _PRIME) for _ in range(num_perm)], dtype=np.uint64)
        self.b = np.array([rng.randrange(0, _PRIME) for _ in range(num_perm)], dtype=np.uint64)
        self.num_perm = num_perm
        self.ngram = ngram

    def _min_over(self, sh: np.ndarray, seg_starts: np.ndarray) -> np.ndarray:
        prod = (self.a[:, None] * sh[None, :] + self.b[:, None]) % _PRIME
        return np.minimum.reduceat(prod, seg_starts, axis=1).T  # (D', P)

    def signature_batch(self, texts: list[str]) -> np.ndarray:
        """-> (len(texts), num_perm) uint64 matrix; empty docs = _PRIME."""
        D = len(texts)
        out = np.full((D, self.num_perm), _PRIME, dtype=np.uint64)
        sh, sh_counts = _shingle_stream(texts, self.ngram)
        if not len(sh):
            return out
        nonempty = np.nonzero(sh_counts > 0)[0]
        offs = np.concatenate([[0], np.cumsum(sh_counts)])
        # chunk over docs so the perm matrix stays bounded
        lo = 0
        while lo < len(nonempty):
            hi = lo
            tot = 0
            while hi < len(nonempty) and (
                tot + sh_counts[nonempty[hi]] <= self.MAX_SHINGLES_PER_CHUNK or hi == lo
            ):
                tot += sh_counts[nonempty[hi]]
                hi += 1
            docs = nonempty[lo:hi]
            chunk = np.concatenate(
                [sh[offs[d] : offs[d + 1]] for d in docs]
            ) if len(docs) > 1 else sh[offs[docs[0]] : offs[docs[0] + 1]]
            seg = np.concatenate([[0], np.cumsum(sh_counts[docs])])[:-1]
            out[docs] = self._min_over(chunk, seg)
            lo = hi
        return out

    def signature(self, text: str) -> np.ndarray:
        return self.signature_batch([text])[0]


def _sig_matrix(col) -> np.ndarray:
    """Arrow fixed_size_list(uint64, P) column -> (N, P) numpy view
    (zero-copy off the Arrow buffers; flatten() handles slice offsets)."""
    arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    width = arr.type.list_size
    if len(arr) == 0:
        return np.empty((0, width), dtype=np.uint64)
    return arr.flatten().to_numpy(zero_copy_only=False).reshape(len(arr), width)


def minhash_signatures(ds, *, id_col: str = "doc_id", text_col: str = "text",
                       num_perm: int = 64, ngram: int = 3, seed: int = 7):
    """docs -> Arrow (id:int64, sig:fixed_size_list<uint64, P>) rows — one
    compact fixed-width value per doc that every downstream stage reads as
    a numpy matrix without per-element conversion."""

    class Sigs:
        def __init__(self):
            self.mh = MinHasher(num_perm, ngram, seed)

        def __call__(self, batch: pa.Table) -> pa.Table:
            texts = batch.column(text_col).to_pylist()
            mat = self.mh.signature_batch(texts)
            sig = pa.FixedSizeListArray.from_arrays(
                pa.array(mat.reshape(-1), type=pa.uint64()), num_perm
            )
            import pyarrow.compute as pc

            return pa.table(
                {"id": pc.cast(batch.column(id_col), pa.int64()), "sig": sig}
            )

    # stateless-cheap setup (two numpy arrays): an elastic task pool uses
    # every free CPU instead of capping the stage at a fixed actor count
    return ds.map_batches(Sigs(), batch_format="pyarrow", batch_size=4096,
                          zero_copy_batch=True)


def _band_hashes(mat: np.ndarray, bands: int) -> np.ndarray:
    """(D, P) signature matrix -> (D, bands) int64 band hashes (FNV fold
    over each band's rows — pure numpy, no per-row loop)."""
    D, P = mat.shape
    r = P // bands
    resh = mat.reshape(D, bands, r)
    h = np.full((D, bands), _FNV_OFF, dtype=np.uint64)
    for j in range(r):
        h = (h ^ resh[:, :, j]) * _FNV_PRIME
    return h.view(np.int64)


def minhash_band_rows(sig_ds, *, num_perm: int = 64, bands: int = 16):
    """signatures -> (band, band_hash, id) integer rows — the only thing
    the LSH shuffle moves. Vectorized: numpy band folds + repeat/tile."""

    def explode(batch: pa.Table) -> pa.Table:
        mat = _sig_matrix(batch.column("sig"))
        ids = batch.column("id").to_numpy(zero_copy_only=False)
        bh = _band_hashes(mat, bands)
        D = len(ids)
        return pa.table(
            {
                "band": pa.array(np.tile(np.arange(bands, dtype=np.int64), D)),
                "band_hash": pa.array(bh.reshape(-1)),
                "id": pa.array(np.repeat(ids, bands)),
            }
        )

    return sig_ds.map_batches(explode, batch_format="pyarrow", zero_copy_batch=True)


# Signature tables below this row count are broadcast for candidate
# verification (ray.put once, worker-cached — a normal broadcast-join
# small-side decision, ~100 MB at the limit); above it the pairs are
# verified by a shard-gather join against the hash-sharded signature
# table — the 100 TB path: the signatures are never shuffled, each
# cluster node pulls each shard at most once, and per-task memory is
# bounded by the shards a pair batch actually touches.
BROADCAST_SIGS_LIMIT = 200_000

# Buckets larger than this emit STAR edges (bucket-minimum -> member)
# instead of all pairs: a duplicate-heavy corpus puts thousands of
# identical documents into one band bucket, and O(k^2) pair emission
# explodes (measured: worker OOM deaths on 2.17M template-generated
# turns). Star edges preserve the connected components for the common
# case (bucket-mates that verify against the minimum verify
# transitively); all-pairs is kept below the cap where borderline
# near-dups matter. NOTE for callers consuming PAIRS (not components):
# in a >cap bucket a near-dup pair of two non-min members is represented
# only via the bucket minimum, and if either member fails verification
# against the minimum that pair is absent from the output — a documented
# pairs-level recall trade for O(k) instead of O(k^2) work (see
# simhash_dup_pairs / cosine_dup_pairs for the same note).
BUCKET_PAIR_CAP = 64


def candidate_pairs_from_bands(band_rows, sig_ds, *, verify_threshold: float = 0.7,
                               broadcast_sigs_limit: int = BROADCAST_SIGS_LIMIT,
                               bucket_pair_cap: int = BUCKET_PAIR_CAP):
    """groupby(band, band_hash) -> candidate pairs (src < dst), verified
    against the signatures (broadcast under the limit, shard-gather join
    above), deduped.

    Verification = signature-estimated Jaccard >= threshold (the standard
    MinHash estimator); exact-Jaccard re-check is verify_jaccard_pairs.
    Above the broadcast limit the signature table is hash-sharded into
    the object store once and each pair batch gathers its two signature
    rows from worker-cached shards — signatures never ride a shuffle."""
    import ray

    from .relational import hash_aggregate

    def buckets_fn(g: pd.DataFrame) -> pd.DataFrame:
        # one task handles MANY (band, band_hash) buckets. The dominant
        # (duplicate-heavy) star path is fully VECTORIZED — a python loop
        # over millions of buckets was the measured bottleneck at 2.17M
        # docs; the python all-pairs loop only ever touches buckets below
        # the cap.
        g = g.drop_duplicates(["band", "band_hash", "id"])
        grp = g.groupby(["band", "band_hash"], sort=False)["id"]
        sizes = grp.transform("size")
        mins = grp.transform("min")
        frames = []
        big = sizes > bucket_pair_cap
        if big.any():  # star to the bucket minimum: O(k), CC-equivalent
            sub = g[big]
            m = mins[big].to_numpy()
            ids = sub["id"].to_numpy()
            keep = ids != m
            frames.append(pd.DataFrame(
                {"src": pd.array(m[keep], dtype="int64"),
                 "dst": pd.array(ids[keep], dtype="int64")}
            ))
        small = g[(~big) & (sizes > 1)]
        if len(small):
            src, dst = [], []
            for _key, sub in small.groupby(["band", "band_hash"], sort=False):
                ids = sorted(sub["id"].tolist())
                for x in range(len(ids)):
                    for y in range(x + 1, len(ids)):
                        src.append(ids[x])
                        dst.append(ids[y])
            frames.append(pd.DataFrame(
                {"src": pd.array(src, dtype="int64"), "dst": pd.array(dst, dtype="int64")}
            ))
        if not frames:
            return pd.DataFrame(
                {"src": pd.array([], dtype="int64"), "dst": pd.array([], dtype="int64")}
            )
        return pd.concat(frames, ignore_index=True)

    pairs = hash_aggregate(band_rows, ["band", "band_hash"], buckets_fn)

    def dedup_pairs(g: pd.DataFrame) -> pd.DataFrame:
        return g.drop_duplicates(["src", "dst"])

    if sig_ds.count() <= broadcast_sigs_limit:
        # broadcast verify first (a map, no shuffle), THEN one dedup
        # shuffle over the verified (smaller) pair set
        tbl = pa.concat_tables(ray.get(sig_ds.to_arrow_refs()))
        ids = tbl.column("id").to_numpy(zero_copy_only=False)
        mat = _sig_matrix(tbl.column("sig"))
        order = np.argsort(ids)
        ref = ray.put((ids[order], mat[order]))

        def verify_b(batch: pd.DataFrame) -> pd.DataFrame:
            if not len(batch):
                return batch[["src", "dst"]]
            ids_s, m = _sig_lookup(ref)
            src = batch["src"].to_numpy(dtype=np.int64)
            dst = batch["dst"].to_numpy(dtype=np.int64)
            i = np.clip(np.searchsorted(ids_s, src), 0, len(ids_s) - 1)
            j = np.clip(np.searchsorted(ids_s, dst), 0, len(ids_s) - 1)
            # pairs referencing ids absent from the signature table are
            # dropped (same inner semantics as the shard-gather path) —
            # an unchecked gather would silently compare a wrong row
            ok = (ids_s[i] == src) & (ids_s[j] == dst)
            est = (m[i] == m[j]).mean(axis=1)
            return batch.loc[ok & (est >= verify_threshold), ["src", "dst"]]

        verified = pairs.map_batches(verify_b, batch_format="pandas")
        return hash_aggregate(verified, ["src", "dst"], dedup_pairs)

    pairs = hash_aggregate(pairs, ["src", "dst"], dedup_pairs)
    return _verify_pairs_sharded(
        pairs, sig_ds, "sig",
        lambda a, b: (a == b).mean(axis=1) >= verify_threshold,
        matrix_of=_sig_matrix,
    )


def _verify_pairs_sharded(pairs, payload_ds, payload_col, keep_fn, *,
                          matrix_of, extra_cols_fn=None):
    """Shared verify shape for (src, dst) candidate pairs against a
    payload table, as a SHARD-GATHER join: the payload is hash-sharded
    once into id-sorted object-store shards (build_shard_lookup — the
    payload is shuffled ZERO times), then ONE streaming map over the
    pairs gathers both payload rows per pair from worker-cached shards
    and applies the verdict. Replaces the former two-cogroup join, whose
    second sort shuffle carried |pairs| x payload bytes (15.7 GB at the
    2.17M-doc stress) and dominated the dedup run; pairs that reference
    ids absent from the payload table are dropped (the old inner-join
    semantics).

    ``payload_ds``: Arrow (id, payload_col); ``matrix_of``: Arrow column ->
    per-row numpy structure; ``keep_fn(a, b) -> bool mask``;
    ``extra_cols_fn(a, b, keep) -> dict of extra output columns``."""
    from .relational import build_shard_lookup, gather_from_shards

    shard_refs, num_shards = build_shard_lookup(payload_ds, "id", payload_col)

    def empty_out() -> pa.Table:
        cols = {"src": pa.array([], pa.int64()), "dst": pa.array([], pa.int64())}
        if extra_cols_fn is not None:
            cols.update(extra_cols_fn(None, None, None))
        return pa.table(cols)

    def verify(batch: pd.DataFrame) -> pa.Table:
        if not len(batch):
            return empty_out()
        src = batch["src"].to_numpy(dtype=np.int64)
        dst = batch["dst"].to_numpy(dtype=np.int64)
        a_vals, ok_a = gather_from_shards(src, shard_refs, num_shards)
        b_vals, ok_b = gather_from_shards(dst, shard_refs, num_shards)
        both = ok_a & ok_b
        if not both.any():
            return empty_out()
        a = matrix_of(a_vals.filter(pa.array(both[ok_a])))
        b = matrix_of(b_vals.filter(pa.array(both[ok_b])))
        keep = np.asarray(keep_fn(a, b))
        cols = {
            "src": pa.array(src[both][keep]),
            "dst": pa.array(dst[both][keep]),
        }
        if extra_cols_fn is not None:
            cols.update(extra_cols_fn(a, b, keep))
        return pa.table(cols)

    return pairs.map_batches(verify, batch_format="pandas")


def minhash_clusters(ds, *, id_col: str = "doc_id", text_col: str = "text",
                     num_perm: int = 64, bands: int = 16, ngram: int = 3,
                     seed: int = 7, verify_threshold: float = 0.7):
    """Full MinHash-LSH near-dup pipeline -> (node=id, label=cluster rep).
    Cluster rep = min doc id of the component (stages/graph.py CC)."""
    from .graph import connected_components

    sigs = minhash_signatures(
        ds, id_col=id_col, text_col=text_col, num_perm=num_perm, ngram=ngram, seed=seed
    ).materialize()
    bandr = minhash_band_rows(sigs, num_perm=num_perm, bands=bands)
    pairs = candidate_pairs_from_bands(bandr, sigs, verify_threshold=verify_threshold)
    return connected_components(pairs)


# ---------------------------------------------------------------------------
# SimHash near-dup
# ---------------------------------------------------------------------------

_BIT_SHIFTS = np.arange(64, dtype=np.uint64)
_BIT_WEIGHTS = np.uint64(1) << _BIT_SHIFTS


def simhash_batch(texts: list[str]) -> np.ndarray:
    """Vectorized 64-bit SimHash over whitespace tokens (unweighted) for a
    whole batch -> uint64 array. ONE `_hash_strings` call for all tokens,
    then the bit matrix via `unpackbits` (uint8, no 64-wide int64
    temporaries) and the per-doc majority vote via `np.add.reduceat`
    segment sums — zero Python per-row work. The ±1 accumulator `> 0`
    rule is equivalent to `2 * ones > count` on the raw bit sums.
    Tokenless docs hash to 0 (the historical `simhash64('')` contract)."""
    tok_lists = [t.split() for t in texts]
    counts = np.array([len(t) for t in tok_lists], dtype=np.int64)
    th = _hash_strings([w for toks in tok_lists for w in toks])
    out = np.zeros(len(texts), dtype=np.uint64)
    nz = counts > 0
    if not nz.any():
        return out
    # (T, 64) uint8 bit matrix; bitorder='little' makes column i == bit i
    bits = np.unpackbits(th.view(np.uint8), bitorder="little").reshape(-1, 64)
    ends = np.cumsum(counts)
    starts = (ends - counts)[nz]
    ones = np.add.reduceat(bits, starts, axis=0, dtype=np.int64)
    maj = (2 * ones) > counts[nz, None]
    out[nz] = (maj.astype(np.uint64) * _BIT_WEIGHTS[None, :]).sum(
        axis=1, dtype=np.uint64
    )
    return out


def simhash64(text: str) -> int:
    """Single-doc SimHash — thin wrapper over the batch kernel (shared by
    the serial oracle, so engine and oracle hash identically)."""
    return int(simhash_batch([text])[0])


def _popcount64(x: np.ndarray) -> np.ndarray:
    """Vectorized popcount of a uint64 array (bytewise unpackbits sum)."""
    return np.unpackbits(x.view(np.uint8)).reshape(len(x), 8 * 8).sum(axis=1)


def simhash_dup_pairs(ds, *, id_col: str = "doc_id", text_col: str = "text",
                      max_hamming: int = 3):
    """SimHash blocking: 4 x 16-bit bands (any pair within hamming<=3 shares
    at least one exact band by pigeonhole) -> verify hamming distance.

    Pairs-level recall note: buckets above BUCKET_PAIR_CAP emit star edges
    through the bucket minimum only — a non-min/non-min near-dup pair in
    such a bucket appears only if both members verify against the minimum.
    Component structure is preserved; direct pair consumers see fewer pairs
    in duplicate-heavy buckets (same trade as candidate_pairs_from_bands)."""

    def sigs(batch: pd.DataFrame) -> pd.DataFrame:
        n = len(batch)
        s = simhash_batch(list(batch[text_col]))
        ids = batch[id_col].to_numpy(dtype="int64")
        # 4 band rows per doc via repeat/tile — no per-row loop
        bands = np.tile(np.arange(4, dtype=np.int64), n)
        srep = np.repeat(s, 4)
        band_val = ((srep >> (np.uint64(16) * bands.astype(np.uint64)))
                    & np.uint64(0xFFFF)).astype(np.int64)
        return pd.DataFrame(
            {
                "band": bands,
                "band_val": band_val,
                "id": np.repeat(ids, 4),
                # int64 carrier for the uint64 signature (offset encoding
                # so the value survives pandas/Arrow int64 columns)
                "sim": np.repeat(s.view(np.int64) ^ np.int64(-(1 << 63)), 4),
            }
        )

    rows = ds.map_batches(sigs, batch_format="pandas")

    def per_bucket(group: pd.DataFrame) -> pd.DataFrame:
        # dedupe (id, sim) pairs, not id alone: a clean corpus emits each
        # (band, id) once so this is the same thing, but if duplicate
        # doc_ids with DIFFERENT texts ever reach the stage both
        # signatures stay in play instead of one being silently dropped
        d = group.drop_duplicates(["id", "sim"]).sort_values("id")
        ids = d["id"].to_numpy(dtype=np.int64)
        sims = (d["sim"].to_numpy(dtype=np.int64) ^ np.int64(-(1 << 63))).view(np.uint64)
        k = len(ids)
        if k < 2:
            return pd.DataFrame({"src": pd.array([], dtype="int64"),
                                 "dst": pd.array([], dtype="int64")})
        if k > BUCKET_PAIR_CAP:
            # duplicate-heavy bucket: star to the minimum (same rationale
            # as candidate_pairs_from_bands — O(k) instead of O(k^2))
            xi = np.zeros(k - 1, dtype=np.int64)
            yi = np.arange(1, k, dtype=np.int64)
        else:
            xi, yi = np.triu_indices(k, k=1)
        ok = _popcount64(sims[xi] ^ sims[yi]) <= max_hamming
        return pd.DataFrame(
            {"src": pd.array(ids[xi[ok]], dtype="int64"),
             "dst": pd.array(ids[yi[ok]], dtype="int64")}
        )

    from .relational import hash_aggregate

    def buckets_fn(g: pd.DataFrame) -> pd.DataFrame:
        frames = [per_bucket(sub) for _k, sub in g.groupby(["band", "band_val"], sort=False)]
        return pd.concat(frames, ignore_index=True) if frames else per_bucket(g)

    pairs = hash_aggregate(rows, ["band", "band_val"], buckets_fn)
    return hash_aggregate(pairs, ["src", "dst"], lambda g: g.drop_duplicates(["src", "dst"]))


# ---------------------------------------------------------------------------
# exact n-gram Jaccard verification (for LSH candidates)
# ---------------------------------------------------------------------------

def shingle_sets(docs_ds, *, id_col: str = "doc_id", text_col: str = "text",
                 ngram: int = 3):
    """docs -> Arrow (id:int64, sh:list<uint64>) sorted-unique hashed
    shingle sets (vectorized: one hash pass + a global lexsort dedup)."""
    import pyarrow.compute as pc

    def per_batch(batch: pa.Table) -> pa.Table:
        texts = batch.column(text_col).to_pylist()
        sh, counts = _shingle_stream(texts, ngram)
        doc_of = np.repeat(np.arange(len(texts), dtype=np.int64), counts)
        if len(sh):
            order = np.lexsort((sh, doc_of))
            sh, doc_of = sh[order], doc_of[order]
            first = np.ones(len(sh), dtype=bool)
            first[1:] = (sh[1:] != sh[:-1]) | (doc_of[1:] != doc_of[:-1])
            sh, doc_of = sh[first], doc_of[first]
        uniq_counts = np.bincount(doc_of, minlength=len(texts))
        offsets = np.concatenate([[0], np.cumsum(uniq_counts)]).astype(np.int32)
        lst = pa.ListArray.from_arrays(
            pa.array(offsets, pa.int32()), pa.array(sh, pa.uint64())
        )
        return pa.table(
            {"id": pc.cast(batch.column(id_col), pa.int64()), "sh": lst}
        )

    return docs_ds.map_batches(per_batch, batch_format="pyarrow", zero_copy_batch=True)


def _list_rows(col) -> list[np.ndarray]:
    """Arrow list<uint64> column -> list of per-row numpy arrays."""
    arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    values = arr.values.to_numpy(zero_copy_only=False)
    offsets = arr.offsets.to_numpy(zero_copy_only=False)
    return [values[offsets[i]: offsets[i + 1]] for i in range(len(arr))]


def verify_jaccard_pairs(pairs_ds, docs_ds, *, id_col: str = "doc_id",
                         text_col: str = "text", ngram: int = 3,
                         threshold: float = 0.7):
    """Re-check candidate pairs with exact shingle Jaccard via a
    shard-gather join of pairs against per-doc shingle sets — fully
    distributed (no driver-side candidate set, no full-table broadcast:
    the shingle sets are hash-sharded once into the object store and each
    pair batch gathers exactly the rows it references from worker-cached
    shards). Shingle sets stay Arrow list<uint64> buffers end to end and
    the per-pair intersection is a sorted-array intersect. Output adds
    integer jac_num/jac_den (SQL-exact) plus the float ratio."""
    sh_ds = shingle_sets(docs_ds, id_col=id_col, text_col=text_col, ngram=ngram)

    state: dict = {}

    def keep_fn(a_rows, b_rows):
        num = np.empty(len(a_rows), dtype=np.int64)
        den = np.empty(len(a_rows), dtype=np.int64)
        for i, (a, b) in enumerate(zip(a_rows, b_rows)):
            inter = np.intersect1d(a, b, assume_unique=True).size
            num[i] = inter
            den[i] = len(a) + len(b) - inter
        jac = np.where(den > 0, num / np.maximum(den, 1), 0.0)
        keep = jac >= threshold
        state["num"], state["den"], state["jac"] = num, den, jac
        return keep

    def extra_cols(a_rows, b_rows, keep):
        if a_rows is None:
            return {
                "jac_num": pa.array([], pa.int64()),
                "jac_den": pa.array([], pa.int64()),
                "jaccard": pa.array([], pa.float64()),
            }
        return {
            "jac_num": pa.array(state["num"][keep]),
            "jac_den": pa.array(state["den"][keep]),
            "jaccard": pa.array(state["jac"][keep]),
        }

    return _verify_pairs_sharded(
        pairs_ds, sh_ds, "sh", keep_fn, matrix_of=_list_rows,
        extra_cols_fn=extra_cols,
    )


# ---------------------------------------------------------------------------
# embedding-cosine near-dup
# ---------------------------------------------------------------------------

def cosine_dup_pairs(emb_ds, *, id_col: str = "vec_id", vec_col: str = "embedding",
                     threshold: float = 0.95, num_planes: int = 12, seed: int = 11,
                     num_tables: int = 1, lsh: bool = True):
    """Near-duplicate vector pairs by cosine similarity.

    DEFAULT = random-hyperplane LSH bucketing (bucket shuffle, pairwise
    within bucket) — the 100 TB path; nothing corpus-shaped touches the
    driver. Single-table recall for a pair at angle theta is
    (1 - theta/pi)^num_planes; ``num_tables`` > 1 runs the standard
    OR-construction (each vector hashes into one bucket PER table, a pair
    is a candidate if ANY table collides): recall = 1-(1-p^k)^L at k
    planes x L tables, at L x shuffle volume. ``lsh=False`` opts into
    exact O(N^2) brute force, which materializes the full embedding matrix
    as a broadcast — correct, but for small inputs only (kept as the
    recall oracle the tests verify the LSH path against).

    Pairs-level recall note (same as simhash_dup_pairs): buckets above
    4*BUCKET_PAIR_CAP star-verify against the bucket minimum only, so
    direct pair consumers see fewer pairs inside duplicate-heavy buckets;
    connected components are preserved for members similar to the minimum.
    """
    import ray

    from .relational import hash_aggregate

    from .vectors import (fixed_list_carrier, float_value_type, stack_rows,
                          vec_matrix)

    if not lsh:
        mat_rows = emb_ds.select_columns([id_col, vec_col]).take_all()
        ids = np.array([r[id_col] for r in mat_rows], dtype=np.int64)
        mat = stack_rows([r[vec_col] for r in mat_rows])
        norms = np.linalg.norm(mat, axis=1)
        norms[norms == 0] = 1.0
        ref = ray.put((ids, mat / norms[:, None]))

        def brute(batch: pa.Table) -> pd.DataFrame:
            # ray.get resolves from the worker-local object store after the
            # first call — the broadcast is shipped once per node, not per batch
            all_ids, matn = ray.get(ref)
            qids = batch.column(id_col).to_numpy(zero_copy_only=False).astype(np.int64)
            v = vec_matrix(batch.column(vec_col))
            n = np.linalg.norm(v, axis=1)
            n[n == 0] = 1.0
            sims = (v / n[:, None]) @ matn.T
            # (row, hit) index pairs in one pass; keep qid < hit ordering
            ri, ci = np.nonzero(sims >= threshold)
            src, dst = qids[ri], all_ids[ci]
            keep = src < dst
            return pd.DataFrame(
                {"src": pd.array(src[keep], dtype="int64"),
                 "dst": pd.array(dst[keep], dtype="int64")}
            )

        return emb_ds.map_batches(brute, batch_format="pyarrow")

    # LSH path: only the embedding DIMENSION is read on the driver
    dim = len(emb_ds.take(1)[0][vec_col])
    rng = np.random.RandomState(seed)
    planes_ref = ray.put(rng.randn(num_tables, num_planes, dim))

    def bucketize(batch: pa.Table) -> pa.Table:
        planes = ray.get(planes_ref)
        v = vec_matrix(batch.column(vec_col))
        ids = batch.column(id_col).to_numpy(zero_copy_only=False).astype(np.int64)
        L, P = planes.shape[0], planes.shape[1]
        n = len(ids)
        weights = 1 << np.arange(P, dtype=np.int64)
        buckets = np.empty((L, n), dtype=np.int64)
        for t in range(L):
            bits = (v @ planes[t].T) > 0
            # table id folded into the bucket key so tables never mix
            # inside one bucket group
            buckets[t] = (bits @ weights) * L + t
        # vectors ride the bucket shuffle as Arrow fixed_size_list at the
        # SOURCE float width (float32 parquet stays compact, float64 input
        # is never narrowed) — the same fix that took the MinHash verify
        # join from 157s to 17.6s; `take` repeats the row block per table
        # without a Python copy loop
        carrier = fixed_list_carrier(v, float_value_type(batch.column(vec_col)))
        rep = np.tile(np.arange(n, dtype=np.int64), L)
        return pa.table(
            {
                "bucket": pa.array(buckets.reshape(-1)),
                "id": pa.array(np.tile(ids, L)),
                "vec": carrier.take(pa.array(rep)),
            }
        )

    rows = emb_ds.map_batches(bucketize, batch_format="pyarrow")

    def _bucket_pairs(ids_l: np.ndarray, vn: np.ndarray):
        """Pairs >= threshold within one LSH bucket (rows sorted by id)."""
        k = len(ids_l)
        if k < 2:
            return None
        if k > BUCKET_PAIR_CAP * 4:
            # duplicate-heavy bucket: star-verify against the min id only
            # (O(k) memory/compute instead of a k x k sims matrix)
            sims0 = vn[1:] @ vn[0]
            hit = (sims0 >= threshold) & (ids_l[1:] != ids_l[0])
            return (np.full(int(hit.sum()), ids_l[0], dtype=np.int64),
                    ids_l[1:][hit])
        sims = vn @ vn.T
        xi, yi = np.triu_indices(k, k=1)
        ok = (sims[xi, yi] >= threshold) & (ids_l[xi] != ids_l[yi])
        a, b = ids_l[xi[ok]], ids_l[yi[ok]]
        return np.minimum(a, b), np.maximum(a, b)

    def buckets_fn(g: pa.Table) -> pd.DataFrame:
        # one task handles many LSH buckets — no per-bucket UDF dispatch;
        # normalize the whole task's matrix ONCE, then slice id-sorted runs
        buckets = g.column("bucket").to_numpy(zero_copy_only=False)
        ids = g.column("id").to_numpy(zero_copy_only=False).astype(np.int64)
        vecs = vec_matrix(g.column("vec"))
        nrm = np.linalg.norm(vecs, axis=1)
        nrm[nrm == 0] = 1.0
        vn = vecs / nrm[:, None]
        order = np.lexsort((ids, buckets))
        _, starts = np.unique(buckets[order], return_index=True)
        ends = np.append(starts[1:], len(order))
        srcs, dsts = [], []
        for lo, hi in zip(starts, ends):
            sel = order[lo:hi]
            got = _bucket_pairs(ids[sel], vn[sel])
            if got is not None and len(got[0]):
                srcs.append(got[0])
                dsts.append(got[1])
        if not srcs:
            return pd.DataFrame({"src": pd.array([], dtype="int64"),
                                 "dst": pd.array([], dtype="int64")})
        return pd.DataFrame({"src": np.concatenate(srcs),
                             "dst": np.concatenate(dsts)})

    pairs = hash_aggregate(rows, ["bucket"], buckets_fn, batch_format="pyarrow")
    return hash_aggregate(pairs, ["src", "dst"], lambda g: g.drop_duplicates(["src", "dst"]))


BROADCAST_SIZES_LIMIT = 2_000_000


def fuzzy_self_jaccard(ds, id_col: str, text_col: str, *, num: int = 1,
                       den: int = 2, num_buckets: int = 64,
                       max_token_df: int | None = None,
                       broadcast_sizes_limit: int = BROADCAST_SIZES_LIMIT):
    """Fuzzy self-join on token-set Jaccard (entity-resolution shape):
    all id pairs whose lowercased whitespace-token sets satisfy
    |A∩B| / |A∪B| >= num/den, compared as integers (den*inter >=
    num*(|A|+|B|-inter)) so the result is hash-exact vs SQL.

    Composition: intersection sizes ARE co-occurrence pair counts with
    the TOKEN as the group key (graph.cooccurrence_pairs — one bucketed
    self-merge per token bucket, partials aggregated on the pair key);
    per-id set sizes are batch-local (row = whole record) and joined
    back. The size table is one row per input id — corpus-growing, not
    vocabulary-bounded — so above ``broadcast_sizes_limit`` rows it is
    joined via two bucketed ``partitioned_join`` exchanges (int-key
    shuffles of (id, n) pairs) instead of driver-``to_pandas`` +
    broadcast; both paths are result-identical (tested either side of
    the threshold). ``max_token_df`` caps a stop-token's block (first-k
    ids in sort order, documented pairs-level recall loss in
    cooccurrence_pairs) — the standard prefix-filtering concession for
    tokens shared by half the corpus.
    Output: (<id>_1, <id>_2, inter, uni) with id_1 < id_2.
    """
    from .graph import cooccurrence_pairs
    from .relational import broadcast_join, partitioned_join

    def tok_rows(b: pd.DataFrame) -> pd.DataFrame:
        toks = b[text_col].str.lower().str.strip().str.split().map(
            lambda ts: sorted(set(ts)) if isinstance(ts, list) else [])
        lens = toks.map(len).to_numpy()
        import numpy as np
        return pd.DataFrame({
            "tok": toks.explode().dropna().to_numpy(dtype=object),
            id_col: np.repeat(b[id_col].to_numpy(), lens),
        })

    def sizes(b: pd.DataFrame) -> pd.DataFrame:
        n = b[text_col].str.lower().str.strip().str.split().map(
            lambda ts: len(set(ts)) if isinstance(ts, list) else 0)
        return pd.DataFrame({id_col: b[id_col], "n": n.astype("int64")})

    rows = ds.map_batches(tok_rows, batch_format="pandas")
    inter = cooccurrence_pairs(rows, ["tok"], [id_col],
                               num_buckets=num_buckets,
                               max_group_items=max_token_df)
    i1, i2 = f"{id_col}_1", f"{id_col}_2"
    # the narrow (id, n) sizes table is materialized ONCE and its count
    # picks the join regime — counting the raw ds would re-execute the
    # whole upstream pipeline just to choose a path
    sz = ds.map_batches(sizes, batch_format="pandas").materialize()
    if sz.count() <= broadcast_sizes_limit:
        size_df = sz.to_pandas()
        s1 = size_df.rename(columns={id_col: i1, "n": "n_1"})
        s2 = size_df.rename(columns={id_col: i2, "n": "n_2"})
        joined = broadcast_join(broadcast_join(inter, s1, [i1]), s2, [i2])
    else:
        # corpus-scale fallback: the size table never touches the driver —
        # two bucketed int-key partitioned joins instead
        s1d = sz.map_batches(
            lambda b: b.rename(columns={id_col: i1, "n": "n_1"}),
            batch_format="pandas")
        s2d = sz.map_batches(
            lambda b: b.rename(columns={id_col: i2, "n": "n_2"}),
            batch_format="pandas")
        joined = partitioned_join(
            partitioned_join(inter, s1d, [i1], num_buckets=num_buckets),
            s2d, [i2], num_buckets=num_buckets)

    def keep(b: pd.DataFrame) -> pd.DataFrame:
        uni = b["n_1"] + b["n_2"] - b["n_pair"]
        out = b[den * b["n_pair"] >= num * uni].copy()
        out["inter"] = out["n_pair"].astype("int64")
        out["uni"] = (out["n_1"] + out["n_2"] - out["n_pair"]).astype("int64")
        return out[[i1, i2, "inter", "uni"]]

    return joined.map_batches(keep, batch_format="pandas")


# ---------------------------------------------------------------------------
# line-level dedup (CCNet-style boilerplate removal)
# ---------------------------------------------------------------------------

DUP_LINES_BROADCAST_LIMIT = 5_000_000


def line_dedup_docs(ds, *, id_col: str = "doc_id", text_col: str = "text",
                    max_line_df: int = 2, sep: str = "\n",
                    dup_broadcast_limit: int = DUP_LINES_BROADCAST_LIMIT):
    """CCNet-style line-level dedup: remove every line whose corpus-wide
    document-frequency exceeds ``max_line_df`` (navigation chrome, cookie
    banners, boilerplate headers), preserving the order of surviving
    lines. Adds ``n_lines`` / ``n_kept`` and rewrites ``text_col``.

    Shape: pass 1 counts line frequencies with per-batch ``value_counts``
    partials and ONE bucketed string-key aggregate (the df filter runs
    inside the aggregate, so only lines ALREADY over the threshold — the
    boilerplate set, not the corpus line set — ever leave it). When that
    set fits ``dup_broadcast_limit`` it is broadcast (ray.put once) and
    pass 2 rewrites each batch locally with ZERO further shuffles. Above
    the limit, the distributed fallback left-tags exploded (id, pos,
    line) rows against the dup set in one line-key cogroup and reassembles
    docs in one id-key aggregate — two int/string-key exchanges, nothing
    driver-sized. Both paths honor ONE schema contract (tested either
    side of the threshold): all input columns in input order with
    ``text_col`` rewritten in place, then ``n_lines`` / ``n_kept``
    appended — the fallback re-joins non-text columns by id and reorders
    to match. ``sep`` is the line delimiter (real corpora: newline;
    the oracle-checked query uses a token delimiter because the synthetic
    documents table is single-line).
    """
    import ray

    from .relational import cogroup, hash_aggregate, partitioned_join, sides

    def partials(b: pd.DataFrame) -> pd.DataFrame:
        vc = b[text_col].str.split(sep, regex=False).explode().value_counts()
        return pd.DataFrame({"line": vc.index.to_numpy(dtype=object),
                             "n": vc.to_numpy().astype(np.int64)})

    def over_df(g: pd.DataFrame) -> pd.DataFrame:
        out = g.groupby("line", as_index=False)["n"].sum()
        return out.loc[out["n"] > max_line_df, ["line"]]

    dup_ds = hash_aggregate(
        ds.map_batches(partials, batch_format="pandas"), ["line"], over_df
    ).materialize()

    if dup_ds.count() <= dup_broadcast_limit:
        dup_df = dup_ds.to_pandas()
        dup_ref = ray.put(dup_df["line"].to_numpy(dtype=object))

        def rewrite(b: pd.DataFrame) -> pd.DataFrame:
            dup = ray.get(dup_ref)
            split_lists = b[text_col].str.split(sep, regex=False)
            counts = split_lists.map(len).to_numpy()
            flat = split_lists.explode().to_numpy(dtype=object)
            keep = ~pd.Index(flat).isin(dup)
            ends = np.cumsum(counts)
            texts = []
            kept_counts = np.empty(len(counts), dtype=np.int64)
            lo = 0
            for i, hi in enumerate(ends):
                m = keep[lo:hi]
                kept_counts[i] = int(m.sum())
                texts.append(sep.join(flat[lo:hi][m]))
                lo = hi
            out = b.copy()
            out["n_lines"] = counts.astype(np.int64)
            out["n_kept"] = kept_counts
            out[text_col] = texts
            return out

        return ds.map_batches(rewrite, batch_format="pandas")

    # distributed fallback: nothing driver-sized
    def explode_rows(b: pd.DataFrame) -> pd.DataFrame:
        split_lists = b[text_col].str.split(sep, regex=False)
        counts = split_lists.map(len).to_numpy()
        return pd.DataFrame({
            id_col: np.repeat(b[id_col].to_numpy(), counts),
            "pos": _ranges(counts),
            "line": split_lists.explode().to_numpy(dtype=object),
        })

    lines = ds.map_batches(explode_rows, batch_format="pandas")

    def tag_bucket(group) -> pd.DataFrame:
        lt, rt = sides(group)
        lg = lt.select([id_col, "pos", "line"]).to_pandas()
        dup_lines = rt.select(["line"]).to_pandas()["line"]
        lg["dup"] = lg["line"].isin(set(dup_lines))
        return lg

    tagged = cogroup(lines, dup_ds, ["line"], tag_bucket)

    def reassemble(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values([id_col, "pos"], kind="mergesort")
        ids, idx, counts = np.unique(g[id_col].to_numpy(),
                                     return_index=True, return_counts=True)
        flat = g["line"].to_numpy(dtype=object)
        dup = g["dup"].to_numpy(dtype=bool)
        texts = []
        kept_counts = np.empty(len(ids), dtype=np.int64)
        for i, (lo, c) in enumerate(zip(idx, counts)):
            m = ~dup[lo:lo + c]
            kept_counts[i] = int(m.sum())
            texts.append(sep.join(flat[lo:lo + c][m]))
        return pd.DataFrame({id_col: ids, text_col: texts,
                             "n_lines": counts.astype(np.int64),
                             "n_kept": kept_counts})

    out = hash_aggregate(tagged, [id_col], reassemble)
    in_cols = list(ds.schema().names)
    extra_cols = [c for c in in_cols if c not in (id_col, text_col)]
    if extra_cols:
        # restore non-text input columns so both paths share one schema
        # (a volume-triggered schema change would be a production trap)
        rest = ds.map_batches(lambda b: b[[id_col] + extra_cols],
                              batch_format="pandas")
        out = partitioned_join(out, rest, [id_col])
    # one schema contract for both regimes: input column ORDER preserved,
    # n_lines/n_kept appended — identical to the broadcast path, so which
    # regime ran is invisible to positional consumers
    order = in_cols + ["n_lines", "n_kept"]
    return out.map_batches(lambda b: b[order], batch_format="pandas")


# ---------------------------------------------------------------------------
# incremental (delta) MinHash dedup against a persistent disk index
# ---------------------------------------------------------------------------

def minhash_index_build(docs_ds, index_dir: str, *, id_col: str = "doc_id",
                        text_col: str = "text", num_perm: int = 64,
                        ngram: int = 3, seed: int = 7, bands: int = 16,
                        shards: int = 64) -> dict:
    """Build a persistent MinHash-LSH index for INCREMENTAL dedup — the
    'dedupe each new crawl against the existing corpus' shape, where
    re-running pairwise dedup over corpus+delta would re-read everything.

    Layout (all partition-pruned at read time):
      sigs/id_shard=S/    (id, sig fixed_size_list<uint64>) with
                          S = id % shards — verification gathers OLD
                          signatures reading only the shards candidate
                          ids fall in;
      bands/pkey=K/       (band_hash, id) with K = band * shards +
                          (band_hash % shards) — ONE hive partition
                          column, so a delta batch reads the whole band
                          index as ONE dataset with an isin partition
                          filter over exactly the K values its own band
                          hashes land in (pyarrow prunes unprobed
                          partitions at the fragment level; a per-probe
                          dataset union was measured pathological at
                          bands x shards datasets);
      meta.json           pins (num_perm, ngram, seed, bands, shards) so
                          queries hash identically.
    """
    import json
    import os

    sigs = minhash_signatures(docs_ds, id_col=id_col, text_col=text_col,
                              num_perm=num_perm, ngram=ngram,
                              seed=seed).materialize()
    _index_write_partitions(sigs, index_dir, num_perm=num_perm,
                            bands=bands, shards=shards)
    meta = {"num_perm": num_perm, "ngram": ngram, "seed": seed,
            "bands": bands, "shards": shards}
    with open(os.path.join(index_dir, "meta.json"), "w") as f:
        json.dump(meta, f)
    return meta


def _index_write_partitions(sigs, index_dir: str, *, num_perm: int,
                            bands: int, shards: int) -> None:
    """Write a signature Dataset into the index's two partition families
    (shared by build and append — write_parquet adds files to existing
    hive dirs, so an append just lands more files in the right
    partitions)."""
    import os

    def add_id_shard(b: pa.Table) -> pa.Table:
        ids = b.column("id").to_numpy(zero_copy_only=False)
        return b.append_column(
            "id_shard", pa.array((ids % shards).astype(np.int64)))

    # sort by the partition key before the partitioned write: otherwise
    # EVERY block splits into EVERY partition dir (blocks x shards tiny
    # files — measured 12,800 sig / 204,800 band files at 1M docs, and
    # the probe's read time was all file-open overhead). Sorted, each
    # partition dir holds O(1) files.
    sigs.map_batches(add_id_shard, batch_format="pyarrow").sort(
        "id_shard").write_parquet(
        os.path.join(index_dir, "sigs"), partition_cols=["id_shard"])

    def add_pkey(b: pa.Table) -> pa.Table:
        bh = b.column("band_hash").to_numpy(zero_copy_only=False)
        band = b.column("band").to_numpy(zero_copy_only=False)
        h = (bh.view(np.uint64) % np.uint64(shards)).astype(np.int64)
        return b.append_column("pkey", pa.array(band * shards + h))

    minhash_band_rows(sigs, num_perm=num_perm, bands=bands).map_batches(
        add_pkey, batch_format="pyarrow"
    ).sort("pkey").write_parquet(os.path.join(index_dir, "bands"),
                                 partition_cols=["pkey"])


def _index_recover(index_dir: str) -> None:
    """Finish or roll back torn append/compact operations. Called on
    every index open (append, probe, compact):
      * append-*/ without _SUCCESS = uncommitted stage -> deleted;
        with _SUCCESS = committed but partially merged -> remaining
        files are moved into the live partitions (moves are idempotent:
        each file is either still staged or already live);
      * a family dir replaced mid-compact (src missing) is restored
        from the complete .compact (preferred — the rename sequence
        only removes src AFTER the compacted tmp is fully written) or
        .old dir; leftover .old dirs are dropped."""
    import os
    import shutil

    for family in ("sigs", "bands"):
        src = os.path.join(index_dir, family)
        tmp, old = src + ".compact", src + ".old"
        if not os.path.isdir(src):
            if os.path.isdir(tmp):
                os.rename(tmp, src)
            elif os.path.isdir(old):
                os.rename(old, src)
        if os.path.isdir(src) and os.path.isdir(old):
            shutil.rmtree(old)
    for d in sorted(os.listdir(index_dir)) if os.path.isdir(index_dir) else []:
        stage = os.path.join(index_dir, d)
        if d.startswith("append-") and os.path.isdir(stage):
            if os.path.exists(os.path.join(stage, "_SUCCESS")):
                _merge_staged_append(index_dir, stage)
            else:
                shutil.rmtree(stage)


def _merge_staged_append(index_dir: str, stage: str) -> None:
    """Move a committed append stage's parquet files into the live
    partition dirs (per-file renames, unique-prefixed), then drop the
    stage. Idempotent: re-running after a crash moves whatever is left."""
    import os
    import shutil

    tag = os.path.basename(stage)
    for family in ("sigs", "bands"):
        fam_dir = os.path.join(stage, family)
        if not os.path.isdir(fam_dir):
            continue
        for part in sorted(os.listdir(fam_dir)):
            pdir = os.path.join(fam_dir, part)
            if not os.path.isdir(pdir):
                continue
            live = os.path.join(index_dir, family, part)
            os.makedirs(live, exist_ok=True)
            for f in sorted(os.listdir(pdir)):
                if f.endswith(".parquet"):
                    os.rename(os.path.join(pdir, f),
                              os.path.join(live, f"{tag}-{f}"))
    shutil.rmtree(stage)


def minhash_index_append(docs_ds, index_dir: str, *, id_col: str = "doc_id",
                         text_col: str = "text") -> dict:
    """Append accepted docs (e.g. a deduped delta) to an EXISTING index —
    the missing half of the incremental loop: crawl N is probed against
    the index, its keepers are appended, crawl N+1 then sees them.
    Hash parameters come from the index's meta.json, so appended rows
    hash identically to the original build; ids must remain globally
    unique across every append.

    Crash-safe: both families are written to a staged append-*/ dir,
    committed with _SUCCESS, then merged into the live partitions by
    per-file renames — a kill at any point leaves the index either
    without the append (uncommitted stage deleted on next open) or with
    it completed (committed stage's remaining moves finished on next
    open); sigs-without-bands torn states cannot occur. Each append adds
    O(sorted-blocks) files per touched partition — run
    minhash_index_compact periodically to fold them back to O(1)."""
    import json
    import os
    import tempfile

    _index_recover(index_dir)
    with open(os.path.join(index_dir, "meta.json")) as f:
        meta = json.load(f)
    sigs = minhash_signatures(
        docs_ds, id_col=id_col, text_col=text_col,
        num_perm=int(meta["num_perm"]), ngram=int(meta["ngram"]),
        seed=int(meta["seed"])).materialize()
    stage = tempfile.mkdtemp(prefix="append-", dir=index_dir)
    _index_write_partitions(sigs, stage,
                            num_perm=int(meta["num_perm"]),
                            bands=int(meta["bands"]),
                            shards=int(meta["shards"]))
    with open(os.path.join(stage, "_SUCCESS"), "w") as f:
        f.write("ok")
    _merge_staged_append(index_dir, stage)
    return meta


def minhash_index_compact(index_dir: str) -> None:
    """Fold each partition family back to O(1) files per partition after
    a run of appends: one sorted pass per family (the partition keys are
    re-derived from data columns, so this reuses the build's
    sorted-partitioned-write discipline), committed by directory swap.
    Crash-safe via _index_recover: the compacted tmp is fully written
    BEFORE any rename, so a kill between the two renames leaves a
    complete .compact (restored as the family on next open) and a kill
    after them leaves only a leftover .old (dropped on next open)."""
    import os
    import shutil

    import ray.data as rd

    _index_recover(index_dir)
    for family in ("sigs", "bands"):
        src = os.path.join(index_dir, family)
        pcol = "id_shard" if family == "sigs" else "pkey"
        tmp = src + ".compact"
        shutil.rmtree(tmp, ignore_errors=True)
        # hive partition columns come back as data columns on read; one
        # sort restores the O(1)-files-per-dir layout
        rd.read_parquet(src).sort(pcol).write_parquet(
            tmp, partition_cols=[pcol])
        old = src + ".old"
        shutil.rmtree(old, ignore_errors=True)
        os.rename(src, old)
        os.rename(tmp, src)
        shutil.rmtree(old, ignore_errors=True)


DELTA_BROADCAST_LIMIT = 5_000_000


def minhash_dups_against_index(new_docs, index_dir: str, *,
                               id_col: str = "doc_id",
                               text_col: str = "text",
                               verify_threshold: float = 0.9,
                               max_matches_per_row: int = 256,
                               delta_broadcast_limit: int = DELTA_BROADCAST_LIMIT):
    """Near-dup pairs between a DELTA batch and the indexed corpus:
    Dataset (new_id, old_id, est) with estimated Jaccard >= threshold.

    Delta premise (|delta| << corpus): the delta's band rows are sorted
    per probed partition and broadcast ONCE (delta-sized, worker-cached);
    only the (band, bshard) index partitions the delta actually hashes
    into are read — unprobed corpus partitions never leave storage.
    Candidates per old row per band are capped at
    ``max_matches_per_row`` (first ids ascending — the usual
    duplicate-heavy-bucket recall trade, see BUCKET_PAIR_CAP).
    Verification is the signature-estimated Jaccard computed by the
    shard-gather join over OLD sigs read only from the id shards
    candidates fall in, unioned with the delta's own signatures
    (ids must be globally unique across corpus and delta).

    Above ``delta_broadcast_limit`` band rows the delta is no longer
    driver-sized: candidate generation switches to ONE side-tagged
    cogroup of the (whole) index band table against the delta band rows
    on (band, band_hash) — per bucket the new side is pre-capped to the
    ``max_matches_per_row`` smallest ids per hash (every old row in a
    hash shares the same candidate list, so this is the identical cap) —
    and verification reads all signature shards into the shard-gather
    payload instead of driver-collecting candidate ids. Both paths are
    result-identical (tested either side of the threshold)."""
    import json
    import os

    import ray
    import ray.data as rd

    from .relational import hash_aggregate

    _index_recover(index_dir)  # finish/roll back any torn append/compact
    with open(os.path.join(index_dir, "meta.json")) as f:
        meta = json.load(f)
    shards = int(meta["shards"])

    sigs_new = minhash_signatures(
        new_docs, id_col=id_col, text_col=text_col,
        num_perm=int(meta["num_perm"]), ngram=int(meta["ngram"]),
        seed=int(meta["seed"])).materialize()

    empty = pd.DataFrame({
        "new_id": pd.array([], dtype="int64"),
        "old_id": pd.array([], dtype="int64"),
        "est": pd.array([], dtype="float64")})

    rows_new_ds = minhash_band_rows(
        sigs_new, num_perm=int(meta["num_perm"]),
        bands=int(meta["bands"])).materialize()
    n_delta_rows = rows_new_ds.count()
    if n_delta_rows == 0:
        return rd.from_pandas(empty)
    if n_delta_rows > delta_broadcast_limit:
        return _delta_pairs_distributed(
            rows_new_ds, sigs_new, index_dir, shards,
            verify_threshold=verify_threshold,
            max_matches_per_row=max_matches_per_row)
    # delta band rows -> driver (delta-sized), grouped per probed partition
    rows_new = rows_new_ds.to_pandas()
    bh = rows_new["band_hash"].to_numpy()
    rows_new["pkey"] = (
        rows_new["band"].to_numpy(dtype=np.int64) * shards
        + (bh.view(np.uint64) % np.uint64(shards)).astype(np.int64))
    probe: dict[int, tuple[np.ndarray, np.ndarray]] = {}
    for pk, sub in rows_new.groupby("pkey", sort=False):
        s = sub.sort_values(["band_hash", "id"], kind="mergesort")
        probe[int(pk)] = (s["band_hash"].to_numpy(dtype=np.int64),
                          s["id"].to_numpy(dtype=np.int64))
    probe_ref = ray.put(probe)

    def match(batch: pd.DataFrame) -> pd.DataFrame:
        pr = ray.get(probe_ref)
        frames = []
        # pkey re-derived from data columns (hive partition fields are
        # not readable through Ray's filter binding in this version)
        bhv = batch["band_hash"].to_numpy()
        batch = batch.assign(pkey=(
            batch["band"].to_numpy(dtype=np.int64) * shards
            + (bhv.view(np.uint64) % np.uint64(shards)).astype(np.int64)))
        for pk, sub in batch.groupby("pkey", sort=False):
            hit = pr.get(int(pk))
            if hit is None:
                continue
            nbh, nid = hit
            obh = sub["band_hash"].to_numpy(dtype=np.int64)
            oid = sub["id"].to_numpy(dtype=np.int64)
            left = np.searchsorted(nbh, obh, side="left")
            right = np.searchsorted(nbh, obh, side="right")
            counts = np.minimum(right - left, max_matches_per_row)
            if not counts.sum():
                continue
            pos = _ranges(counts) + np.repeat(left, counts)
            frames.append(pd.DataFrame({
                "src": np.repeat(oid, counts),   # old (indexed) id
                "dst": nid[pos],                  # new (delta) id
            }))
        if not frames:
            return pd.DataFrame({"src": pd.array([], dtype="int64"),
                                 "dst": pd.array([], dtype="int64")})
        return pd.concat(frames, ignore_index=True)

    # ONE dataset over exactly the probed pkey dirs (partition pruning by
    # explicit file list — Ray's read filter can't bind hive fields here)
    files = []
    for pk in sorted(probe):
        pdir = os.path.join(index_dir, "bands", f"pkey={pk}")
        if os.path.isdir(pdir):
            files.extend(sorted(os.path.join(pdir, f)
                                for f in os.listdir(pdir)
                                if f.endswith(".parquet")))
    if not files:
        return rd.from_pandas(pd.DataFrame({
            "new_id": pd.array([], dtype="int64"),
            "old_id": pd.array([], dtype="int64"),
            "est": pd.array([], dtype="float64")}))
    pairs = rd.read_parquet(files).map_batches(match, batch_format="pandas")
    # src != dst: re-probing a delta that was ALREADY appended to the
    # index (a resumed crawl job) finds each doc's own indexed copy —
    # a self-match, not a duplicate
    pairs = hash_aggregate(
        pairs, ["src", "dst"],
        lambda g: g[g["src"] != g["dst"]].drop_duplicates(["src", "dst"])
    ).materialize()

    # old signatures: candidate OLD ids are delta-bounded (every pair has
    # a delta member), so collect them once, read ONLY the id shards they
    # fall in, and filter those shards down to the candidates — the
    # verify payload is candidate-sized, never corpus-sized
    cand_rows = pairs.map_batches(
        lambda b: pd.DataFrame({"src": np.unique(
            b["src"].to_numpy(dtype=np.int64))}),
        batch_format="pandas").to_pandas()
    cand_old = np.unique(cand_rows["src"].to_numpy(dtype=np.int64))         if len(cand_rows) else np.empty(0, np.int64)
    touched = sorted(set((cand_old % shards).tolist()))
    sig_files = []
    for s in touched:
        sdir = os.path.join(index_dir, "sigs", f"id_shard={s}")
        if os.path.isdir(sdir):
            sig_files.extend(sorted(os.path.join(sdir, f)
                                    for f in os.listdir(sdir)
                                    if f.endswith(".parquet")))
    if sig_files:
        cand_ref = ray.put(cand_old)
        # exclude indexed copies of the delta's own ids (same id = same
        # doc under the global-uniqueness contract): the delta's fresh
        # signatures take precedence, and a duplicate id in the verify
        # payload would trip build_shard_lookup's duplicate-key guard
        new_ids = np.sort(sigs_new.select_columns(["id"]).to_pandas()["id"]
                          .to_numpy(dtype=np.int64))
        new_ids_ref = ray.put(new_ids)

        def keep_cands(b: pa.Table) -> pa.Table:
            ids = b.column("id").to_numpy(zero_copy_only=False)
            m = np.isin(ids, ray.get(cand_ref), assume_unique=False)
            nid = ray.get(new_ids_ref)
            if len(nid):
                pos = np.searchsorted(nid, ids)
                pos[pos == len(nid)] = 0
                m &= ~(nid[pos] == ids)
            return b.select(["id", "sig"]).filter(pa.array(m))

        old_sigs = rd.read_parquet(sig_files).map_batches(
            keep_cands, batch_format="pyarrow")
        payload = old_sigs.union(sigs_new)
    else:
        payload = sigs_new

    def keep_fn(a: np.ndarray, b: np.ndarray):
        return (a == b).mean(axis=1) >= verify_threshold

    def extra(a, b, keep):
        # est recomputed from the gathered rows (cheap) rather than
        # threaded through shared state — no call-ordering coupling
        if a is None:
            return {"est": pa.array([], pa.float64())}
        return {"est": pa.array((a == b).mean(axis=1)[keep])}

    verified = _verify_pairs_sharded(pairs, payload, "sig", keep_fn,
                                     matrix_of=_sig_matrix,
                                     extra_cols_fn=extra)

    def rename(b: pa.Table) -> pa.Table:
        return pa.table({"new_id": b.column("dst"), "old_id": b.column("src"),
                         "est": b.column("est")})

    return verified.map_batches(rename, batch_format="pyarrow")


def _delta_pairs_distributed(rows_new_ds, sigs_new, index_dir: str,
                             shards: int, *, verify_threshold: float,
                             max_matches_per_row: int):
    """Large-delta path of minhash_dups_against_index: nothing
    driver-sized. ONE side-tagged cogroup on (band, band_hash) pairs the
    index band table with the delta band rows (new side pre-capped per
    hash — identical semantics to the per-old-row cap, since every old
    row of a hash shares the same ascending candidate list); the verify
    payload is the full signature table + delta signatures through the
    shard-gather join."""
    import os

    import ray.data as rd

    from .relational import cogroup, hash_aggregate, sides

    band_files = []
    bdir = os.path.join(index_dir, "bands")
    for pk in sorted(os.listdir(bdir)):
        p = os.path.join(bdir, pk)
        if os.path.isdir(p):
            band_files.extend(sorted(os.path.join(p, f)
                                     for f in os.listdir(p)
                                     if f.endswith(".parquet")))
    old_rows = rd.read_parquet(band_files)

    def pair_bucket(group) -> pd.DataFrame:
        lt, rt = sides(group)  # left = index rows, right = delta rows
        old = lt.select(["band", "band_hash", "id"]).to_pandas()
        new = rt.select(["band", "band_hash", "id"]).to_pandas()
        if old.empty or new.empty:
            return pd.DataFrame({"src": pd.array([], dtype="int64"),
                                 "dst": pd.array([], dtype="int64")})
        new = new.sort_values(["band", "band_hash", "id"], kind="mergesort")
        new = new.groupby(["band", "band_hash"], sort=False).head(
            max_matches_per_row)
        m = old.merge(new, on=["band", "band_hash"], suffixes=("_o", "_n"))
        return pd.DataFrame({"src": m["id_o"].astype("int64"),
                             "dst": m["id_n"].astype("int64")})

    pairs = cogroup(old_rows, rows_new_ds, ["band", "band_hash"], pair_bucket)
    # src != dst: same re-probe-after-append contract as the broadcast
    # path (self-matches of already-indexed delta docs are excluded)
    pairs = hash_aggregate(
        pairs, ["src", "dst"],
        lambda g: g[g["src"] != g["dst"]].drop_duplicates(["src", "dst"]))

    sig_files = []
    sdir = os.path.join(index_dir, "sigs")
    for sh in sorted(os.listdir(sdir)):
        p = os.path.join(sdir, sh)
        if os.path.isdir(p):
            sig_files.extend(sorted(os.path.join(p, f)
                                    for f in os.listdir(p)
                                    if f.endswith(".parquet")))
    # drop indexed copies of delta ids (delta sigs take precedence; a
    # duplicate id would trip the shard lookup's duplicate-key guard).
    # The id ARRAY is 8 B/row — broadcastable well past the band-row
    # limit that routed us here (ids are bands x smaller than band rows)
    import ray

    new_ids = np.sort(sigs_new.select_columns(["id"]).to_pandas()["id"]
                      .to_numpy(dtype=np.int64))
    new_ids_ref = ray.put(new_ids)

    def keep_old(b: pa.Table) -> pa.Table:
        ids = b.column("id").to_numpy(zero_copy_only=False)
        nid = ray.get(new_ids_ref)
        if len(nid):
            pos = np.searchsorted(nid, ids)
            pos[pos == len(nid)] = 0
            keep = ~(nid[pos] == ids)
            b = b.filter(pa.array(keep))
        return b.select(["id", "sig"])

    old_sigs = rd.read_parquet(sig_files).map_batches(
        keep_old, batch_format="pyarrow")
    payload = old_sigs.union(sigs_new)

    def keep_fn(a: np.ndarray, b: np.ndarray):
        return (a == b).mean(axis=1) >= verify_threshold

    def extra(a, b, keep):
        if a is None:
            return {"est": pa.array([], pa.float64())}
        return {"est": pa.array((a == b).mean(axis=1)[keep])}

    verified = _verify_pairs_sharded(pairs, payload, "sig", keep_fn,
                                     matrix_of=_sig_matrix,
                                     extra_cols_fn=extra)

    def rename(b: pa.Table) -> pa.Table:
        return pa.table({"new_id": b.column("dst"), "old_id": b.column("src"),
                         "est": b.column("est")})

    return verified.map_batches(rename, batch_format="pyarrow")
