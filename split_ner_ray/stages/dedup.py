"""Deduplication operators: exact, MinHash+LSH, SimHash, n-gram Jaccard,
embedding-cosine near-dup (driver-required training-data-pipeline ops).

All stages follow the guide's canonical shapes: vectorized per-batch
signature computation -> explode to (band, hash, id) rows -> groupby bands
-> candidate pairs -> verify -> connected components (stages/graph.py) for
cluster assignment. Every hash is seeded/deterministic (blake2b + fixed
linear perms mod a Mersenne prime), so results are reproducible at any
parallelism.
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

PAIR_SCHEMA = pa.schema([("src", pa.int64()), ("dst", pa.int64())])

# per-worker cache of the broadcast id->signature dict (one resolve+build
# per worker process, not per batch)
_SIG_LUT_CACHE: dict[str, dict] = {}


def _sig_lut(ref) -> dict:
    import ray

    key = ref.hex()
    lut = _SIG_LUT_CACHE.get(key)
    if lut is None:
        sf = ray.get(ref)
        lut = dict(zip(sf["id"], sf["sig"]))
        _SIG_LUT_CACHE.clear()
        _SIG_LUT_CACHE[key] = lut
    return lut


def _h64(s: str) -> int:
    return int.from_bytes(hashlib.blake2b(s.encode(), digest_size=8).digest(), "big")


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


# ---------------------------------------------------------------------------
# MinHash + LSH near-dup (shingle -> minhash -> band -> bucket groupby)
# ---------------------------------------------------------------------------

class MinHasher:
    """Seeded 64-perm MinHash over word n-gram shingles; signatures are a
    pure function of the text (deterministic across workers)."""

    def __init__(self, num_perm: int = 64, ngram: int = 3, seed: int = 7):
        rng = random.Random(seed)
        self.a = np.array([rng.randrange(1, _PRIME) for _ in range(num_perm)], dtype=np.uint64)
        self.b = np.array([rng.randrange(0, _PRIME) for _ in range(num_perm)], dtype=np.uint64)
        self.num_perm = num_perm
        self.ngram = ngram

    def signature(self, text: str) -> np.ndarray:
        sh = word_shingles(text, self.ngram)
        if not sh:
            return np.full(self.num_perm, _PRIME, dtype=np.uint64)
        base = np.array([_h64(s) for s in sorted(sh)], dtype=np.uint64)
        # (P, S) perm matrix via modular linear hashing, min over shingles
        prod = (self.a[:, None] * base[None, :] + self.b[:, None]) % _PRIME
        return prod.min(axis=1)


def minhash_signatures(ds, *, id_col: str = "doc_id", text_col: str = "text",
                       num_perm: int = 64, ngram: int = 3, seed: int = 7):
    """docs -> (id, sig) rows; sig = uint64 signature as fixed-size bytes
    (one compact value per doc, never duplicated per band)."""

    class Sigs:
        def __init__(self):
            self.mh = MinHasher(num_perm, ngram, seed)

        def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
            ids = batch[id_col].astype("int64").tolist()
            sigs = [self.mh.signature(t).tobytes() for t in batch[text_col]]
            return pd.DataFrame({"id": pd.array(ids, dtype="int64"), "sig": sigs})

    # stateless-cheap setup (two numpy arrays): an elastic task pool uses
    # every free CPU instead of capping the stage at a fixed actor count
    return ds.map_batches(Sigs(), batch_format="pandas")


def minhash_band_rows(sig_ds, *, num_perm: int = 64, bands: int = 16):
    """signatures -> (band, band_hash, id) integer rows — the only thing
    the LSH shuffle moves."""
    rows_per_band = num_perm // bands

    def explode(batch: pd.DataFrame) -> pd.DataFrame:
        out = {"band": [], "band_hash": [], "id": []}
        for i, sb in zip(batch["id"], batch["sig"]):
            sig = np.frombuffer(sb, dtype=np.uint64)
            for b in range(bands):
                chunk = sig[b * rows_per_band : (b + 1) * rows_per_band]
                out["band"].append(b)
                out["band_hash"].append(_h64(chunk.tobytes().hex()) - (1 << 63))
                out["id"].append(int(i))
        return pd.DataFrame(
            {
                "band": pd.array(out["band"], dtype="int64"),
                "band_hash": pd.array(out["band_hash"], dtype="int64"),
                "id": pd.array(out["id"], dtype="int64"),
            }
        )

    return sig_ds.map_batches(explode, batch_format="pandas")


# Signature tables below this row count are broadcast for candidate
# verification (ray.put once, worker-cached — a normal broadcast-join
# small-side decision, ~100 MB at the limit); above it the pairs are
# verified by partitioned joins against the signature table — the 100 TB
# path, where nothing corpus-shaped ever leaves the cluster.
BROADCAST_SIGS_LIMIT = 200_000

# Buckets larger than this emit STAR edges (bucket-minimum -> member)
# instead of all pairs: a duplicate-heavy corpus puts thousands of
# identical documents into one band bucket, and O(k^2) pair emission
# explodes (measured: worker OOM deaths on 2.17M template-generated
# turns). Star edges preserve the connected components for the common
# case (bucket-mates that verify against the minimum verify
# transitively); all-pairs is kept below the cap where borderline
# near-dups matter.
BUCKET_PAIR_CAP = 64


def candidate_pairs_from_bands(band_rows, sig_ds, *, verify_threshold: float = 0.7,
                               broadcast_sigs_limit: int = BROADCAST_SIGS_LIMIT,
                               bucket_pair_cap: int = BUCKET_PAIR_CAP):
    """groupby(band, band_hash) -> candidate pairs (src < dst), verified
    against the signatures (broadcast under the limit, partitioned joins
    above), deduped.

    Verification = signature-estimated Jaccard >= threshold (the standard
    MinHash estimator); exact-Jaccard re-check is verify_jaccard_pairs."""
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
        ref = ray.put(sig_ds.select_columns(["id", "sig"]).to_pandas())

        def verify_b(batch: pd.DataFrame) -> pd.DataFrame:
            if not len(batch):
                return batch[["src", "dst"]]
            lut = _sig_lut(ref)
            a = np.stack([np.frombuffer(lut[int(s)], dtype=np.uint64) for s in batch["src"]])
            b = np.stack([np.frombuffer(lut[int(d)], dtype=np.uint64) for d in batch["dst"]])
            est = (a == b).mean(axis=1)
            return batch.loc[est >= verify_threshold, ["src", "dst"]]

        verified = pairs.map_batches(verify_b, batch_format="pandas")
        return hash_aggregate(verified, ["src", "dst"], dedup_pairs)

    pairs = hash_aggregate(pairs, ["src", "dst"], dedup_pairs)

    # join 1 attaches sig_s; join 2 attaches sig_d AND verifies inside the
    # same per-bucket pass, emitting only int pairs — the verified-pair
    # output never materializes signature bytes (measured 154 s -> far
    # less at 9.8M pairs x 2.17M x 256 B sigs when the 5 GB joined table
    # is never produced).
    from .relational import partitioned_join

    def as_src(batch: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"src": batch["id"].astype("int64"),
                             "sig_s": batch["sig"]})

    j1 = partitioned_join(
        pairs, sig_ds.map_batches(as_src, batch_format="pandas"), ["src"]
    )

    def as_dst(batch: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"dst": batch["id"].astype("int64"),
                             "sig_d": batch["sig"]})

    def merge_verify(g: pd.DataFrame) -> pd.DataFrame:
        lg = g.loc[g["__side"] == "L", ["src", "dst", "sig_s"]]
        rg = g.loc[g["__side"] == "R", ["dst", "sig_d"]]
        m = lg.merge(rg, on="dst", how="inner")
        if not len(m):
            return pd.DataFrame(
                {"src": pd.array([], dtype="int64"), "dst": pd.array([], dtype="int64")}
            )
        a = np.stack([np.frombuffer(s, dtype=np.uint64) for s in m["sig_s"]])
        b = np.stack([np.frombuffer(s, dtype=np.uint64) for s in m["sig_d"]])
        est = (a == b).mean(axis=1)
        out = m.loc[est >= verify_threshold, ["src", "dst"]]
        out["src"] = out["src"].astype("int64")
        out["dst"] = out["dst"].astype("int64")
        return out

    from .relational import cogroup

    return cogroup(j1, sig_ds.map_batches(as_dst, batch_format="pandas"),
                   ["dst"], merge_verify)


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

def simhash64(text: str) -> int:
    """64-bit SimHash over whitespace tokens (unweighted)."""
    toks = _WS.split(text.strip()) if text.strip() else []
    if not toks:
        return 0
    acc = np.zeros(64, dtype=np.int64)
    for t in toks:
        h = _h64(t)
        bits = (h >> np.arange(64, dtype=np.uint64)) & 1
        acc += np.where(bits.astype(bool), 1, -1)
    out = 0
    for i in range(64):
        if acc[i] > 0:
            out |= 1 << i
    return out


def simhash_dup_pairs(ds, *, id_col: str = "doc_id", text_col: str = "text",
                      max_hamming: int = 3):
    """SimHash blocking: 4 x 16-bit bands (any pair within hamming<=3 shares
    at least one exact band by pigeonhole) -> verify hamming distance."""

    def sigs(batch: pd.DataFrame) -> pd.DataFrame:
        out = {"band": [], "band_val": [], "id": [], "sim": []}
        for i, t in zip(batch[id_col].astype("int64"), batch[text_col]):
            s = simhash64(t)
            for b in range(4):
                out["band"].append(b)
                out["band_val"].append((s >> (16 * b)) & 0xFFFF)
                out["id"].append(int(i))
                out["sim"].append(s - (1 << 63))
        return pd.DataFrame(out)

    rows = ds.map_batches(sigs, batch_format="pandas")

    def per_bucket(group: pd.DataFrame) -> pd.DataFrame:
        items = sorted(set(zip(group["id"].tolist(), group["sim"].tolist())))
        src, dst = [], []
        if len(items) > BUCKET_PAIR_CAP:
            # duplicate-heavy bucket: star to the minimum (same rationale
            # as candidate_pairs_from_bands — O(k) instead of O(k^2))
            ia, sa = items[0]
            for ib, sb in items[1:]:
                if bin((sa ^ sb) & ((1 << 64) - 1)).count("1") <= max_hamming:
                    src.append(ia)
                    dst.append(ib)
        else:
            for x in range(len(items)):
                for y in range(x + 1, len(items)):
                    ia, sa = items[x]
                    ib, sb = items[y]
                    if bin((sa ^ sb) & ((1 << 64) - 1)).count("1") <= max_hamming:
                        src.append(ia)
                        dst.append(ib)
        return pd.DataFrame({"src": pd.array(src, dtype="int64"), "dst": pd.array(dst, dtype="int64")})

    from .relational import hash_aggregate

    def buckets_fn(g: pd.DataFrame) -> pd.DataFrame:
        frames = [per_bucket(sub) for _k, sub in g.groupby(["band", "band_val"], sort=False)]
        return pd.concat(frames, ignore_index=True) if frames else per_bucket(g)

    pairs = hash_aggregate(rows, ["band", "band_val"], buckets_fn)
    return hash_aggregate(pairs, ["src", "dst"], lambda g: g.drop_duplicates(["src", "dst"]))


# ---------------------------------------------------------------------------
# exact n-gram Jaccard verification (for LSH candidates)
# ---------------------------------------------------------------------------

def verify_jaccard_pairs(pairs_ds, docs_ds, *, id_col: str = "doc_id",
                         text_col: str = "text", ngram: int = 3,
                         threshold: float = 0.7):
    """Re-check candidate pairs with exact shingle Jaccard via partitioned
    joins of pairs against per-doc shingle sets — fully distributed (the
    inner joins drop every non-candidate doc's shingles inside the
    shuffle; no driver-side candidate set, no broadcast). The verify runs
    INSIDE the second join's bucket pass, so the doubly-joined shingle
    payload never materializes (same shape as the MinHash join path)."""
    from .relational import cogroup, partitioned_join

    def shingle_rows(batch: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "id": batch[id_col].astype("int64"),
                "shingles": [sorted(word_shingles(t, ngram)) for t in batch[text_col]],
            }
        )

    sh_ds = docs_ds.map_batches(shingle_rows, batch_format="pandas")

    def as_src(batch: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"src": batch["id"], "shingles_s": batch["shingles"]})

    def as_dst(batch: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"dst": batch["id"], "shingles_d": batch["shingles"]})

    j1 = partitioned_join(
        pairs_ds, sh_ds.map_batches(as_src, batch_format="pandas"), ["src"]
    )

    def merge_verify(g: pd.DataFrame) -> pd.DataFrame:
        lg = g.loc[g["__side"] == "L", ["src", "dst", "shingles_s"]]
        rg = g.loc[g["__side"] == "R", ["dst", "shingles_d"]]
        m = lg.merge(rg, on="dst", how="inner")
        keep, jac = [], []
        for sa, sb in zip(m["shingles_s"], m["shingles_d"]):
            a, b = set(sa), set(sb)
            j = len(a & b) / len(a | b) if (a or b) else 0.0
            keep.append(j >= threshold)
            jac.append(j)
        out = m[["src", "dst"]].copy()
        out["src"] = out["src"].astype("int64")
        out["dst"] = out["dst"].astype("int64")
        out["jaccard"] = jac
        return out[pd.Series(keep, index=out.index)] if len(out) else out

    return cogroup(j1, sh_ds.map_batches(as_dst, batch_format="pandas"),
                   ["dst"], merge_verify)


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
    """
    import ray

    from .relational import hash_aggregate

    if not lsh:
        mat_rows = emb_ds.select_columns([id_col, vec_col]).take_all()
        ids = np.array([r[id_col] for r in mat_rows], dtype=np.int64)
        mat = np.array([r[vec_col] for r in mat_rows], dtype=np.float64)
        norms = np.linalg.norm(mat, axis=1)
        norms[norms == 0] = 1.0
        ref = ray.put((ids, mat / norms[:, None]))

        def brute(batch: pd.DataFrame) -> pd.DataFrame:
            # ray.get resolves from the worker-local object store after the
            # first call — the broadcast is shipped once per node, not per batch
            all_ids, matn = ray.get(ref)
            v = np.array(list(batch[vec_col]), dtype=np.float64)
            n = np.linalg.norm(v, axis=1)
            n[n == 0] = 1.0
            sims = (v / n[:, None]) @ matn.T
            src, dst = [], []
            for row_i, qid in enumerate(batch[id_col].astype("int64")):
                hits = all_ids[sims[row_i] >= threshold]
                for h in hits:
                    if qid < h:
                        src.append(int(qid))
                        dst.append(int(h))
            return pd.DataFrame(
                {"src": pd.array(src, dtype="int64"), "dst": pd.array(dst, dtype="int64")}
            )

        return emb_ds.map_batches(brute, batch_format="pandas")

    # LSH path: only the embedding DIMENSION is read on the driver
    dim = len(emb_ds.take(1)[0][vec_col])
    rng = np.random.RandomState(seed)
    planes_ref = ray.put(rng.randn(num_tables, num_planes, dim))

    def bucketize(batch: pd.DataFrame) -> pd.DataFrame:
        planes = ray.get(planes_ref)
        v = np.array(list(batch[vec_col]), dtype=np.float64)
        ids = batch[id_col].astype("int64").to_numpy()
        vecs = [list(map(float, x)) for x in v]
        frames = []
        for t in range(planes.shape[0]):
            bits = (v @ planes[t].T) > 0
            bucket = bits @ (1 << np.arange(planes.shape[1], dtype=np.int64))
            frames.append(
                pd.DataFrame(
                    {
                        # table id folded into the bucket key so tables
                        # never mix inside one bucket group
                        "bucket": pd.array(
                            bucket * planes.shape[0] + t, dtype="int64"
                        ),
                        "id": ids,
                        "vec": vecs,
                    }
                )
            )
        return pd.concat(frames, ignore_index=True)

    rows = emb_ds.map_batches(bucketize, batch_format="pandas")

    def per_bucket(group: pd.DataFrame) -> pd.DataFrame:
        order = np.argsort(group["id"].to_numpy())
        ids_l = group["id"].to_numpy()[order]
        vecs = np.array(group["vec"].tolist(), dtype=np.float64)[order]
        n = np.linalg.norm(vecs, axis=1)
        n[n == 0] = 1.0
        vn = vecs / n[:, None]
        src, dst = [], []
        if len(ids_l) > BUCKET_PAIR_CAP * 4:
            # duplicate-heavy bucket: star-verify against the min id only
            # (O(k) memory/compute instead of a k x k sims matrix)
            sims0 = vn[1:] @ vn[0]
            for j in np.nonzero(sims0 >= threshold)[0]:
                if ids_l[0] != ids_l[j + 1]:
                    src.append(int(ids_l[0]))
                    dst.append(int(ids_l[j + 1]))
        else:
            sims = vn @ vn.T
            for x in range(len(ids_l)):
                for y in range(x + 1, len(ids_l)):
                    if sims[x, y] >= threshold and ids_l[x] != ids_l[y]:
                        a, b = sorted((int(ids_l[x]), int(ids_l[y])))
                        src.append(a)
                        dst.append(b)
        return pd.DataFrame({"src": pd.array(src, dtype="int64"), "dst": pd.array(dst, dtype="int64")})

    def buckets_fn(g: pd.DataFrame) -> pd.DataFrame:
        # one task handles many LSH buckets — no per-bucket UDF dispatch
        frames = [per_bucket(sub) for _k, sub in g.groupby("bucket", sort=False)]
        return pd.concat(frames, ignore_index=True) if frames else per_bucket(g)

    pairs = hash_aggregate(rows, ["bucket"], buckets_fn)
    return hash_aggregate(pairs, ["src", "dst"], lambda g: g.drop_duplicates(["src", "dst"]))
