"""Similarity search over an embedding column (list<float>).

- brute_topk: exact cosine top-k — per-batch float64 matmul against a
  broadcast query matrix (ray.put once, resolved per worker), tie-safe
  local top-k partials, final per-query reduce. This is the baseline the
  driver asks for; it streams the corpus once and never materializes it.
- ivf_topk: IVF in-memory path — coarse centroids trained by spherical
  k-means on a deterministic hash-based sample, vectors bucketed by
  nearest centroid, ONE bucket shuffle co-locates each inverted list, and
  each bucket task computes similarities only for the queries probing it.
- ivf_build_index / ivf_search_index: the 100 TB path — the bucketed
  corpus is WRITTEN partitioned by bucket (one parquet directory per
  inverted list) and searches prune at the READ: unprobed lists never
  leave storage. Recall vs brute force is asserted in tests.

All stages are elastic task pools (broadcast state resolved from the
worker-local object store per call — shipped once per node, not per batch);
no fixed-size actor pools to starve the cluster.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from .vectors import (fixed_list_carrier, fixed_list_i8, fixed_list_f32,
                      float_value_type, stack_rows, vec_matrix)


def _as_matrix(rows, vec_col: str | None = None) -> np.ndarray:
    """Driver-side (small) row collections only — hot per-batch paths use
    ``vectors.vec_matrix`` on the Arrow column instead."""
    return stack_rows(rows)


def _normalize(m: np.ndarray) -> np.ndarray:
    n = np.linalg.norm(m, axis=1)
    n[n == 0] = 1.0
    return m / n[:, None]


def load_queries(emb_ds, query_ids: list[int], id_col="vec_id", vec_col="embedding"):
    """Fetch the query vectors (a handful of ids) to the driver —
    vectorized batch filter, not a per-row lambda scan."""
    want = set(int(q) for q in query_ids)

    def keep(batch: pd.DataFrame) -> pd.DataFrame:
        return batch[batch[id_col].astype("int64").isin(want)]

    rows = emb_ds.map_batches(keep, batch_format="pandas").take_all()
    rows.sort(key=lambda r: r[id_col])
    qids = np.array([r[id_col] for r in rows], dtype=np.int64)
    qm = _normalize(_as_matrix([r[vec_col] for r in rows], vec_col))
    return qids, qm


def _topk_tie_safe(sims: np.ndarray, vids: np.ndarray, kk: int):
    """Indices of the top-kk under the TOTAL order (sim desc, vid asc) —
    the same order the final reduce (and the SQL oracle's ORDER BY) uses,
    so per-batch truncation can never drop a row the global top-k keeps."""
    kk = min(kk, len(vids))
    order = np.lexsort((vids, -sims))
    return order[:kk]


def _topk_rows(sims: np.ndarray, all_qids: np.ndarray, vids: np.ndarray,
               kk: int, probing=None) -> pd.DataFrame:
    """Local top-kk partial rows for every scored query as ONE DataFrame —
    array slicing per query row (query counts are small), no per-hit
    Python appends. ``probing`` maps sims rows to indices into all_qids
    (defaults to row order)."""
    if probing is None:
        probing = np.arange(sims.shape[0])
    cols_q, cols_v, cols_s = [], [], []
    for row_i in range(sims.shape[0]):
        idx = _topk_tie_safe(sims[row_i], vids, kk)
        cols_q.append(np.full(len(idx), all_qids[probing[row_i]], dtype=np.int64))
        cols_v.append(vids[idx].astype(np.int64))
        cols_s.append(sims[row_i, idx].astype(np.float64))
    if not cols_q:
        return pd.DataFrame({"qid": pd.array([], dtype="int64"),
                             "vid": pd.array([], dtype="int64"),
                             "sim": pd.array([], dtype="float64")})
    return pd.DataFrame({"qid": np.concatenate(cols_q),
                         "vid": np.concatenate(cols_v),
                         "sim": np.concatenate(cols_s)})


def _per_query_reduce(partials, k: int, exclude_self: bool):
    """Final per-query top-k via ONE bucketed shuffle + a vectorized
    sort/groupby-head/cumcount pass covering MANY queries per task (a
    groupby(qid).map_groups paid per-query dispatch — fine at 8 queries,
    pathological at a 10^6-query batch workload)."""
    from .relational import hash_aggregate

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        if exclude_self:
            g = g[g["vid"] != g["qid"]]
        s = g.sort_values(["qid", "sim", "vid"], ascending=[True, False, True])
        top = s.groupby("qid", sort=False).head(k)
        return pd.DataFrame(
            {
                "qid": top["qid"].astype("int64"),
                "vid": top["vid"].astype("int64"),
                "rank": (top.groupby("qid", sort=False).cumcount() + 1).astype("int64"),
            }
        )

    return hash_aggregate(partials, ["qid"], per_bucket, num_buckets=32)


def brute_topk(emb_ds, qids: np.ndarray, qmat: np.ndarray, k: int = 5,
               id_col: str = "vec_id", vec_col: str = "embedding",
               exclude_self: bool = True):
    """Exact cosine top-k: returns Dataset (qid, vid, rank), rank 1-based,
    ties broken by vid ascending (matches the SQL oracle's ORDER BY)."""
    import ray

    ref = ray.put((qids, qmat))

    def local(batch: pa.Table) -> pd.DataFrame:
        if len(batch) == 0:
            return _topk_rows(np.empty((0, 0)), qids, np.empty(0, np.int64), k)
        all_qids, qm = ray.get(ref)
        vids = batch.column(id_col).to_numpy(zero_copy_only=False).astype(np.int64)
        # zero-copy Arrow buffer view + ONE float64 cast — no per-row work
        m = _normalize(vec_matrix(batch.column(vec_col)))
        sims = qm @ m.T  # (Q, B)
        return _topk_rows(sims, all_qids, vids,
                          k + (1 if exclude_self else 0))

    partials = emb_ds.map_batches(local, batch_format="pyarrow")
    return _per_query_reduce(partials, k, exclude_self)


def train_centroids(emb_ds, num_centroids: int = 8, *, id_col: str = "vec_id",
                    vec_col: str = "embedding", iters: int = 5,
                    sample_target: int = 4096) -> np.ndarray:
    """Coarse quantizer: spherical k-means on a deterministic hash-based
    sample (~sample_target vectors regardless of corpus size; the sample
    predicate is a pure function of the id, so the result is independent
    of partitioning). Init = the num_centroids smallest-id sample vectors;
    empty clusters keep their previous centroid. Deterministic end to end."""
    n = emb_ds.count()
    frac = min(1.0, sample_target / max(n, 1))
    threshold = np.uint64(int(frac * (1 << 63)))

    def samp(batch: pd.DataFrame) -> pd.DataFrame:
        ids = batch[id_col].to_numpy(dtype=np.int64)
        h = pd.util.hash_array(ids).astype(np.uint64) >> np.uint64(1)
        return batch[h < threshold]

    rows = emb_ds.map_batches(samp, batch_format="pandas").take_all()
    rows.sort(key=lambda r: r[id_col])
    sample = _normalize(_as_matrix([r[vec_col] for r in rows], vec_col))
    k = min(num_centroids, len(sample))
    cents = sample[:k].copy()
    for _ in range(iters):
        assign = np.argmax(sample @ cents.T, axis=1)
        for c in range(k):
            members = sample[assign == c]
            if len(members):
                v = members.sum(axis=0)
                nv = np.linalg.norm(v)
                if nv > 0:
                    cents[c] = v / nv
    return cents


def ivf_topk(emb_ds, qids: np.ndarray, qmat: np.ndarray, k: int = 5,
             *, num_centroids: int = 8, nprobe: int = 3,
             id_col: str = "vec_id", vec_col: str = "embedding",
             exclude_self: bool = True):
    """IVF-bucketed ANN: k-means coarse centroids; ONE bucket shuffle
    co-locates each inverted list; each bucket task scores only the queries
    that probe its buckets (compute pruned by nprobe/num_centroids)."""
    import ray

    from .relational import hash_aggregate

    cents = train_centroids(emb_ds, num_centroids, id_col=id_col, vec_col=vec_col)
    cref = ray.put(cents)

    def assign(batch: pa.Table) -> pa.Table:
        c = ray.get(cref)
        col = batch.column(vec_col)
        raw = vec_matrix(col)
        sims = _normalize(raw) @ c.T
        # embeddings stay Arrow fixed_size_list through the bucket shuffle
        # (never Python lists), at the SOURCE float width — float64 inputs
        # are not narrowed, so near-threshold scores match the oracle
        return pa.table(
            {
                "bucket": pa.array(np.argmax(sims, axis=1).astype(np.int64)),
                id_col: batch.column(id_col).cast(pa.int64()),
                vec_col: fixed_list_carrier(raw, float_value_type(col)),
            }
        )

    bucketed = emb_ds.map_batches(assign, batch_format="pyarrow")

    # bucket -> list of probing queries (small driver-side table, broadcast)
    qsims = qmat @ cents.T
    probes_by_bucket: dict[int, list[int]] = {}
    for qi in range(len(qids)):
        for b in np.argsort(-qsims[qi])[:nprobe]:
            probes_by_bucket.setdefault(int(b), []).append(qi)
    pref = ray.put((qids, qmat, probes_by_bucket))
    kk = k + (1 if exclude_self else 0)

    def search_buckets(g: pa.Table) -> pd.DataFrame:
        all_qids, qm, by_bucket = ray.get(pref)
        buckets = g.column("bucket").to_numpy(zero_copy_only=False)
        vids_all = g.column(id_col).to_numpy(zero_copy_only=False)
        m_all = _normalize(vec_matrix(g.column(vec_col)))
        order = np.argsort(buckets, kind="stable")
        bs, starts = np.unique(buckets[order], return_index=True)
        ends = np.append(starts[1:], len(order))
        frames = []
        for bi, lo, hi in zip(bs, starts, ends):
            probing = by_bucket.get(int(bi))
            if not probing:
                continue
            sel = order[lo:hi]
            sims = qm[probing] @ m_all[sel].T
            frames.append(_topk_rows(sims, all_qids, vids_all[sel].astype(np.int64),
                                     kk, probing=probing))
        if not frames:
            return _topk_rows(np.empty((0, 0)), qids, np.empty(0, np.int64), kk)
        return pd.concat(frames, ignore_index=True)

    partials = hash_aggregate(bucketed, ["bucket"], search_buckets,
                              batch_format="pyarrow")
    return _per_query_reduce(partials, k, exclude_self)


# ---------------------------------------------------------------------------
# IVF disk index: partitioned parquet per inverted list, read-level pruning
# ---------------------------------------------------------------------------

def ivf_build_index(emb_ds, index_dir: str, *, num_centroids: int = 8,
                    id_col: str = "vec_id", vec_col: str = "embedding",
                    quantize: bool = False) -> np.ndarray:
    """Build an on-disk IVF index: train the coarse quantizer, bucket every
    vector by nearest centroid, and write the corpus PARTITIONED BY bucket
    (one parquet directory per inverted list, plus centroids.npy). Searches
    then prune at the READ: only the nprobe probed bucket directories are
    ever opened — the storage-level pruning a 100 TB ANN corpus needs
    (ivf_topk prunes compute + shuffle only).

    ``quantize=True`` stores each inverted list as int8 + per-vector scale
    (see quantize_embeddings) — 8x smaller lists on disk AND over the
    probe reads, at pytest-bounded recall cost; a marker file records the
    layout so ivf_search_index dequantizes transparently."""
    import os

    import ray

    cents = train_centroids(emb_ds, num_centroids, id_col=id_col, vec_col=vec_col)
    cref = ray.put(cents)

    def assign(batch: pa.Table) -> pa.Table:
        c = ray.get(cref)
        raw = vec_matrix(batch.column(vec_col))
        b = np.argmax(_normalize(raw) @ c.T, axis=1)
        ids = batch.column(id_col).cast(pa.int64())
        if quantize:
            scale = np.abs(raw).max(axis=1) / 127.0
            scale[scale == 0] = 1.0
            q = np.clip(np.round(raw / scale[:, None]), -127, 127).astype(np.int8)
            # Arrow-native int8 lists: a pandas object column of int8
            # ndarrays would round-trip through parquet as an unreadable
            # pandas batch (and plain Python lists would re-widen to int64)
            return pa.table(
                {
                    "bucket": pa.array(b.astype(np.int64)),
                    id_col: ids,
                    "q": fixed_list_i8(q),
                    "scale": pa.array(scale, type=pa.float64()),
                }
            )
        # float lists stored as fixed_size_list at the SOURCE width:
        # float32 sources get the compact half-size layout, float64
        # sources keep full precision on disk
        return pa.table(
            {
                "bucket": pa.array(b.astype(np.int64)),
                id_col: ids,
                vec_col: fixed_list_carrier(raw, float_value_type(
                    batch.column(vec_col))),
            }
        )

    # sort by the partition key before the partitioned write — unsorted,
    # every block splits into every bucket dir (blocks x buckets tiny
    # files; measured 20x probe slowdown on the MinHash delta index from
    # exactly this) and each inverted list fragments across thousands of
    # files instead of O(1)
    emb_ds.map_batches(assign, batch_format="pyarrow").sort(
        "bucket").write_parquet(index_dir, partition_cols=["bucket"])
    np.save(os.path.join(index_dir, "centroids.npy"), cents)
    if quantize:
        with open(os.path.join(index_dir, "_QUANTIZED"), "w") as f:
            f.write("int8")
    return cents


def ivf_search_index(index_dir: str, qids: np.ndarray, qmat: np.ndarray,
                     k: int = 5, *, nprobe: int = 3, id_col: str = "vec_id",
                     vec_col: str = "embedding", exclude_self: bool = True):
    """Search the disk index: per query pick the nprobe nearest centroids,
    then read ONLY those bucket directories (partition pruning — unprobed
    inverted lists never leave storage) and score each probed list against
    just the queries probing it."""
    import os

    import ray
    import ray.data as rd

    cents = np.load(os.path.join(index_dir, "centroids.npy"))
    quantized = os.path.exists(os.path.join(index_dir, "_QUANTIZED"))
    qsims = qmat @ cents.T
    probes_by_bucket: dict[int, list[int]] = {}
    for qi in range(len(qids)):
        for b in np.argsort(-qsims[qi])[:nprobe]:
            probes_by_bucket.setdefault(int(b), []).append(qi)

    pref = ray.put((qids, qmat))
    kk = k + (1 if exclude_self else 0)
    partials = []
    for bucket, probing in sorted(probes_by_bucket.items()):
        bdir = os.path.join(index_dir, f"bucket={bucket}")
        if not os.path.isdir(bdir):
            continue  # empty inverted list

        def score(batch: pa.Table, probing=tuple(probing)) -> pd.DataFrame:
            if len(batch) == 0:
                return _topk_rows(np.empty((0, 0)), qids, np.empty(0, np.int64), kk)
            all_qids, qm = ray.get(pref)
            vids = batch.column(id_col).to_numpy(zero_copy_only=False).astype(np.int64)
            if quantized:
                raw = vec_matrix(batch.column("q"))
                raw *= batch.column("scale").to_numpy(zero_copy_only=False)[:, None]
            else:
                raw = vec_matrix(batch.column(vec_col))
            sims = qm[list(probing)] @ _normalize(raw).T
            return _topk_rows(sims, all_qids, vids, kk, probing=list(probing))

        partials.append(
            rd.read_parquet(bdir).map_batches(score, batch_format="pyarrow")
        )
    if not partials:
        return rd.from_pandas(pd.DataFrame({"qid": [], "vid": [], "rank": []}))
    merged = partials[0]
    for p in partials[1:]:
        merged = merged.union(p)
    return _per_query_reduce(merged, k, exclude_self)


def quantize_embeddings(emb_ds, *, id_col: str = "vec_id",
                        vec_col: str = "embedding"):
    """Symmetric per-vector int8 quantization: 4x smaller than float32
    (8x vs float64) — the storage/shuffle-bandwidth lever for
    billion-vector corpora. Each row carries its own scale
    (max-abs / 127), so quantization is batch-local with NO global pass,
    and dequantization is exact-shape: q * scale ~= original with
    per-component error <= scale/2.

    Output columns: (id_col, "q" int8 list, "scale" float64). Use
    ``dequantize_batch`` (or brute_topk_quantized) to search over it.
    """

    def quant(batch: pa.Table) -> pa.Table:
        m = vec_matrix(batch.column(vec_col))
        scale = np.abs(m).max(axis=1) / 127.0
        scale[scale == 0] = 1.0
        q = np.clip(np.round(m / scale[:, None]), -127, 127).astype(np.int8)
        return pa.table({
            id_col: batch.column(id_col).cast(pa.int64()),
            "q": fixed_list_i8(q),
            "scale": pa.array(scale, type=pa.float64()),
        })

    return emb_ds.map_batches(quant, batch_format="pyarrow")


def dequantize_batch(batch: pd.DataFrame) -> np.ndarray:
    """pandas-side dequantize (tests/driver convenience); pipelines use the
    Arrow column path in brute_topk_quantized / ivf_search_index."""
    q = np.stack([np.asarray(v, dtype=np.float64) for v in batch["q"]])
    return q * batch["scale"].to_numpy()[:, None]


def brute_topk_quantized(qemb_ds, qids: np.ndarray, qmat: np.ndarray,
                         k: int = 5, id_col: str = "vec_id",
                         exclude_self: bool = True):
    """brute_topk over a quantized corpus: dequantize per batch (cosine
    normalization absorbs the per-vector scale, so only the rounding
    error remains — recall vs the float corpus is pytest-bounded)."""
    import ray

    ref = ray.put((qids, qmat))
    kk = k + (1 if exclude_self else 0)

    def local(batch: pa.Table) -> pd.DataFrame:
        if len(batch) == 0:
            return _topk_rows(np.empty((0, 0)), qids, np.empty(0, np.int64), kk)
        all_qids, qm = ray.get(ref)
        vids = batch.column(id_col).to_numpy(zero_copy_only=False).astype(np.int64)
        raw = vec_matrix(batch.column("q"))
        raw *= batch.column("scale").to_numpy(zero_copy_only=False)[:, None]
        sims = qm @ _normalize(raw).T
        return _topk_rows(sims, all_qids, vids, kk)

    partials = qemb_ds.map_batches(local, batch_format="pyarrow")
    return _per_query_reduce(partials, k, exclude_self)


def ann_join(left_ds, right_ds, k: int = 5, *, num_centroids: int = 64,
             nprobe: int = 8, left_id: str = "vec_id",
             right_id: str = "vec_id", vec_col: str = "embedding",
             exclude_self: bool = False, num_buckets: int = 32):
    """Batch ANN join: cosine top-k RIGHT neighbors for EVERY left row —
    the 10^6-query workload (embedding-join two corpora, retrieval-augment
    a whole training set) that brute_topk's broadcast-query design cannot
    carry. Returns a Dataset (qid, vid, rank), rank 1-based, ties broken
    by vid ascending — the same total order as brute_topk.

    Shape: coarse centroids trained on the RIGHT corpus (hash-sampled,
    deterministic); right rows bucket to their nearest centroid (the
    inverted lists), left rows fan out to their ``nprobe`` nearest
    centroids; ONE side-tagged Arrow cogroup on the bucket key co-locates
    every list with exactly the probes that need it (vectors ride as
    fixed_size_list<float32> buffers); per-list scoring is a chunked
    float64 matmul with an O(n) per-row partition + boundary-tie mask +
    one flat candidate lexsort over right rows pre-sorted by id (the
    (row, -sim, id-ascending column) order IS the tie-safe total order —
    no per-row loops, no full-row argsort); the final
    per-left-id reduce is the same bucketed pass every other top-k here
    uses (vectorized over thousands of queries per task, never per-query
    dispatch). ``nprobe >= num_centroids`` makes the join EXACT (the
    SQL-checked setting). Partitioning assumption: one inverted list plus
    its probes fits a task (split hot centroids by raising num_centroids).
    """
    import ray

    # sides is imported HERE (not inside score_bucket): from a non-repo
    # cwd the workers deserialize score_bucket by value, and a body-level
    # relative import would fail to resolve the package there
    from .relational import cogroup, sides

    cents = train_centroids(right_ds, num_centroids, id_col=right_id,
                            vec_col=vec_col)
    cref = ray.put(cents)
    kk = k + (1 if exclude_self else 0)

    def assign_right(batch: pa.Table) -> pa.Table:
        c = ray.get(cref)
        col = batch.column(vec_col)
        raw = vec_matrix(col)
        b = np.argmax(_normalize(raw) @ c.T, axis=1)
        return pa.table({
            "bucket": pa.array(b.astype(np.int64)),
            "id": batch.column(right_id).cast(pa.int64()),
            "vec": fixed_list_carrier(raw, float_value_type(col)),
        })

    def assign_left(batch: pa.Table) -> pa.Table:
        c = ray.get(cref)
        raw = vec_matrix(batch.column(vec_col))
        sims = _normalize(raw) @ c.T
        p = min(nprobe, sims.shape[1])
        if p >= sims.shape[1]:
            probes = np.tile(np.arange(sims.shape[1], dtype=np.int64),
                             (len(raw), 1))
        else:
            probes = np.argpartition(-sims, p - 1, axis=1)[:, :p].astype(np.int64)
        n = len(raw)
        rep = np.repeat(np.arange(n, dtype=np.int64), probes.shape[1])
        ids = batch.column(left_id).to_numpy(zero_copy_only=False).astype(np.int64)
        carrier = fixed_list_carrier(raw, float_value_type(batch.column(vec_col)))
        return pa.table({
            "bucket": pa.array(probes.reshape(-1)),
            "id": pa.array(np.repeat(ids, probes.shape[1])),
            "vec": carrier.take(pa.array(rep)),
        })

    rights = right_ds.map_batches(assign_right, batch_format="pyarrow")
    lefts = left_ds.map_batches(assign_left, batch_format="pyarrow")

    def score_bucket(group: pa.Table) -> pd.DataFrame:
        lt, rt = sides(group)  # lt = rights (side 0), rt = left probes
        frames = []
        l_bucket = lt.column("bucket").to_numpy(zero_copy_only=False)
        r_bucket = rt.column("bucket").to_numpy(zero_copy_only=False)
        if len(l_bucket) == 0 or len(r_bucket) == 0:
            return _topk_rows(np.empty((0, 0)), np.empty(0, np.int64),
                              np.empty(0, np.int64), kk)
        rids = lt.column("id").to_numpy(zero_copy_only=False)
        rvec = _normalize(vec_matrix(lt.column("vec")))
        qids_all = rt.column("id").to_numpy(zero_copy_only=False)
        qvec = _normalize(vec_matrix(rt.column("vec")))
        # right rows pre-sorted by (bucket, id): id-ascending column order
        # is what makes the stable argsort below tie-safe
        r_ord = np.lexsort((rids, l_bucket))
        l_bucket, rids, rvec = l_bucket[r_ord], rids[r_ord], rvec[r_ord]
        q_ord = np.argsort(r_bucket, kind="stable")
        r_bucket, qids_all, qvec = r_bucket[q_ord], qids_all[q_ord], qvec[q_ord]
        rb, r_starts = np.unique(l_bucket, return_index=True)
        r_ends = np.append(r_starts[1:], len(l_bucket))
        qb, q_starts = np.unique(r_bucket, return_index=True)
        q_ends = np.append(q_starts[1:], len(r_bucket))
        qpos = {int(b): (lo, hi) for b, lo, hi in zip(qb, q_starts, q_ends)}
        for b, rlo, rhi in zip(rb, r_starts, r_ends):
            qlohi = qpos.get(int(b))
            if qlohi is None:
                continue
            qlo, qhi = qlohi
            rid_s, rv = rids[rlo:rhi], rvec[rlo:rhi]
            n_r = len(rid_s)
            kk_b = min(kk, n_r)
            # chunk left rows so the sims matrix stays ~128 MB
            chunk = max(1, int(16_000_000 // max(n_r, 1)))
            for clo in range(qlo, qhi, chunk):
                chi = min(clo + chunk, qhi)
                sims = qvec[clo:chi] @ rv.T
                # exact top-kk without a full-row argsort (which dominated
                # the 100k x 1M stress): O(n) partition for the per-row
                # boundary value, a >= mask that KEEPS boundary ties, then
                # one flat lexsort of just the candidates. Column order is
                # rid-ascending, so (row, -sim, col) IS the tie-safe total
                # order.
                if kk_b < n_r:
                    v = np.partition(sims, n_r - kk_b, axis=1)[:, n_r - kk_b]
                    ri, ci = np.nonzero(sims >= v[:, None])
                else:
                    ri, ci = np.nonzero(np.ones_like(sims, dtype=bool))
                sv = sims[ri, ci]
                order = np.lexsort((ci, -sv, ri))
                ri, ci, sv = ri[order], ci[order], sv[order]
                rank_in_row = np.arange(len(ri)) - np.searchsorted(ri, ri)
                keep = rank_in_row < kk_b
                frames.append(pd.DataFrame({
                    "qid": qids_all[clo + ri[keep]],
                    "vid": rid_s[ci[keep]],
                    "sim": sv[keep],
                }))
        if not frames:
            return _topk_rows(np.empty((0, 0)), np.empty(0, np.int64),
                              np.empty(0, np.int64), kk)
        return pd.concat(frames, ignore_index=True)

    partials = cogroup(rights, lefts, ["bucket"], score_bucket,
                       num_buckets=num_buckets)
    return _per_query_reduce(partials, k, exclude_self)
