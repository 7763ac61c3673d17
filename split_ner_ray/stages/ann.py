"""Similarity search over an embedding column (list<float>).

- brute_topk: exact cosine top-k — per-batch float64 matmul against a
  broadcast query matrix (ray.put once, resolved per actor), local top-k
  partials, final per-query reduce. This is the baseline the driver asks
  for; it streams the corpus once and never materializes it.
- ivf_topk: IVF-style scale path — deterministic coarse centroids, vectors
  bucketed by nearest centroid (one shuffle), queries probe the nprobe
  nearest buckets only. Recall vs brute force is asserted in tests.
"""

from __future__ import annotations

import numpy as np
import pandas as pd


def _as_matrix(rows, vec_col: str) -> np.ndarray:
    return np.array([list(map(float, r)) for r in rows], dtype=np.float64)


def _normalize(m: np.ndarray) -> np.ndarray:
    n = np.linalg.norm(m, axis=1)
    n[n == 0] = 1.0
    return m / n[:, None]


def load_queries(emb_ds, query_ids: list[int], id_col="vec_id", vec_col="embedding"):
    """Fetch the query vectors (a handful of ids) to the driver."""
    rows = emb_ds.filter(lambda r: r[id_col] in set(query_ids)).take_all()
    rows.sort(key=lambda r: r[id_col])
    qids = np.array([r[id_col] for r in rows], dtype=np.int64)
    qm = _normalize(_as_matrix([r[vec_col] for r in rows], vec_col))
    return qids, qm


def brute_topk(emb_ds, qids: np.ndarray, qmat: np.ndarray, k: int = 5,
               id_col: str = "vec_id", vec_col: str = "embedding",
               exclude_self: bool = True):
    """Exact cosine top-k: returns Dataset (qid, vid, rank), rank 1-based,
    ties broken by vid ascending (matches the SQL oracle's ORDER BY)."""
    import ray

    ref = ray.put((qids, qmat))

    class Local:
        def __init__(self):
            self.qids, self.qmat = ray.get(ref)

        def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
            vids = batch[id_col].to_numpy(dtype=np.int64)
            m = _normalize(_as_matrix(batch[vec_col], vec_col))
            sims = self.qmat @ m.T  # (Q, B)
            out = {"qid": [], "vid": [], "sim": []}
            kk = min(k + (1 if exclude_self else 0), sims.shape[1])
            for qi in range(sims.shape[0]):
                idx = np.argpartition(-sims[qi], kk - 1)[:kk]
                for j in idx:
                    out["qid"].append(int(self.qids[qi]))
                    out["vid"].append(int(vids[j]))
                    out["sim"].append(float(sims[qi, j]))
            return pd.DataFrame(out)

    partials = emb_ds.map_batches(Local, batch_format="pandas", concurrency=2, num_cpus=0.5)

    def per_query(group: pd.DataFrame) -> pd.DataFrame:
        qid = int(group["qid"].iloc[0])
        g = group
        if exclude_self:
            g = g[g["vid"] != qid]
        g = g.sort_values(["sim", "vid"], ascending=[False, True]).head(k)
        return pd.DataFrame(
            {
                "qid": pd.array([qid] * len(g), dtype="int64"),
                "vid": pd.array(g["vid"].tolist(), dtype="int64"),
                "rank": pd.array(range(1, len(g) + 1), dtype="int64"),
            }
        )

    return partials.groupby("qid").map_groups(per_query, batch_format="pandas")


def ivf_topk(emb_ds, qids: np.ndarray, qmat: np.ndarray, k: int = 5,
             *, num_centroids: int = 8, nprobe: int = 3,
             id_col: str = "vec_id", vec_col: str = "embedding",
             exclude_self: bool = True):
    """IVF-bucketed ANN: centroids = normalized vectors of the
    ``num_centroids`` smallest ids (deterministic, no k-means iterations —
    documented simplification); one shuffle buckets the corpus; each query
    searches only its nprobe closest buckets."""
    import ray

    cent_rows = (
        emb_ds.filter(lambda r: r[id_col] < num_centroids)
        .take_all()
    )
    cent_rows.sort(key=lambda r: r[id_col])
    cents = _normalize(_as_matrix([r[vec_col] for r in cent_rows], vec_col))
    cref = ray.put(cents)

    class Assign:
        def __init__(self):
            self.cents = ray.get(cref)

        def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
            m = _normalize(_as_matrix(batch[vec_col], vec_col))
            sims = m @ self.cents.T
            return pd.DataFrame(
                {
                    "bucket": pd.array(np.argmax(sims, axis=1), dtype="int64"),
                    id_col: batch[id_col].astype("int64"),
                    vec_col: [list(map(float, v)) for v in batch[vec_col]],
                }
            )

    bucketed = emb_ds.map_batches(Assign, batch_format="pandas", concurrency=2, num_cpus=0.5)

    # query -> probed buckets
    probes = {}
    qsims = qmat @ cents.T
    for qi in range(len(qids)):
        probes[int(qids[qi])] = set(np.argsort(-qsims[qi])[:nprobe].tolist())
    pref = ray.put((qids, qmat, probes))

    class Search:
        def __init__(self):
            self.qids, self.qmat, self.probes = ray.get(pref)

        def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
            vids = batch[id_col].to_numpy(dtype=np.int64)
            buckets = batch["bucket"].to_numpy(dtype=np.int64)
            m = _normalize(_as_matrix(batch[vec_col], vec_col))
            out = {"qid": [], "vid": [], "sim": []}
            for qi in range(len(self.qids)):
                qid = int(self.qids[qi])
                mask = np.isin(buckets, list(self.probes[qid]))
                if not mask.any():
                    continue
                sims = m[mask] @ self.qmat[qi]
                mv = vids[mask]
                kk = min(k + 1, len(mv))
                idx = np.argpartition(-sims, kk - 1)[:kk]
                for j in idx:
                    out["qid"].append(qid)
                    out["vid"].append(int(mv[j]))
                    out["sim"].append(float(sims[j]))
            return pd.DataFrame(out)

    partials = bucketed.map_batches(Search, batch_format="pandas", concurrency=2, num_cpus=0.5)

    def per_query(group: pd.DataFrame) -> pd.DataFrame:
        qid = int(group["qid"].iloc[0])
        g = group
        if exclude_self:
            g = g[g["vid"] != qid]
        g = g.sort_values(["sim", "vid"], ascending=[False, True]).head(k)
        return pd.DataFrame(
            {
                "qid": pd.array([qid] * len(g), dtype="int64"),
                "vid": pd.array(g["vid"].tolist(), dtype="int64"),
                "rank": pd.array(range(1, len(g) + 1), dtype="int64"),
            }
        )

    return partials.groupby("qid").map_groups(per_query, batch_format="pandas")