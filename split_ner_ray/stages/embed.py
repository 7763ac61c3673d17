"""Mention embedding stage (reference op S6).

The reference embeds mentions with a pretrained BERT (concat of first/last
subtoken hidden states averaged per surface —
utils/mention_clustering.py:23-41) to feed clustering. Torch is absent in
this sandbox, so the drop-in backend is a deterministic hashed
character-n-gram embedding behind the same batch interface: surface ->
L2-normalized float32 vector whose buckets are blake2b-hashed 3-grams with
+/-1 signs. Same-surface mentions embed identically; near-identical
surfaces land close in cosine space, which is exactly the property the
blocking+similarity linker and the ANN operators exercise.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd

from ..rules import char_ngrams

DIM_DEFAULT = 64


def embed_surface(surface: str, dim: int = DIM_DEFAULT) -> np.ndarray:
    v = np.zeros(dim, dtype=np.float32)
    for g in sorted(char_ngrams(surface.lower())):
        h = int.from_bytes(hashlib.blake2b(g.encode(), digest_size=8).digest(), "big")
        v[h % dim] += 1.0 if (h >> 63) & 1 else -1.0
    n = float(np.linalg.norm(v))
    return v / n if n else v


class MentionEmbedder:
    """Actor-pool stage: adds an ``embedding`` list<float> column for the
    ``surface`` column; per-batch memo over distinct surfaces (M5-style
    actor-local cache — surfaces repeat heavily)."""

    def __init__(self, dim: int = DIM_DEFAULT, surface_col: str = "surface"):
        self.dim = dim
        self.surface_col = surface_col
        self.cache: dict[str, list[float]] = {}

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        out = []
        for s in batch[self.surface_col]:
            vec = self.cache.get(s)
            if vec is None:
                vec = [float(x) for x in embed_surface(s, self.dim)]
                if len(self.cache) < 200_000:  # bounded actor-local cache
                    self.cache[s] = vec
            out.append(vec)
        batch = batch.copy()
        batch["embedding"] = out
        return batch


def embed_mentions(ds, *, dim: int = DIM_DEFAULT, surface_col: str = "surface",
                   concurrency=None):
    from .pools import pool_size

    return ds.map_batches(
        MentionEmbedder,
        fn_constructor_kwargs={"dim": dim, "surface_col": surface_col},
        batch_format="pandas",
        concurrency=concurrency or pool_size(0.5),
        num_cpus=0.5,
    )


def grouped_vector_sum(ds, group_col: str, vec_col: str, *, scale: int = 1_000_000,
                       num_buckets: int = 32):
    """Per-group vector sums (the centroid builder): each embedding
    component is fixed-point quantized (round(scale*x) as int64) BEFORE
    summation, so the aggregate is associative and byte-identical at any
    parallelism — a float sum's value depends on reduction order, which
    would break exact oracle checks and cross-run reproducibility.
    Output: one row per (group, dim) with the int64 component sum and
    the group count; consumers divide sum/(scale*n) for the centroid.

    Shape: per-batch quantize + local (group, dim) partial sums
    (vectorized reshape, no Python loop), then one bucketed aggregate on
    (group, dim)."""
    from ..stages.relational import hash_aggregate

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        m = np.stack([np.asarray(v, dtype=np.float64) for v in batch[vec_col]])
        q = np.round(m * scale).astype(np.int64)
        g = batch[group_col].to_numpy()
        d = q.shape[1]
        df = pd.DataFrame({
            "grp": np.repeat(g, d),
            "dim": np.tile(np.arange(d, dtype=np.int64), len(g)),
            "s": q.reshape(-1),
        })
        out = df.groupby(["grp", "dim"], as_index=False).agg(
            s=("s", "sum"), n=("s", "size"))
        return out.astype({"s": "int64", "n": "int64"})

    parts = ds.map_batches(partial, batch_format="pandas")

    def agg(g: pd.DataFrame) -> pd.DataFrame:
        out = g.groupby(["grp", "dim"], as_index=False)[["s", "n"]].sum()
        return out.astype({"s": "int64", "n": "int64"})

    return hash_aggregate(parts, ["grp", "dim"], agg, num_buckets=num_buckets)
