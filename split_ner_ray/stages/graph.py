"""Generic iterative connected components (distributed union-find analog).

The KG linker never needs this (its similarity edges are block-partitioned
by construction — stages/linking.py), but near-dup clustering does: LSH
candidate pairs cross blocks. This operator is the engine's iterative
dataflow: min-label propagation as a driver loop of BUCKETED passes with a
cheap convergence check (labels are monotonically non-increasing, so an
unchanged label-sum means a fixed point). Reference analog: the k-medoids
remap loop in utils/mention_clustering.py:44-65, lifted to dataflow.

Physical shape (the round-2 rewrite): every pass is hash-bucketed — a
partitioned join of the symmetric edge list against the current labels
(offer my label to each neighbor) plus one bucketed min-aggregate per node.
No per-node UDF dispatch anywhere: at 10^8 nodes each round is two bucketed
shuffles of (int, int) rows with vectorized pandas min inside, not 2N
map_groups calls. Convergence is O(component diameter) rounds; the
similarity graphs this engine builds (near-dup clusters) have short
diameters (2-4 rounds). A large-star/small-star scheme would cut worst
cases to O(log n) at the cost of two joins per round — documented
trade-off.
"""

from __future__ import annotations

import pandas as pd


def _label_sum(ds) -> int:
    from ray.data.aggregate import Sum

    row = ds.aggregate(Sum("label", alias_name="s"))
    return int(row["s"]) if row and row.get("s") is not None else 0


def _driver_cc(edges: pd.DataFrame):
    """In-memory union-find with min-root — identical output contract to
    the iterative dataflow (label = min node id of the component)."""
    import ray.data as rd

    parent: dict[int, int] = {}

    def find(x: int) -> int:
        r = x
        while parent.get(r, r) != r:
            r = parent[r]
        while parent.get(x, x) != x:
            parent[x], x = r, parent[x]
        return r

    for s, d in zip(edges["src"], edges["dst"]):
        s, d = int(s), int(d)
        parent.setdefault(s, s)
        parent.setdefault(d, d)
        rs, rd_ = find(s), find(d)
        if rs != rd_:
            lo, hi = (rs, rd_) if rs < rd_ else (rd_, rs)
            parent[hi] = lo
    nodes = sorted(parent)
    return rd.from_pandas(
        pd.DataFrame(
            {
                "node": pd.array(nodes, dtype="int64"),
                "label": pd.array([find(n) for n in nodes], dtype="int64"),
            }
        )
    )


# Below this many edges the graph fits driver memory comfortably (10M
# edges = 160 MB of int64 pairs; the union-find dict stays in low GBs on a
# 128 GB driver) and an in-memory union-find beats label-propagation
# rounds whose per-round join cost dominates (measured: iterative CC on a
# 2.56M-edge / 922k-node near-dup graph = 654 s of partitioned-join
# rounds vs seconds of driver union-find). Above it, the bucketed
# label-propagation rounds run — the 100 TB path (billions of edges never
# fit a driver).
SMALL_GRAPH_EDGES = 10_000_000


def connected_components(edges_ds, *, max_iter: int = 20, num_buckets: int = 64,
                         small_graph_edges: int = SMALL_GRAPH_EDGES):
    """edges (src:int64, dst:int64) -> Dataset (node:int64, label:int64)
    where label = min node id of the component."""
    from .relational import hash_aggregate, partitioned_join

    def to_sym(batch: pd.DataFrame) -> pd.DataFrame:
        fwd = pd.DataFrame({"node": batch["src"].astype("int64"),
                            "nbr": batch["dst"].astype("int64")})
        rev = pd.DataFrame({"node": batch["dst"].astype("int64"),
                            "nbr": batch["src"].astype("int64")})
        return pd.concat([fwd, rev], ignore_index=True)

    sym = edges_ds.map_batches(to_sym, batch_format="pandas").materialize()

    if sym.count() <= 2 * small_graph_edges:  # sym holds both directions
        small = sym.to_pandas()  # already materialized; no recompute
        return _driver_cc(small.rename(columns={"node": "src", "nbr": "dst"}))

    def min_label(g: pd.DataFrame) -> pd.DataFrame:
        out = g.groupby("node", as_index=False)["label"].min()
        out["node"] = out["node"].astype("int64")
        out["label"] = out["label"].astype("int64")
        return out

    # seed: label(v) = min(v, neighbors(v))
    def seed(batch: pd.DataFrame) -> pd.DataFrame:
        return pd.concat(
            [
                pd.DataFrame({"node": batch["node"], "label": batch["nbr"]}),
                pd.DataFrame({"node": batch["node"], "label": batch["node"]}),
            ],
            ignore_index=True,
        )

    labels = hash_aggregate(
        sym.map_batches(seed, batch_format="pandas"), ["node"], min_label,
        num_buckets=num_buckets,
    ).materialize()

    prev = _label_sum(labels)
    for _ in range(max_iter):
        # offer: each node sends its current label to every neighbor
        joined = partitioned_join(sym, labels, ["node"], num_buckets=num_buckets)

        def offers(batch: pd.DataFrame) -> pd.DataFrame:
            return pd.DataFrame(
                {
                    "node": batch["nbr"].astype("int64"),
                    "label": batch["label"].astype("int64"),
                }
            )

        candidates = joined.map_batches(offers, batch_format="pandas").union(labels)
        labels = hash_aggregate(candidates, ["node"], min_label,
                                num_buckets=num_buckets).materialize()
        cur = _label_sum(labels)
        if cur == prev:
            break
        prev = cur
    return labels
