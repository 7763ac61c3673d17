"""Generic iterative connected components (distributed union-find analog).

The KG linker never needs this (its similarity edges are block-partitioned
by construction — stages/linking.py), but near-dup clustering does: LSH
candidate pairs cross blocks. Reference analog: the k-medoids remap loop in
utils/mention_clustering.py:44-65, lifted to dataflow.

Two regimes:
- small graphs: driver union-find (10M edges = 160 MB of int pairs; an
  in-memory union-find beats any dataflow loop whose per-round shuffle
  latency dominates — measured 654 s of join rounds vs 20 s driver at
  2.56M edges under the round-2 label-propagation design).
- beyond driver memory: ALTERNATING LARGE-STAR / SMALL-STAR rounds
  (Kiveris et al., "Connected Components in MapReduce and Beyond"): each
  round is ONE bucketed int-pair shuffle with a vectorized pandas
  min/transform pass per bucket (no joins, no NA-padding, no per-node
  dispatch), plus one cheap dedup+checksum pass for convergence. Edges
  converge to stars rooted at each component's minimum id in O(log n)
  rounds; the round-2 design paid THREE all-to-alls per round and
  re-padded the static edge list through a cogroup every round.
"""

from __future__ import annotations

import numpy as np
import pandas as pd


def _driver_cc(edges: pd.DataFrame):
    """In-memory union-find with min-root — identical output contract to
    the iterative dataflow (label = min node id of the component).

    Self-loops are filtered exactly as the star rounds filter them
    (``keep = s != d``), so a node that appears ONLY in self-loop edges is
    absent from the labels in BOTH regimes — without this, the result set
    on degenerate input would depend on which side of
    ``small_graph_edges`` the edge count lands."""
    import ray.data as rd

    edges = edges[edges["src"] != edges["dst"]]
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
# 128 GB driver) and an in-memory union-find beats shuffle rounds whose
# fixed latency dominates. Above it, the star rounds run — the 100 TB
# path (billions of edges never fit a driver).
SMALL_GRAPH_EDGES = 10_000_000


def _large_star(edges, num_buckets: int):
    """One large-star round: for every node u (over the SYMMETRIZED edge
    list), m = min(neighbors + u); emit (v, m) for each neighbor v > u.
    Output edges always point downward (dst < src)."""
    from .relational import hash_aggregate

    def expand(batch: pd.DataFrame) -> pd.DataFrame:
        s = batch["src"].to_numpy(dtype=np.int64)
        d = batch["dst"].to_numpy(dtype=np.int64)
        keep = s != d
        s, d = s[keep], d[keep]
        return pd.DataFrame(
            {
                "node": np.concatenate([s, d]),
                "nbr": np.concatenate([d, s]),
            }
        )

    rows = edges.map_batches(expand, batch_format="pandas")

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop_duplicates()
        node = g["node"].to_numpy(dtype=np.int64)
        nbr = g["nbr"].to_numpy(dtype=np.int64)
        m = np.minimum(
            g.groupby("node", sort=False)["nbr"].transform("min").to_numpy(dtype=np.int64),
            node,
        )
        keep = nbr > node
        return pd.DataFrame({"src": nbr[keep], "dst": m[keep]})

    return hash_aggregate(rows, ["node"], per_bucket, num_buckets=num_buckets)


def _small_star(edges, num_buckets: int):
    """One small-star round: orient every edge (hi, lo); per hi,
    m = min(lo's); emit (hi, m) and (lo, m) for lo != m."""
    from .relational import hash_aggregate

    def orient(batch: pd.DataFrame) -> pd.DataFrame:
        s = batch["src"].to_numpy(dtype=np.int64)
        d = batch["dst"].to_numpy(dtype=np.int64)
        keep = s != d
        s, d = s[keep], d[keep]
        return pd.DataFrame({"node": np.maximum(s, d), "nbr": np.minimum(s, d)})

    rows = edges.map_batches(orient, batch_format="pandas")

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop_duplicates()
        nbr = g["nbr"].to_numpy(dtype=np.int64)
        mins = g.groupby("node", sort=False)["nbr"].transform("min").to_numpy(dtype=np.int64)
        per_node = g.groupby("node", sort=False)["nbr"].min().reset_index()
        keep = nbr != mins
        return pd.concat(
            [
                pd.DataFrame(
                    {
                        "src": per_node["node"].to_numpy(dtype=np.int64),
                        "dst": per_node["nbr"].to_numpy(dtype=np.int64),
                    }
                ),
                pd.DataFrame({"src": nbr[keep], "dst": mins[keep]}),
            ],
            ignore_index=True,
        )

    return hash_aggregate(rows, ["node"], per_bucket, num_buckets=num_buckets)


def _dedup_edges(edges, num_buckets: int):
    from .relational import hash_aggregate

    return hash_aggregate(
        edges, ["src", "dst"], lambda g: g.drop_duplicates(["src", "dst"]),
        num_buckets=num_buckets,
    )


def _edge_checksum(edges) -> tuple[int, int]:
    """(row count, order-independent content hash) of an edge Dataset —
    one cheap streaming pass, tiny partials to the driver."""

    def part(batch: pd.DataFrame) -> pd.DataFrame:
        h = pd.util.hash_pandas_object(batch[["src", "dst"]], index=False).to_numpy()
        # partials stay full uint64 wraparound sums — masking per batch
        # would discard carries and make the total depend on how Ray
        # happened to split the blocks
        return pd.DataFrame(
            {"n": pd.array([len(batch)], dtype="int64"),
             "h": pd.array([h.sum(dtype=np.uint64)], dtype="uint64")}
        )

    parts = edges.map_batches(part, batch_format="pandas").to_pandas()
    total = parts["h"].to_numpy(dtype=np.uint64).sum(dtype=np.uint64)
    return int(parts["n"].sum()), int(total)


def connected_components(edges_ds, *, max_iter: int = 20, num_buckets: int = 64,
                         small_graph_edges: int = SMALL_GRAPH_EDGES):
    """edges (src:int64, dst:int64) -> Dataset (node:int64, label:int64)
    where label = min node id of the component."""
    from .relational import hash_aggregate

    edges = edges_ds.materialize()
    if edges.count() <= small_graph_edges:
        return _driver_cc(edges.to_pandas())

    prev = None
    converged = False
    for _ in range(max_iter):
        edges = _large_star(edges, num_buckets)
        edges = _dedup_edges(_small_star(edges, num_buckets), num_buckets).materialize()
        cur = _edge_checksum(edges)
        if cur == prev:
            converged = True
            break
        prev = cur
    if not converged:
        # star rounds converge in O(log n) iterations; running out of the
        # budget means the fixed-point labels below would be silently
        # wrong — fail loudly instead
        raise RuntimeError(
            f"connected_components: star rounds did not converge within "
            f"{max_iter} iterations"
        )

    # at the fixed point every edge is (member, component-min); labels =
    # min dst per src, plus the roots labeling themselves
    def to_labels(batch: pd.DataFrame) -> pd.DataFrame:
        return pd.concat(
            [
                pd.DataFrame({"node": batch["src"], "label": batch["dst"]}),
                pd.DataFrame({"node": batch["dst"], "label": batch["dst"]}),
            ],
            ignore_index=True,
        )

    def min_label(g: pd.DataFrame) -> pd.DataFrame:
        out = g.groupby("node", as_index=False)["label"].min()
        out["node"] = out["node"].astype("int64")
        out["label"] = out["label"].astype("int64")
        return out

    return hash_aggregate(
        edges.map_batches(to_labels, batch_format="pandas"), ["node"], min_label,
        num_buckets=num_buckets,
    )


# ---------------------------------------------------------------------------
# PageRank-lite (integer fixed-point, deterministic at any parallelism)
# ---------------------------------------------------------------------------

PR_UNIT = 1_000_000_000  # rank fixed-point scale (per-node start = 1 UNIT)


def _pr_step_base(d_pct: int) -> int:
    return ((100 - d_pct) * PR_UNIT) // 100


def _driver_pagerank(edges: pd.DataFrame, iters: int, d_pct: int) -> pd.DataFrame:
    """numpy int64 recurrence — same integer semantics as the distributed
    path: rank' = (100-d)%*UNIT + d%*sum(rank//outdeg) with floor
    divisions, dangling mass dropped."""
    src = edges["src"].to_numpy()
    dst = edges["dst"].to_numpy()
    nodes = np.unique(np.concatenate([src, dst]))
    idx = {n: i for i, n in enumerate(nodes)}
    si = np.fromiter((idx[s] for s in src), dtype=np.int64, count=len(src))
    di = np.fromiter((idx[d] for d in dst), dtype=np.int64, count=len(dst))
    outdeg = np.bincount(si, minlength=len(nodes)).astype(np.int64)
    rank = np.full(len(nodes), PR_UNIT, dtype=np.int64)
    base = _pr_step_base(d_pct)
    for _ in range(iters):
        contrib = rank[si] // outdeg[si]
        acc = np.zeros(len(nodes), dtype=np.int64)
        np.add.at(acc, di, contrib)
        rank = base + (d_pct * acc) // 100
    import ray.data as rd

    return rd.from_pandas(pd.DataFrame({"node": nodes, "rank": rank}))


def pagerank(edges_ds, *, iters: int = 10, d_pct: int = 85,
             num_buckets: int = 64,
             small_graph_edges: int = SMALL_GRAPH_EDGES):
    """PageRank-lite over directed edges (src, dst — int64 or string
    ids) -> (node, rank:int64), rank in units of PR_UNIT (start = 1 UNIT
    per node). INTEGER fixed-point throughout: floor-divided
    contributions and integer damping make every sum order-independent,
    so driver, distributed and serial-oracle executions agree
    bit-for-bit at any parallelism — a float PageRank's summation order
    would differ per run and break hash comparison. Dangling-node mass
    is dropped (documented PageRank-lite simplification); duplicate
    edges are collapsed first.

    Regimes, mirroring connected_components: numpy on the driver under
    ``small_graph_edges`` (iteration latency is shuffle-bound far below
    that); beyond it, per iteration ONE partitioned join (static
    outdeg-annotated edge list, bucketized once, against the current
    rank table) and ONE bucketed sum — 2 all-to-alls per iteration over
    (int, int) rows only. Rank rows materialize each iteration to keep
    lineage bounded (one int64 pair per node). int64 overflow headroom:
    a node's in-sum is bounded by total mass N*PR_UNIT, safe to N ~ 9e9
    nodes.
    """
    from .relational import hash_aggregate, partitioned_join

    def dedup(g: pd.DataFrame) -> pd.DataFrame:
        return g.drop_duplicates(subset=["src", "dst"])

    edges = hash_aggregate(
        edges_ds.map_batches(dedup, batch_format="pandas"), ["src", "dst"],
        dedup, num_buckets=num_buckets,
    ).materialize()
    if edges.count() <= small_graph_edges:
        return _driver_pagerank(edges.to_pandas(), iters, d_pct)

    def deg(g: pd.DataFrame) -> pd.DataFrame:
        out = g.groupby("src", as_index=False).size()
        out.columns = ["src", "outdeg"]
        return out

    outdeg = hash_aggregate(edges, ["src"], deg, num_buckets=num_buckets)
    edges_w = partitioned_join(edges, outdeg, ["src"],
                               num_buckets=num_buckets).materialize()

    def to_nodes(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {"node": pd.concat([b["src"], b["dst"]]).unique()}
        )

    def uniq(g: pd.DataFrame) -> pd.DataFrame:
        return g.drop_duplicates()

    nodes = hash_aggregate(
        edges.map_batches(to_nodes, batch_format="pandas"), ["node"], uniq,
        num_buckets=num_buckets,
    ).materialize()
    zeros = nodes.map_batches(
        lambda b: b.assign(c=np.int64(0)), batch_format="pandas"
    ).materialize()

    ranks = nodes.map_batches(
        lambda b: b.assign(rank=np.int64(PR_UNIT)), batch_format="pandas"
    ).materialize()
    base = _pr_step_base(d_pct)
    for _ in range(iters):
        as_src = ranks.map_batches(
            lambda b: b.rename(columns={"node": "src"}), batch_format="pandas"
        )
        joined = partitioned_join(edges_w, as_src, ["src"],
                                  num_buckets=num_buckets)

        def contrib(b: pd.DataFrame) -> pd.DataFrame:
            return pd.DataFrame(
                {
                    "node": b["dst"],
                    "c": (b["rank"].to_numpy(dtype=np.int64)
                          // b["outdeg"].to_numpy(dtype=np.int64)),
                }
            )

        def new_rank(g: pd.DataFrame) -> pd.DataFrame:
            out = g.groupby("node", as_index=False)["c"].sum()
            out["rank"] = base + (d_pct * out["c"].astype("int64")) // 100
            out["rank"] = out["rank"].astype("int64")
            return out[["node", "rank"]]

        ranks = hash_aggregate(
            joined.map_batches(contrib, batch_format="pandas").union(zeros),
            ["node"], new_rank, num_buckets=num_buckets,
        ).materialize()
    return ranks


def cooccurrence_pairs(ds, group_keys: list[str], item_keys: list[str], *,
                       num_buckets: int = 64,
                       max_group_items: int | None = None):
    """Unordered co-occurrence pair counts: for every group (e.g. a
    conversation turn), every lexicographically-ordered pair of DISTINCT
    items in it, counted across all groups — the edge-weight builder for
    co-occurrence graphs / PMI statistics.

    Shape: one bucketed shuffle on ``group_keys`` co-locates each group;
    per bucket, ONE vectorized dedup + self-merge handles every group at
    once (no per-group dispatch), emitting partial pair counts; a second
    bucketed aggregate on the pair key sums partials. Integer counts only
    — downstream PMI/log-lift stays exact-checkable (consumers divide).

    Partitioning assumption (same as sessionize): one group's distinct
    items fit in a bucket worker; a group with k items emits O(k^2)
    pairs. ``max_group_items`` caps that: each group keeps only its
    FIRST max_group_items distinct items in item-key sort order (a
    deterministic truncation, same spirit as the star-edge cap in
    dedup's LSH buckets). The cap LOSES pairs — every pair with a
    truncated member is simply not counted, so capped output is a
    recall-reduced subset at the PAIRS level, not merely a reweighting;
    leave it None (exact) unless a group can exceed worker memory.
    """
    from .relational import hash_aggregate

    i1 = [f"{c}_1" for c in item_keys]
    i2 = [f"{c}_2" for c in item_keys]

    def per_group_bucket(g: pd.DataFrame) -> pd.DataFrame:
        d = g.drop_duplicates(group_keys + item_keys)
        if max_group_items is not None:
            d = d.sort_values(group_keys + item_keys, kind="mergesort")
            d = d.groupby(group_keys, sort=False).head(max_group_items)
        mm = d.merge(d, on=group_keys, suffixes=("_1", "_2"))
        # strict lexicographic order over the item key tuple: each
        # unordered pair once, self-pairs excluded
        lt = np.zeros(len(mm), dtype=bool)
        eq = np.ones(len(mm), dtype=bool)
        for a, b in zip(i1, i2):
            av, bv = mm[a].to_numpy(), mm[b].to_numpy()
            lt |= eq & (av < bv)
            eq &= av == bv
        p = mm[lt].groupby(i1 + i2, as_index=False).size()
        return p.rename(columns={"size": "n_pair"}).astype({"n_pair": "int64"})

    partials = hash_aggregate(ds.select_columns(group_keys + item_keys),
                              group_keys, per_group_bucket,
                              num_buckets=num_buckets)

    def sum_pairs(g: pd.DataFrame) -> pd.DataFrame:
        out = g.groupby(i1 + i2, as_index=False)["n_pair"].sum()
        return out.astype({"n_pair": "int64"})

    return hash_aggregate(partials, i1 + i2, sum_pairs, num_buckets=num_buckets)


def group_item_marginals(ds, group_keys: list[str], item_keys: list[str], *,
                         num_buckets: int = 64):
    """Number of groups each item occurs in (the PMI marginal): bucketed
    per-group dedup partials, then one aggregate on the item key."""
    from .relational import hash_aggregate

    def dedup_bucket(g: pd.DataFrame) -> pd.DataFrame:
        d = g.drop_duplicates(group_keys + item_keys)
        out = d.groupby(item_keys, as_index=False).size()
        return out.rename(columns={"size": "n"}).astype({"n": "int64"})

    partials = hash_aggregate(ds.select_columns(group_keys + item_keys),
                              group_keys, dedup_bucket, num_buckets=num_buckets)

    def sum_items(g: pd.DataFrame) -> pd.DataFrame:
        out = g.groupby(item_keys, as_index=False)["n"].sum()
        return out.astype({"n": "int64"})

    return hash_aggregate(partials, item_keys, sum_items, num_buckets=num_buckets)


BROADCAST_DEGREES_LIMIT = 2_000_000


def triangle_count(edges_ds, *, src: str = "src", dst: str = "dst",
                   num_buckets: int = 64,
                   broadcast_degrees: bool | None = None,
                   broadcast_degrees_limit: int = BROADCAST_DEGREES_LIMIT) -> int:
    """Exact triangle count via degree-ordered wedge checking (the
    MapReduce-classic: orient each edge toward its higher-(degree, id)
    endpoint so every node's oriented out-degree is O(sqrt(m)); then a
    triangle is exactly one wedge (u->v, u->w) whose closing oriented
    edge v->w exists).

    Passes: (1) one bucketed dedup of undirected (min, max) edges —
    self-loops dropped; (2) degree aggregate (|V|-sized; broadcast back
    when |V| <= broadcast_degrees_limit, else partitioned joins — the
    switch is AUTOMATIC by node count, mirroring SMALL_GRAPH_EDGES, so a
    billion-node graph can't driver-OOM by default; pass
    broadcast_degrees=True/False to pin a regime); (3) wedge generation per oriented-source
    bucket (vectorized self-merge, no per-node dispatch — the degree
    orientation is what bounds a hub's wedge fan-out); (4) one cogroup
    of wedges vs oriented edges counting closures. Returns the exact
    global count.
    """
    from .relational import (broadcast_join, hash_aggregate,
                             partitioned_join, sides)

    def undirect(b: pd.DataFrame) -> pd.DataFrame:
        u = np.minimum(b[src].to_numpy(), b[dst].to_numpy())
        v = np.maximum(b[src].to_numpy(), b[dst].to_numpy())
        out = pd.DataFrame({"u": u, "v": v})
        return out[out["u"] != out["v"]].drop_duplicates()

    def dedup_bucket(g: pd.DataFrame) -> pd.DataFrame:
        return g.drop_duplicates(["u", "v"])

    # edge-sized intermediates are consumed by multiple downstream
    # passes (degrees + orientation join; orientation + closure cogroup):
    # materialize once instead of re-running the dedup shuffle per consumer
    edges = hash_aggregate(
        edges_ds.map_batches(undirect, batch_format="pandas"),
        ["u", "v"], dedup_bucket, num_buckets=num_buckets,
    ).materialize()

    def endpoints(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"node": np.concatenate([b["u"], b["v"]])})

    def deg_agg(g: pd.DataFrame) -> pd.DataFrame:
        out = g.groupby("node", as_index=False).size()
        return out.rename(columns={"size": "deg"}).astype({"deg": "int64"})

    degrees = hash_aggregate(edges.map_batches(endpoints, batch_format="pandas"),
                             ["node"], deg_agg, num_buckets=num_buckets)

    # |V|-sized and consumed up to three times (two with_deg joins +
    # ordeg); materialize unconditionally so no regime re-runs the full
    # edge scan per consumer
    degrees = degrees.materialize()
    if broadcast_degrees is None:
        broadcast_degrees = degrees.count() <= broadcast_degrees_limit

    du = degrees.to_pandas().rename(columns={"node": "u", "deg": "deg_u"}) \
        if broadcast_degrees else None

    if broadcast_degrees:
        dv = du.rename(columns={"u": "v", "deg_u": "deg_v"})
        with_deg = broadcast_join(broadcast_join(edges, du, ["u"]), dv, ["v"])
    else:
        with_deg = partitioned_join(
            partitioned_join(
                edges,
                degrees.map_batches(
                    lambda b: b.rename(columns={"node": "u", "deg": "deg_u"}),
                    batch_format="pandas"),
                ["u"], num_buckets=num_buckets),
            degrees.map_batches(
                lambda b: b.rename(columns={"node": "v", "deg": "deg_v"}),
                batch_format="pandas"),
            ["v"], num_buckets=num_buckets)

    def orient(b: pd.DataFrame) -> pd.DataFrame:
        # src = endpoint with smaller (deg, id); total order, no ties
        du_, dv_ = b["deg_u"].to_numpy(), b["deg_v"].to_numpy()
        u_, v_ = b["u"].to_numpy(), b["v"].to_numpy()
        u_first = (du_ < dv_) | ((du_ == dv_) & (u_ < v_))
        s = np.where(u_first, u_, v_)
        d = np.where(u_first, v_, u_)
        return pd.DataFrame({"s": s, "d": d})

    oriented = with_deg.map_batches(orient, batch_format="pandas").materialize()

    # wedge (s -> d1, s -> d2): the potential closing edge is d1 -> d2
    # in orientation order, which within one source's neighbor list is
    # NOT directly known — but (deg, id) order between d1 and d2 equals
    # the orientation of any edge between them, and within a source's
    # list we can only order by id. So carry the degree along.
    ordeg = broadcast_join(
        oriented, du.rename(columns={"u": "d", "deg_u": "deg_d"}), ["d"]
    ) if broadcast_degrees else partitioned_join(
        oriented,
        degrees.map_batches(
            lambda b: b.rename(columns={"node": "d", "deg": "deg_d"}),
            batch_format="pandas"),
        ["d"], num_buckets=num_buckets)

    def wedges(g: pd.DataFrame) -> pd.DataFrame:
        mm = g.merge(g, on="s", suffixes=("_1", "_2"))
        g1, g2 = mm["deg_d_1"].to_numpy(), mm["deg_d_2"].to_numpy()
        d1, d2 = mm["d_1"].to_numpy(), mm["d_2"].to_numpy()
        keep = (g1 < g2) | ((g1 == g2) & (d1 < d2))
        return pd.DataFrame({"s": d1[keep], "d": d2[keep]})

    # materialize the wedge set (the algorithm's O(m^1.5)-bounded working
    # set): the emptiness guard and the closure cogroup then share one
    # execution, and an all-oriented-out-degree<=1 graph (path, loops-only)
    # short-circuits instead of feeding a schemaless empty side to cogroup
    wedge_ds = hash_aggregate(ordeg, ["s"], wedges,
                              num_buckets=num_buckets).materialize()
    if wedge_ds.count() == 0:
        return 0

    def close_bucket(group) -> pd.DataFrame:
        lt, rt = sides(group)
        w = lt.select(["s", "d"]).to_pandas()
        e = rt.select(["s", "d"]).to_pandas().drop_duplicates()
        n = len(w.merge(e, on=["s", "d"], how="inner"))
        return pd.DataFrame({"n": [np.int64(n)]})

    from .relational import cogroup

    counts = cogroup(wedge_ds, oriented, ["s", "d"], close_bucket,
                     num_buckets=num_buckets).to_pandas()
    if counts.empty:  # edgeless / triangle-free tiny graphs
        return 0
    return int(counts["n"].sum())
