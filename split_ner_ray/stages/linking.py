"""Entity linking + canonicalization (reference ops S6/S7/D6 lifted to a
distributed blocking + similarity + union-find design — SURVEY.md §7 step 6).

The reference clusters mention embeddings with k-medoids on one node
(utils/mention_clustering.py:113-161). At 10^12-turn scale that becomes:

1. distinct mention keys (etype, normalized surface) — deduped inside the
   same shuffle that forms the blocks;
2. blocking: groupby(block_key) co-partitions candidate matches (SHUFFLE 2).
   The block key is a *function* of the mention key, so every similarity
   edge lives inside exactly one block — the similarity graph is
   block-partitioned by construction and connected components never cross
   blocks. Per-block union-find inside map_groups therefore computes the
   global components with ONE shuffle, no iterative all-to-all (the generic
   iterative-CC operator for graphs whose edges DO cross partitions lives in
   stages/graph.py).
3. canonical map (etype, norm) -> canonical norm, entity_id; broadcast to
   the id-assignment stage when small (ray.put once, read per actor), else
   attached via the partitioned hash join in stages/joins.py.

Skew note: hot blocks (e.g. person|al) are bounded by the distinct-surface
count per block, not mention count, because dedup happens before pairwise
similarity; pairwise work is O(k^2) in *distinct* surfaces per block.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

from .. import rules

CANON_SCHEMA = pa.schema(
    [
        ("etype", pa.string()),
        ("norm", pa.string()),
        ("canonical_norm", pa.string()),
        ("entity_id", pa.string()),
    ]
)


def mention_keys(mentions_flat, raw_triples):
    """Distinct (etype, norm) keys from mentions + both triple endpoints,
    with per-batch partial dedup before the shuffle (combiner pattern)."""

    def keys_from_mentions(batch: pa.Table) -> pa.Table:
        seen = set()
        for et, surf in zip(batch.column("etype").to_pylist(), batch.column("surface").to_pylist()):
            seen.add((et, rules.normalize_surface(surf)))
        return _keys_table(seen)

    def keys_from_triples(batch: pa.Table) -> pa.Table:
        seen = set()
        for et, surf in zip(batch.column("subj_etype").to_pylist(), batch.column("subj_surface").to_pylist()):
            seen.add((et, rules.normalize_surface(surf)))
        for et, surf in zip(batch.column("obj_etype").to_pylist(), batch.column("obj_surface").to_pylist()):
            seen.add((et, rules.normalize_surface(surf)))
        return _keys_table(seen)

    a = mentions_flat.map_batches(keys_from_mentions, batch_format="pyarrow", zero_copy_batch=True)
    b = raw_triples.map_batches(keys_from_triples, batch_format="pyarrow", zero_copy_batch=True)
    return a.union(b)


def _keys_table(seen) -> pa.Table:
    ets, norms, blocks = [], [], []
    for et, norm in sorted(seen):
        ets.append(et)
        norms.append(norm)
        blocks.append(rules.block_key(norm, et))
    return pa.Table.from_pydict(
        {"etype": ets, "norm": norms, "block": blocks},
        schema=pa.schema([("etype", pa.string()), ("norm", pa.string()), ("block", pa.string())]),
    )


def build_canon_map(keys_ds):
    """groupby(block).map_groups(dedup + pairwise sim + union-find) ->
    CANON_SCHEMA rows. One shuffle; per-block work is quadratic in distinct
    surfaces per block (bounded by the blocking function's selectivity)."""

    def per_block(group: pa.Table) -> pa.Table:
        members = sorted(
            set(zip(group.column("etype").to_pylist(), group.column("norm").to_pylist()))
        )
        parent = {k: k for k in members}

        def find(k):
            while parent[k] != k:
                parent[k] = parent[parent[k]]
                k = parent[k]
            return k

        grams = {k: rules.char_ngrams(k[1]) for k in members}
        for i in range(len(members)):
            for j in range(i + 1, len(members)):
                a, b = members[i], members[j]
                if a[0] != b[0]:
                    continue
                if rules.containment_sim(grams[a], grams[b]) >= rules.LINK_SIM_THRESHOLD:
                    ra, rb = find(a), find(b)
                    if ra != rb:
                        lo, hi = (ra, rb) if ra <= rb else (rb, ra)
                        parent[hi] = lo
        cols = {n: [] for n in CANON_SCHEMA.names}
        for k in members:
            root = find(k)
            cols["etype"].append(k[0])
            cols["norm"].append(k[1])
            cols["canonical_norm"].append(root[1])
            cols["entity_id"].append(rules.entity_id(k[0], root[1]))
        return pa.Table.from_pydict(cols, schema=CANON_SCHEMA)

    return keys_ds.groupby("block").map_groups(per_block, batch_format="pyarrow")


class IdAssigner:
    """Attach entity ids to raw triples via the broadcast canon map.

    The canon map object ref is resolved ONCE per actor in __init__
    (ray.put on the driver, ray.get here) — never re-shipped per batch.
    For canon maps too large to broadcast, use stages/joins.partitioned_join
    on (etype, norm) instead (documented fallback).
    """

    def __init__(self, canon_ref):
        import ray

        canon: pa.Table = ray.get(canon_ref)
        self.eid = {
            (et, norm): eid
            for et, norm, eid in zip(
                canon.column("etype").to_pylist(),
                canon.column("norm").to_pylist(),
                canon.column("entity_id").to_pylist(),
            )
        }

    def __call__(self, batch: pa.Table) -> pa.Table:
        subj_ids, obj_ids = [], []
        for et, surf in zip(batch.column("subj_etype").to_pylist(), batch.column("subj_surface").to_pylist()):
            subj_ids.append(self.eid[(et, rules.normalize_surface(surf))])
        for et, surf in zip(batch.column("obj_etype").to_pylist(), batch.column("obj_surface").to_pylist()):
            obj_ids.append(self.eid[(et, rules.normalize_surface(surf))])
        return batch.append_column("subj_id", pa.array(subj_ids, pa.string())).append_column(
            "obj_id", pa.array(obj_ids, pa.string())
        )


def assign_entity_ids(raw_triples, canon_ref, *, concurrency=None):
    return raw_triples.map_batches(
        IdAssigner,
        fn_constructor_kwargs={"canon_ref": canon_ref},
        batch_format="pyarrow",
        zero_copy_batch=True,
        concurrency=concurrency or 4,
        num_cpus=0.5,
    )


def dedup_triples(ds_with_ids):
    """groupby(subj_id, pred, obj_id) -> first provenance (min (conv_id,
    turn_idx)) + support count (SHUFFLE 4, op D5). Deterministic across
    block orderings because min/count are order-insensitive."""
    from ..schemas import TRIPLES

    def per_group(group: pa.Table) -> pa.Table:
        order = pc.sort_indices(
            group,
            sort_keys=[("conv_id", "ascending"), ("turn_idx", "ascending"),
                       ("subj_surface", "ascending"), ("obj_surface", "ascending")],
        )
        first = group.take(order[:1])
        cols = {
            "subj_id": first.column("subj_id"),
            "pred": first.column("pred"),
            "obj_id": first.column("obj_id"),
            "conv_id": first.column("conv_id"),
            "turn_idx": first.column("turn_idx"),
            "subj_surface": first.column("subj_surface"),
            "obj_surface": first.column("obj_surface"),
            "support": pa.array([group.num_rows], pa.int64()),
        }
        return pa.Table.from_pydict(cols, schema=TRIPLES)

    return ds_with_ids.groupby(["subj_id", "pred", "obj_id"]).map_groups(
        per_group, batch_format="pyarrow"
    )


def build_nodes(mentions_flat, raw_triples, canon_ref, *, concurrency=None):
    """NODES table: canonical surface + mention-occurrence counts.

    Occurrences = every mention row + every triple endpoint (matching
    oracle.build_graph). Partial counts per batch, then one small groupby.
    """
    from ..schemas import NODES

    def occ_mentions(batch: pa.Table) -> pa.Table:
        return _occ_table(
            zip(batch.column("etype").to_pylist(), batch.column("surface").to_pylist())
        )

    def occ_triples(batch: pa.Table) -> pa.Table:
        pairs = list(zip(batch.column("subj_etype").to_pylist(), batch.column("subj_surface").to_pylist()))
        pairs += list(zip(batch.column("obj_etype").to_pylist(), batch.column("obj_surface").to_pylist()))
        return _occ_table(pairs)

    occ = mentions_flat.map_batches(occ_mentions, batch_format="pyarrow", zero_copy_batch=True).union(
        raw_triples.map_batches(occ_triples, batch_format="pyarrow", zero_copy_batch=True)
    )

    class NodeFinalizer:
        def __init__(self, canon_ref):
            import ray

            canon: pa.Table = ray.get(canon_ref)
            self.info = {}
            for et, norm, cn, eid in zip(
                canon.column("etype").to_pylist(),
                canon.column("norm").to_pylist(),
                canon.column("canonical_norm").to_pylist(),
                canon.column("entity_id").to_pylist(),
            ):
                self.info[(et, norm)] = (eid, cn)

        def __call__(self, batch: pa.Table) -> pa.Table:
            eids, cns = [], []
            for et, norm in zip(batch.column("etype").to_pylist(), batch.column("norm").to_pylist()):
                eid, cn = self.info[(et, norm)]
                eids.append(eid)
                cns.append(cn)
            return batch.append_column("entity_id", pa.array(eids, pa.string())).append_column(
                "canonical_norm", pa.array(cns, pa.string())
            )

    occ = occ.map_batches(
        NodeFinalizer,
        fn_constructor_kwargs={"canon_ref": canon_ref},
        batch_format="pyarrow",
        zero_copy_batch=True,
        concurrency=concurrency or 4,
        num_cpus=0.5,
    )

    def per_node(group: pa.Table) -> pa.Table:
        etype = group.column("etype").to_pylist()[0]
        eid = group.column("entity_id").to_pylist()[0]
        cn = group.column("canonical_norm").to_pylist()[0]
        surfs = group.column("surface").to_pylist()
        counts = group.column("n").to_pylist()
        # canonical surface: lexicographically smallest original surface
        # whose normalized form equals the canonical norm (oracle contract)
        exact = sorted(s for s in surfs if rules.normalize_surface(s) == cn)
        canonical = exact[0] if exact else min(surfs)
        return pa.Table.from_pydict(
            {
                "entity_id": [eid],
                "canonical_surface": [canonical],
                "etype": [etype],
                "n_mentions": [int(sum(counts))],
            },
            schema=NODES,
        )

    return occ.groupby("entity_id").map_groups(per_node, batch_format="pyarrow")


def _occ_table(pairs) -> pa.Table:
    from collections import Counter

    c = Counter()
    for et, surf in pairs:
        c[(et, surf)] += 1
    ets, norms, surfs, ns = [], [], [], []
    for (et, surf), n in sorted(c.items()):
        ets.append(et)
        norms.append(rules.normalize_surface(surf))
        surfs.append(surf)
        ns.append(n)
    return pa.Table.from_pydict(
        {"etype": ets, "norm": norms, "surface": surfs, "n": ns},
        schema=pa.schema(
            [("etype", pa.string()), ("norm", pa.string()), ("surface", pa.string()), ("n", pa.int64())]
        ),
    )


def build_edges(triples_ds):
    """EDGES table: groupby(src,dst,pred) summed support."""
    from ..schemas import EDGES

    def per_edge(group: pa.Table) -> pa.Table:
        return pa.Table.from_pydict(
            {
                "src_id": group.column("subj_id").slice(0, 1),
                "dst_id": group.column("obj_id").slice(0, 1),
                "pred": group.column("pred").slice(0, 1),
                "weight": pa.array([int(pc.sum(group.column("support")).as_py())], pa.int64()),
            },
            schema=EDGES,
        )

    return triples_ds.groupby(["subj_id", "obj_id", "pred"]).map_groups(
        per_edge, batch_format="pyarrow"
    )
