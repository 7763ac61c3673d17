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
   attached via the partitioned hash join in stages/relational.py.

Scale invariant (the round-2 scaling fix): only LINKABLE_ETYPES ever reach
the driver or the broadcast map. Non-linkable surfaces (ids, tools) grow
linearly with the corpus, but their entity_id is a pure function
rules.entity_id(etype, norm) — computed inline in every parallel scan, never
collected. The driver-side work is therefore bounded by the *linkable
vocabulary* (gazetteer-sized), independent of corpus size.

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


def occ_partials_from_tables(mentions_flat, raw_triples):
    """Per-batch partial occurrence counts (etype, surface, n) from mention
    rows + both triple endpoints (oracle.build_graph's occurrence
    definition). Combiner pattern: each batch pre-aggregates before the
    shuffle; aggregate_occ finishes the job."""
    import pandas as pd

    def occ_m(batch: pd.DataFrame) -> pd.DataFrame:
        g = batch.groupby(["etype", "surface"], as_index=False).size()
        return g.rename(columns={"size": "n"})

    def occ_t(batch: pd.DataFrame) -> pd.DataFrame:
        both = pd.concat(
            [
                batch[["subj_etype", "subj_surface"]].rename(
                    columns={"subj_etype": "etype", "subj_surface": "surface"}
                ),
                batch[["obj_etype", "obj_surface"]].rename(
                    columns={"obj_etype": "etype", "obj_surface": "surface"}
                ),
            ]
        )
        g = both.groupby(["etype", "surface"], as_index=False).size()
        return g.rename(columns={"size": "n"})

    return mentions_flat.map_batches(occ_m, batch_format="pandas", batch_size=32768).union(
        raw_triples.map_batches(occ_t, batch_format="pandas", batch_size=32768)
    )


def aggregate_occ(partials):
    """(etype, surface, n) partial rows -> DISTRIBUTED distinct occurrence
    table (etype, surface, norm, n). One bucketed int-key shuffle; norm is
    computed per bucket over the already-distinct surfaces. Nothing here
    ever touches the driver — occ stays a Dataset (it is distinct-pair
    sized, i.e. grows with vocabulary + identifier count, not turns)."""
    import pandas as pd

    from .relational import hash_aggregate

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        out = g.groupby(["etype", "surface"], as_index=False)["n"].sum()
        out["norm"] = rules.normalize_series(out["surface"])
        out["n"] = out["n"].astype("int64")
        return out[["etype", "surface", "norm", "n"]]

    return hash_aggregate(partials, ["etype", "surface"], per_bucket)


def canonicalize_linkable(occ_ds, *, threshold: float | None = None,
                          emb_threshold: float | None = None) -> pa.Table:
    """occ Dataset -> canon Arrow table for LINKABLE keys only.

    Collects ONLY the distinct linkable (etype, norm) keys to the driver —
    bounded by the linkable vocabulary (people/orgs/places/products), NOT by
    the corpus — then blocks + clusters them through the SAME
    rules.cluster_block the oracle uses. Non-linkable keys never appear in
    this table; their ids are computed inline (rules.entity_id) wherever
    needed. At a scale where even the linkable vocabulary outgrows the
    driver, swap in build_canon_map (fully distributed, same semantics)."""
    from collections import defaultdict

    import pandas as pd

    def linkable_keys(batch: pd.DataFrame) -> pd.DataFrame:
        sub = batch[batch["etype"].isin(list(rules.LINKABLE_ETYPES))]
        return sub[["etype", "norm"]].drop_duplicates()

    parts = occ_ds.map_batches(linkable_keys, batch_format="pandas").to_pandas()
    keys = parts.drop_duplicates() if len(parts) else parts

    blocks: dict[str, list[tuple[str, str]]] = defaultdict(list)
    for et, norm in zip(keys.get("etype", []), keys.get("norm", [])):
        blocks[rules.block_key(norm, et)].append((et, norm))
    canon: dict[tuple[str, str], str] = {}
    for bk in sorted(blocks):
        canon.update(rules.cluster_block(blocks[bk], threshold, emb_threshold))

    ks = sorted(canon)
    return pa.Table.from_pydict(
        {
            "etype": [k[0] for k in ks],
            "norm": [k[1] for k in ks],
            "canonical_norm": [canon[k] for k in ks],
            "entity_id": [rules.entity_id(k[0], canon[k]) for k in ks],
        },
        schema=CANON_SCHEMA,
    )


def mention_keys(mentions_flat, raw_triples):
    """Distinct (etype, norm) keys from mentions + both triple endpoints,
    with per-batch partial dedup before the shuffle (combiner pattern).
    Vectorized: drop_duplicates first, normalize only the distinct surfaces
    (surfaces repeat heavily — profiled 5x on the canon path)."""
    import pandas as pd

    def keys_from_mentions(batch: pd.DataFrame) -> pd.DataFrame:
        d = batch[["etype", "surface"]].drop_duplicates()
        return _keys_frame(d["etype"], d["surface"])

    def keys_from_triples(batch: pd.DataFrame) -> pd.DataFrame:
        d = pd.concat(
            [
                batch[["subj_etype", "subj_surface"]].rename(
                    columns={"subj_etype": "etype", "subj_surface": "surface"}
                ),
                batch[["obj_etype", "obj_surface"]].rename(
                    columns={"obj_etype": "etype", "obj_surface": "surface"}
                ),
            ]
        ).drop_duplicates()
        return _keys_frame(d["etype"], d["surface"])

    a = mentions_flat.map_batches(keys_from_mentions, batch_format="pandas", batch_size=16384)
    b = raw_triples.map_batches(keys_from_triples, batch_format="pandas", batch_size=16384)
    return a.union(b)


def _keys_frame(ets, surfs):
    import pandas as pd

    norms = rules.normalize_series(surfs)
    df = pd.DataFrame({"etype": ets.values, "norm": norms.values}).drop_duplicates()
    df["block"] = [rules.block_key(n, e) for e, n in zip(df["etype"], df["norm"])]
    return df.reset_index(drop=True)


def build_canon_map(keys_ds, *, threshold: float | None = None,
                    emb_threshold: float | None = None):
    """groupby(block).map_groups(dedup + pairwise sim + union-find) ->
    CANON_SCHEMA rows. One shuffle; per-block work is quadratic in distinct
    surfaces per block (bounded by the blocking function's selectivity).
    ``threshold``/``emb_threshold`` are forwarded to rules.cluster_block so
    this really is the drop-in distributed swap for canonicalize_linkable
    — a tuned pipeline keeps its thresholds when it outgrows the driver."""

    import pandas as pd

    from .relational import hash_aggregate

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        frames = []
        for _blk, sub in g.groupby("block", sort=True):
            members = list(zip(sub["etype"], sub["norm"]))
            # SHARED rule core (oracle parity)
            canon = rules.cluster_block(members, threshold, emb_threshold)
            ks = sorted(canon)
            frames.append(
                pd.DataFrame(
                    {
                        "etype": [k[0] for k in ks],
                        "norm": [k[1] for k in ks],
                        "canonical_norm": [canon[k] for k in ks],
                        "entity_id": [rules.entity_id(k[0], canon[k]) for k in ks],
                    }
                )
            )
        if not frames:
            return pd.DataFrame({n: [] for n in CANON_SCHEMA.names})
        return pd.concat(frames, ignore_index=True)

    # bucketed on hash(block): each block lives in exactly one bucket, so
    # per-bucket clustering is globally correct (same argument as the
    # block-partitioned similarity graph)
    return hash_aggregate(keys_ds, ["block"], per_bucket)


class IdAssigner:
    """Attach entity ids to raw triples via the broadcast canon map.

    The canon map object ref is resolved ONCE per actor in __init__
    (ray.put on the driver, ray.get here) — never re-shipped per batch.
    The map covers LINKABLE keys only; non-linkable ids are the pure
    function rules.entity_id(etype, norm), computed inline — so the
    broadcast stays vocabulary-bounded at any corpus size. For linkable
    vocabularies too large to broadcast, use
    stages/relational.partitioned_join on (etype, norm) instead.
    """

    def __init__(self, canon_ref):
        self.eid = _canon_map(canon_ref, ("entity_id",))

    def __call__(self, batch: pa.Table) -> pa.Table:
        # vectorized: surfaces repeat heavily — normalize only the DISTINCT
        # (etype, surface) pairs per batch, then a pandas map joins ids back
        import pandas as pd

        sep = chr(30)
        out_cols = []
        for et_col, surf_col in (("subj_etype", "subj_surface"), ("obj_etype", "obj_surface")):
            ets = batch.column(et_col).to_pandas()
            surfs = batch.column(surf_col).to_pandas()
            keys = ets.str.cat(surfs, sep=sep)
            d = pd.DataFrame({"et": ets, "surf": surfs, "key": keys}).drop_duplicates("key")
            d_norm = rules.normalize_series(d["surf"])
            lut = {}
            for k, et, norm in zip(d["key"], d["et"], d_norm):
                eid = self.eid.get((et, norm))
                if eid is None:
                    # inline ids are for NON-linkable keys only: a linkable
                    # key missing from the canon map means the occ/canon
                    # coverage broke — computing a fresh id here would
                    # silently split one entity into two, so fail loudly.
                    if et in rules.LINKABLE_ETYPES:
                        raise KeyError(
                            f"linkable key ({et!r}, {norm!r}) missing from the "
                            "canon map — occ/canon coverage bug"
                        )
                    eid = rules.entity_id(et, norm)
                lut[k] = eid
            out_cols.append(keys.map(lut))
        return batch.append_column(
            "subj_id", pa.array(out_cols[0].tolist(), pa.string())
        ).append_column("obj_id", pa.array(out_cols[1].tolist(), pa.string()))


# per-worker-process broadcast cache (the Ray-idiomatic analog of the
# reference's per-process tokenizer memo, dataset_qa.py:40): the canon map
# object ref resolves + builds its dict ONCE per worker process, so the
# stage can run as an elastic task pool (scales with CPUs) instead of a
# fixed-size actor pool.
_CANON_CACHE: dict[tuple, dict] = {}


def _canon_map(canon_ref, columns: tuple[str, ...]) -> dict:
    """Per-worker-process cached dict view of the broadcast canon table:
    (etype, norm) -> the requested column value (or tuple of values).
    Built once per worker (~1s at 400k keys), then per-batch distinct
    lookups are ~ms. (A per-batch pandas merge against the canon frame
    re-hashes the large side every call — measured 10x slower.) The
    Ray-idiomatic per-process memo, cf. the reference's tokenizer cache
    dataset_qa.py:40; ONE implementation for the id map, the
    (id, canonical) map, and IdAssigner so the cache policies cannot
    drift (review r4)."""
    import ray

    key = (canon_ref.hex(), columns)
    m = _CANON_CACHE.get(key)
    if m is None:
        canon: pa.Table = ray.get(canon_ref)
        ks = zip(canon.column("etype").to_pylist(),
                 canon.column("norm").to_pylist())
        vals = [canon.column(c).to_pylist() for c in columns]
        if len(columns) == 1:
            m = dict(zip(ks, vals[0]))
        else:
            m = dict(zip(ks, zip(*vals)))
        _CANON_CACHE.clear()  # one canon map per job
        _CANON_CACHE[key] = m
    return m


def _eid_map(canon_ref) -> dict:
    return _canon_map(canon_ref, ("entity_id",))


def assign_entity_ids(raw_triples, canon_ref, *, concurrency=None):
    def assign(batch: pa.Table) -> pa.Table:
        assigner = IdAssigner.__new__(IdAssigner)
        assigner.eid = _eid_map(canon_ref)
        return assigner(batch)

    return raw_triples.map_batches(
        assign,
        batch_format="pyarrow",
        zero_copy_batch=True,
        batch_size=16384,
    )


def dedup_triples(ds_with_ids):
    """groupby(subj_id, pred, obj_id) -> first provenance (min tuple of
    (conv_id, turn_idx, subj_surface, obj_surface)) + support count
    (SHUFFLE 4, op D5): ONE bucketed exchange, per bucket a vectorized
    mergesort on the tuple columns + drop_duplicates + size merge — the
    tuple order is computed DIRECTLY on the columns. (An earlier version
    string-encoded the tuple with a chr(31) separator and took the string
    min; that ordering silently diverges from tuple order — and the
    decode crashes — the moment a scorer emits a surface containing a
    control character, which the rules backend never does but an
    arbitrary model backend can.) Deterministic across block orderings
    because min/count are order-insensitive."""
    from ..schemas import TRIPLES
    from .relational import hash_aggregate

    keys = ["subj_id", "pred", "obj_id"]
    prov = ["conv_id", "turn_idx", "subj_surface", "obj_surface"]

    def project(batch: pd.DataFrame) -> pd.DataFrame:
        return batch[keys + prov]

    slim = ds_with_ids.map_batches(project, batch_format="pandas",
                                   batch_size=16384)

    def agg_fn(g: pd.DataFrame) -> pd.DataFrame:
        import numpy as np

        g = g.sort_values(keys + prov, kind="mergesort")
        new = np.zeros(len(g), dtype=bool)
        new[0] = True
        for c in keys:
            a = g[c].to_numpy()
            new[1:] |= a[1:] != a[:-1]
        idx = np.nonzero(new)[0]
        out = g.iloc[idx].copy()
        out["support"] = np.diff(np.append(idx, len(g)))
        return out

    agg = hash_aggregate(slim, keys, agg_fn)

    def finalize(batch: pa.Table) -> pa.Table:
        return pa.Table.from_pydict(
            {
                "subj_id": batch.column("subj_id"),
                "pred": batch.column("pred"),
                "obj_id": batch.column("obj_id"),
                "conv_id": batch.column("conv_id"),
                "turn_idx": pc.cast(batch.column("turn_idx"), pa.int64()),
                "subj_surface": batch.column("subj_surface"),
                "obj_surface": batch.column("obj_surface"),
                "support": pc.cast(batch.column("support"), pa.int64()),
            },
            schema=TRIPLES,
        )

    return agg.map_batches(finalize, batch_format="pyarrow", zero_copy_batch=True)


# per-worker cache of the (etype, norm) -> (entity_id, canonical_norm) dict
def _info_map(canon_ref) -> dict:
    return _canon_map(canon_ref, ("entity_id", "canonical_norm"))


def build_nodes_from_occ(occ_ds, canon_ref):
    """NODES table, fully distributed, from the distinct occurrence table
    (etype, surface, norm, n) produced by aggregate_occ.

    Linkable keys resolve (entity_id, canonical_norm) through the broadcast
    canon map (per-worker cached); non-linkable keys compute both inline
    (canonical form = own norm, id = rules.entity_id) — nothing
    corpus-shaped reaches the driver. Canonical-surface choice is a Min
    aggregate over prefixed surf_keys: eligible surfaces (norm == canonical
    norm) are prefixed "0", others "1", so Min picks the lexicographically
    smallest eligible surface, falling back to the smallest surface overall
    — exactly the oracle contract — without a sort-based map_groups."""
    import pandas as pd

    from ..schemas import NODES
    from .relational import hash_aggregate

    def surf_keys(batch: pd.DataFrame) -> pd.DataFrame:
        info = _info_map(canon_ref)
        eids, keys = [], []
        for et, norm, surf in zip(batch["etype"], batch["norm"], batch["surface"]):
            hit = info.get((et, norm))
            if hit is not None:
                eid, cn = hit
            else:
                eid, cn = rules.entity_id(et, norm), norm
            eids.append(eid)
            keys.append(("0" if norm == cn else "1") + surf)
        return pd.DataFrame(
            {
                "entity_id": eids,
                "etype": batch["etype"],
                "surf_key": keys,
                "n": batch["n"].astype("int64"),
            }
        )

    rows = occ_ds.map_batches(surf_keys, batch_format="pandas", batch_size=16384)

    def node_agg(g: pd.DataFrame) -> pd.DataFrame:
        return g.groupby(["entity_id", "etype"], as_index=False).agg(
            surf_key=("surf_key", "min"), n_mentions=("n", "sum")
        )

    agg = hash_aggregate(rows, ["entity_id"], node_agg)

    def finalize(batch: pa.Table) -> pa.Table:
        return pa.Table.from_pydict(
            {
                "entity_id": batch.column("entity_id"),
                "canonical_surface": [s[1:] for s in batch.column("surf_key").to_pylist()],
                "etype": batch.column("etype"),
                "n_mentions": pc.cast(batch.column("n_mentions"), pa.int64()),
            },
            schema=NODES,
        )

    return agg.map_batches(finalize, batch_format="pyarrow", zero_copy_batch=True)


def build_edges(triples_ds):
    """EDGES table: pure projection — deduped triples are already unique on
    (subj_id, pred, obj_id), so edges need no shuffle at all."""
    from ..schemas import EDGES

    def project(batch: pa.Table) -> pa.Table:
        return pa.Table.from_pydict(
            {
                "src_id": batch.column("subj_id"),
                "dst_id": batch.column("obj_id"),
                "pred": batch.column("pred"),
                "weight": batch.column("support"),
            },
            schema=EDGES,
        )

    return triples_ds.map_batches(project, batch_format="pyarrow", zero_copy_batch=True)
