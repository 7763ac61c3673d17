"""The flagship knowledge-graph construction pipeline (north rule).

Stage graph (SURVEY.md §7):

    read_parquet(transcripts)
      -> map_batches(SpanDetector actor pool)        # S1+S4
      -> map_batches(SpanClassifier actor pool)      # S2+S5
      -> window + carry                              # skew salt (S8 analog)
      -> groupby(conv_id, win).map_groups(triples)   # SHUFFLE 1 (S9, J1 fused)
      -> linking: keys -> groupby(block) -> canon    # SHUFFLE 2 (S6/S7/D6)
      -> id assignment (broadcast canon, ray.put)    # J5 small-side broadcast
      -> groupby(subj,pred,obj) dedup                # SHUFFLE 3 (D5)
      -> triples/nodes/edges parquet                 # R3

The caller owns the Ray session (driver contract): nothing here calls
ray.init.
"""

from __future__ import annotations

import ray
import ray.data as rd

from ..stages import extract as ex
from ..stages import linking as lk

TRANSCRIPT_COLS = ["conv_id", "turn_idx", "role", "text", "tool", "ts"]
EXTRACT_COLS = ["conv_id", "turn_idx", "text", "tool"]  # prune at the read


def read_transcripts(path: str, columns: list[str] | None = None):
    return rd.read_parquet(path, columns=columns or EXTRACT_COLS)


def build_graph_datasets(
    transcripts,
    *,
    concurrency=None,
    batch_size: int = 1024,
    window_turns: int = ex.WINDOW_TURNS,
):
    """transcripts Dataset -> (triples, nodes, edges, mentions) Datasets.

    ``mentions`` and ``raw_triples`` fan out from one classified stream.
    The canon map is materialized (it is the small distinct-surface table,
    not the corpus) and broadcast once via ray.put.
    """
    # ONE fused streaming pipeline (detect -> classify -> window -> grouped
    # extraction emitting mention AND triple rows) ending in the single
    # reassembly shuffle; only its small combined output is materialized —
    # the full classified corpus never is. This keeps the parallel compute
    # fraction high (scaling efficiency) and the memory footprint low. The
    # checkpointed job (pipelines/checkpointed.py) streams the same combined
    # output to parquet instead, which also provides resumability.
    combined = ex.extract_combined(
        transcripts, concurrency=concurrency, batch_size=batch_size,
        window_turns=window_turns,
    ).materialize()
    mentions = ex.mentions_from_combined(combined)
    raw_triples = ex.triples_from_combined(combined)

    # Linking + node build operate on the DISTINCT-surface table (occ),
    # which is orders of magnitude smaller than the corpus (bounded by
    # vocabulary, not turns). One parallel scan pre-aggregates it; the
    # final clustering/canonicalization runs driver-side through the SAME
    # rules.cluster_block the oracle uses. At a scale where distinct
    # surfaces outgrow the driver (~10M+), swap in the fully distributed
    # lk.build_canon_map / lk.build_nodes paths (kept + tested).
    occ = _occ_aggregate(combined)
    canon_tbl, nodes_tbl = _canonicalize_driver(occ)
    canon_ref = ray.put(canon_tbl)

    with_ids = lk.assign_entity_ids(raw_triples, canon_ref, concurrency=concurrency)
    triples = lk.dedup_triples(with_ids).materialize()
    nodes = rd.from_arrow(nodes_tbl)
    edges = lk.build_edges(triples)
    return triples, nodes, edges, mentions


def _occ_aggregate(combined):
    """One parallel scan over the combined extraction output -> driver
    pandas table of (etype, surface, n) occurrence counts (mention rows +
    both triple endpoints — matching oracle.build_graph's occurrence
    definition). Partial counts per batch; final groupby on the driver over
    the small distinct-pair partials."""
    import pandas as pd

    import hashlib

    from .. import rules

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        # the grouped-extraction pass already emitted per-task occurrence
        # partials (kind=2 rows) — this scan only touches those few rows
        g = batch.loc[batch["kind"] == 2, ["etype", "surface", "occ_n"]].rename(
            columns={"occ_n": "n"}
        )
        g = g.groupby(["etype", "surface"], as_index=False)["n"].sum()
        # normalization + the (dominant) non-linkable entity ids are pure
        # per-surface functions — compute them IN the parallel scan so the
        # driver-side finalization only clusters the tiny linkable subset
        g["norm"] = rules.normalize_series(g["surface"])
        linkable = g["etype"].isin(list(rules.LINKABLE_ETYPES))
        g["eid_nl"] = [
            None if lk else "e_" + hashlib.sha1(f"{et}|{n}".encode()).hexdigest()[:16]
            for lk, et, n in zip(linkable, g["etype"], g["norm"])
        ]
        return g

    parts = combined.map_batches(partial, batch_format="pandas", batch_size=65536).to_pandas()
    return parts.groupby(["etype", "surface", "norm"], as_index=False).agg(
        n=("n", "sum"), eid_nl=("eid_nl", "first")
    )


def _canonicalize_driver(occ):
    """occ (etype, surface, n) -> (canon Arrow table, NODES Arrow table),
    driver-side, via the shared rules.cluster_block (oracle-identical)."""
    from collections import defaultdict

    import pandas as pd
    import pyarrow as pa

    from .. import rules
    from ..schemas import NODES
    from ..stages.linking import CANON_SCHEMA

    occ = occ.copy()
    if "norm" not in occ.columns:  # occ from _occ_aggregate already has it
        occ["norm"] = rules.normalize_series(occ["surface"])
    keys = occ[["etype", "norm"]].drop_duplicates()

    # Clustering only ever links LINKABLE_ETYPES (rules.cluster_block);
    # exact-identifier keys (ids, tools — the overwhelming majority, they
    # grow with the corpus) are their own canonical form, so the union-find
    # runs only on the small linkable subset and everything else is
    # vectorized (profiled: 20s -> ~3s at 400k distinct surfaces).
    linkable_mask = keys["etype"].isin(list(rules.LINKABLE_ETYPES))
    blocks: dict[str, list[tuple[str, str]]] = defaultdict(list)
    for et, norm in zip(keys.loc[linkable_mask, "etype"], keys.loc[linkable_mask, "norm"]):
        blocks[rules.block_key(norm, et)].append((et, norm))
    canon: dict[tuple[str, str], str] = {}
    for bk in sorted(blocks):
        canon.update(rules.cluster_block(blocks[bk]))

    # canonical/entity_id computed directly on occ rows via dict lookups —
    # no 400k x 400k string merge (profiled: the merge + string-min groupby
    # was the serial hot spot). sha1 ids are memoized per canonical norm.
    import hashlib

    eid_cache: dict[tuple[str, str], str] = {}

    def eid_of(et: str, cn: str) -> str:
        v = eid_cache.get((et, cn))
        if v is None:
            v = "e_" + hashlib.sha1(f"{et}|{cn}".encode()).hexdigest()[:16]
            eid_cache[(et, cn)] = v
        return v

    occ_ets = occ["etype"].tolist()
    occ_norms = occ["norm"].tolist()
    occ["canonical_norm"] = [
        canon.get((et, n), n) for et, n in zip(occ_ets, occ_norms)
    ]
    if "eid_nl" in occ.columns:
        # non-linkable ids were computed in the parallel scan; only the
        # (tiny) linkable subset needs sha1 here
        pre = occ["eid_nl"].tolist()
        occ["entity_id"] = [
            p if isinstance(p, str) else eid_of(et, cn)
            for p, et, cn in zip(pre, occ_ets, occ["canonical_norm"])
        ]
    else:
        occ["entity_id"] = [
            eid_of(et, cn) for et, cn in zip(occ_ets, occ["canonical_norm"])
        ]

    canon_df = occ[["etype", "norm", "canonical_norm", "entity_id"]].drop_duplicates(
        ["etype", "norm"]
    )
    canon_tbl = pa.Table.from_pydict(
        {c: canon_df[c].values for c in CANON_SCHEMA.names}, schema=CANON_SCHEMA
    )

    # nodes: min eligible surface (norm == canonical norm) else min surface,
    # occurrence counts summed per component — the oracle contract. Min via
    # sort + drop_duplicates (string-min groupby over ~1 group per row is
    # pathologically slow in pandas).
    occ["surf_key"] = (
        (occ["norm"] != occ["canonical_norm"]).astype(int).astype(str) + occ["surface"]
    )
    first = occ.sort_values(["entity_id", "surf_key"]).drop_duplicates(
        "entity_id", keep="first"
    )[["entity_id", "etype", "surf_key"]]
    sums = occ.groupby("entity_id", as_index=False)["n"].sum()
    g = first.merge(sums, on="entity_id")
    nodes_tbl = pa.Table.from_pydict(
        {
            "entity_id": g["entity_id"].values,
            "canonical_surface": g["surf_key"].str.slice(1).values,
            "etype": g["etype"].values,
            "n_mentions": g["n"].astype("int64").values,
        },
        schema=NODES,
    )
    return canon_tbl, nodes_tbl


def _materialize_small(ds):
    """Materialize a small control table on the driver (canon map). At
    10^12-turn scale this table is bounded by distinct normalized surfaces;
    if it outgrows driver memory switch id-assignment to
    stages/joins.partitioned_join (documented fallback in linking.py)."""
    import pandas as pd
    import pyarrow as pa

    resolved = []
    for t in ray.get(ds.to_arrow_refs()):
        # mixed-format pipelines can surface empty pandas blocks here
        if isinstance(t, pd.DataFrame):
            t = pa.Table.from_pandas(t, preserve_index=False)
        if t.num_rows:
            resolved.append(t)
    if not resolved:
        return pa.Table.from_pydict({n: [] for n in lk.CANON_SCHEMA.names}, schema=lk.CANON_SCHEMA)
    return pa.concat_tables([t.select(lk.CANON_SCHEMA.names) for t in resolved]).combine_chunks()
