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

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        m = batch[batch["kind"] == 0]
        t = batch[batch["kind"] == 1]
        both = pd.concat(
            [
                m[["etype", "surface"]],
                t[["subj_etype", "subj_surface"]].rename(
                    columns={"subj_etype": "etype", "subj_surface": "surface"}
                ),
                t[["obj_etype", "obj_surface"]].rename(
                    columns={"obj_etype": "etype", "obj_surface": "surface"}
                ),
            ]
        )
        return both.groupby(["etype", "surface"], as_index=False).size().rename(
            columns={"size": "n"}
        )

    parts = combined.map_batches(partial, batch_format="pandas", batch_size=32768).to_pandas()
    return parts.groupby(["etype", "surface"], as_index=False)["n"].sum()


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
    occ["norm"] = rules.normalize_series(occ["surface"])
    keys = occ[["etype", "norm"]].drop_duplicates()
    blocks: dict[str, list[tuple[str, str]]] = defaultdict(list)
    for et, norm in zip(keys["etype"], keys["norm"]):
        blocks[rules.block_key(norm, et)].append((et, norm))
    canon: dict[tuple[str, str], str] = {}
    for bk in sorted(blocks):
        canon.update(rules.cluster_block(blocks[bk]))

    ks = sorted(canon)
    canon_tbl = pa.Table.from_pydict(
        {
            "etype": [k[0] for k in ks],
            "norm": [k[1] for k in ks],
            "canonical_norm": [canon[k] for k in ks],
            "entity_id": [rules.entity_id(k[0], canon[k]) for k in ks],
        },
        schema=CANON_SCHEMA,
    )

    # nodes: min eligible surface (norm == canonical norm) else min surface,
    # occurrence counts summed per component — the oracle contract
    occ["canonical_norm"] = [canon[(et, n)] for et, n in zip(occ["etype"], occ["norm"])]
    occ["entity_id"] = [
        rules.entity_id(et, cn) for et, cn in zip(occ["etype"], occ["canonical_norm"])
    ]
    occ["surf_key"] = [
        ("0" if n == cn else "1") + s
        for n, cn, s in zip(occ["norm"], occ["canonical_norm"], occ["surface"])
    ]
    g = occ.groupby(["entity_id", "etype"], as_index=False).agg(
        surf_key=("surf_key", "min"), n_mentions=("n", "sum")
    )
    g = g.sort_values("entity_id")
    nodes_tbl = pa.Table.from_pydict(
        {
            "entity_id": g["entity_id"].tolist(),
            "canonical_surface": [s[1:] for s in g["surf_key"]],
            "etype": g["etype"].tolist(),
            "n_mentions": [int(v) for v in g["n_mentions"]],
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
