"""The flagship knowledge-graph construction pipeline (north rule).

Stage graph (SURVEY.md §7):

    read_parquet(transcripts)
      -> map_batches(detect+classify+precompute)     # S1-S5 fused, one text pass
      -> window + carry                              # skew salt (S8 analog)
      -> bucketed group extraction                   # SHUFFLE 1 (S9, J1 fused;
                                                     #  text never shuffles)
      -> occ hash-aggregate (distributed)            # SHUFFLE 2
      -> driver clustering of LINKABLE keys only     # vocabulary-bounded (S7/D6)
      -> CONCURRENTLY:
           id assignment + dedup                     # SHUFFLE 3 (D5; J5 broadcast)
         ∥ distributed node build                    # SHUFFLE 4
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
    max_tokens: int | None = None,
    scorer: str = "rules",
    decode_mode: str = "first_wins",
    context_mode: str = "recency",
    link_sim_threshold: float | None = None,
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
    from .. import rules

    combined = ex.extract_combined(
        transcripts, concurrency=concurrency, batch_size=batch_size,
        window_turns=window_turns, scorer=scorer, decode_mode=decode_mode,
        context_mode=context_mode,
        max_tokens=max_tokens or rules.MAX_TOKENS_DEFAULT,
    ).materialize()
    mentions = ex.mentions_from_combined(combined)
    raw_triples = ex.triples_from_combined(combined)

    # Linking: the distinct occurrence table (occ) stays DISTRIBUTED (it
    # grows with vocabulary + identifier count); only the distinct LINKABLE
    # (etype, norm) keys — bounded by the linkable vocabulary, independent
    # of corpus size — ever reach the driver, where they are clustered
    # through the SAME rules.cluster_block the oracle uses. Non-linkable
    # ids (the corpus-growing majority) are pure functions computed inline
    # in every parallel scan; nodes are built fully distributed from occ.
    occ = occ_from_combined(combined).materialize()
    canon_tbl = lk.canonicalize_linkable(occ, threshold=link_sim_threshold)
    canon_ref = ray.put(canon_tbl)

    # The triples (assign -> dedup shuffle) and nodes (surf-key shuffle)
    # pipelines are independent once the canon map exists — drive both
    # executions CONCURRENTLY so their fixed shuffle latencies overlap
    # instead of adding up (this tail is the level-independent term that
    # bounds scaling efficiency; measured ~9s serial -> ~5s overlapped at
    # 32 CPUs on the 2.17M-turn corpus).
    import threading

    results: dict = {}
    errors: list = []

    def _mat(name, fn):
        try:
            results[name] = fn()
        except BaseException as e:  # surfaced after join
            errors.append(e)

    t_tri = threading.Thread(target=_mat, args=("triples", lambda: lk.dedup_triples(
        lk.assign_entity_ids(raw_triples, canon_ref, concurrency=concurrency)
    ).materialize()))
    t_nod = threading.Thread(target=_mat, args=("nodes", lambda: lk.build_nodes_from_occ(
        occ, canon_ref
    ).materialize()))
    t_tri.start()
    t_nod.start()
    t_tri.join()
    t_nod.join()
    if errors:
        raise errors[0]
    triples, nodes = results["triples"], results["nodes"]
    edges = lk.build_edges(triples)
    return triples, nodes, edges, mentions


def occ_from_combined(combined):
    """kind=2 occurrence-partial rows of the combined extraction output ->
    distributed distinct occurrence table (etype, surface, norm, n). The
    grouped-extraction pass already pre-aggregated per task, so this scan
    moves only the small partial rows into one bucketed aggregate."""
    import pandas as pd

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        g = batch.loc[batch["kind"] == 2, ["etype", "surface", "occ_n"]].rename(
            columns={"occ_n": "n"}
        )
        return g.groupby(["etype", "surface"], as_index=False)["n"].sum()

    parts = combined.map_batches(partial, batch_format="pandas", batch_size=65536)
    return lk.aggregate_occ(parts)
