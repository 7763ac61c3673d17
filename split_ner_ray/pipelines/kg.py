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
    # classified feeds two branches (mentions, windowed triples) and each
    # downstream is consumed by several stages — materialize the classified
    # stream ONCE so the detector/classifier actors run a single pass over
    # the corpus (blocks spill under pressure). The checkpointed job
    # (pipelines/checkpointed.py) streams this hand-off to parquet instead,
    # which also provides resumability.
    classified = ex.detect_and_classify(
        transcripts, concurrency=concurrency, batch_size=batch_size
    ).materialize()
    mentions = ex.flatten_mentions(classified)
    windowed = ex.add_windows_with_carry(classified, window_turns)
    raw_triples = ex.extract_triples_grouped(windowed, window_turns).materialize()

    keys = lk.mention_keys(mentions, raw_triples)
    canon = lk.build_canon_map(keys)
    canon_tbl = _materialize_small(canon)
    canon_ref = ray.put(canon_tbl)

    with_ids = lk.assign_entity_ids(raw_triples, canon_ref, concurrency=concurrency)
    triples = lk.dedup_triples(with_ids).materialize()
    nodes = lk.build_nodes(mentions, raw_triples, canon_ref, concurrency=concurrency)
    edges = lk.build_edges(triples)
    return triples, nodes, edges, mentions


def _materialize_small(ds):
    """Materialize a small control table on the driver (canon map). At
    10^12-turn scale this table is bounded by distinct normalized surfaces;
    if it outgrows driver memory switch id-assignment to
    stages/joins.partitioned_join (documented fallback in linking.py)."""
    import pyarrow as pa

    tables = ds.to_arrow_refs()
    resolved = [t for t in ray.get(tables) if t.num_rows]
    if not resolved:
        return pa.Table.from_pydict({n: [] for n in lk.CANON_SCHEMA.names}, schema=lk.CANON_SCHEMA)
    return pa.concat_tables([t.select(lk.CANON_SCHEMA.names) for t in resolved]).combine_chunks()
