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


# In-memory-route ceiling (input parquet bytes on disk). Below it the
# combined extraction materializes in the object store (measured fine
# through 10M turns with no spill); above it build_graph_datasets
# auto-delegates to the streaming checkpointed job, whose phase-A output
# goes straight to parquet per commit-group — bounded memory AND free
# resumability at exactly the sizes where a retry-from-zero hurts.
KG_INMEM_ROUTE_LIMIT_BYTES = 16 << 30


def _pure_read_files(ds) -> list[str]:
    """The dataset's input parquet files IFF it is an untransformed
    read_parquet (safe to re-read by path); [] otherwise. A dataset with
    transforms applied must NOT be routed through the path-based
    checkpointed job — the transforms would be silently dropped."""
    try:
        dag = ds._logical_plan.dag
        if type(dag).__name__ != "Read" or dag.input_dependencies:
            return []
        return list(ds.input_files())
    except Exception:
        return []


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
    inmem_limit_bytes: int = KG_INMEM_ROUTE_LIMIT_BYTES,
    checkpoint_dir: str | None = None,
):
    """transcripts Dataset -> (triples, nodes, edges, mentions) Datasets.

    ``mentions`` and ``raw_triples`` fan out from one classified stream.
    The canon map is materialized (it is the small distinct-surface table,
    not the corpus) and broadcast once via ray.put.

    Auto-routing: when ``transcripts`` is an untransformed read_parquet
    whose on-disk input exceeds ``inmem_limit_bytes``, the build delegates
    to the streaming checkpointed job (pipelines/checkpointed.py) under
    ``checkpoint_dir`` (derived from the input fingerprint if None) and
    returns the job's parquet outputs as Datasets — byte-identical
    triples (tested), bounded memory, resumable. Datasets with transforms
    applied never route (the guard requires a pure read); pass
    ``inmem_limit_bytes=0`` with a pure read to force the job route.
    """
    files = _pure_read_files(transcripts)
    if files:
        import os

        total = sum(os.path.getsize(f) for f in files)
        if total > inmem_limit_bytes:
            return _build_via_checkpointed_job(
                files, total, checkpoint_dir,
                concurrency=concurrency, batch_size=batch_size,
                window_turns=window_turns, max_tokens=max_tokens,
                scorer=scorer, decode_mode=decode_mode,
                context_mode=context_mode,
                link_sim_threshold=link_sim_threshold,
            )
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


def _build_via_checkpointed_job(files, total_bytes, checkpoint_dir, *,
                                concurrency, batch_size, window_turns,
                                max_tokens, scorer, decode_mode,
                                context_mode, link_sim_threshold):
    """Large-corpus route: run (or resume) the streaming checkpointed job
    over the exact input fragments and return its parquet outputs as
    Datasets. The job dir is fingerprinted by (path, size, mtime) of
    every fragment AND every extraction parameter, so a completed job is
    reused only for the identical (input, parameters) pair — a changed
    window size or scorer can never silently serve a stale _SUCCESS. A
    pid lock file serializes concurrent drivers of the SAME job dir
    (second caller raises rather than interleaving group writes); a lock
    whose pid is dead is reclaimed."""
    import hashlib
    import json
    import os

    from . import checkpointed as cp

    params = dict(batch_size=batch_size, window_turns=window_turns,
                  max_tokens=max_tokens, scorer=scorer,
                  decode_mode=decode_mode, context_mode=context_mode,
                  link_sim_threshold=link_sim_threshold)
    if checkpoint_dir is None:
        sig = hashlib.md5(json.dumps([
            [[f, os.path.getsize(f), os.stat(f).st_mtime_ns]
             for f in sorted(files)],
            sorted(params.items(), key=str),
        ], default=str).encode()).hexdigest()[:16]
        checkpoint_dir = f"/tmp/graft_kg_job/{sig}"
    if not os.path.exists(os.path.join(checkpoint_dir, "_SUCCESS")):
        os.makedirs(checkpoint_dir, exist_ok=True)
        lock = os.path.join(checkpoint_dir, "_driver.lock")
        try:
            fd = os.open(lock, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
            os.write(fd, str(os.getpid()).encode())
            os.close(fd)
        except FileExistsError:
            with open(lock) as f:
                holder = int(f.read().strip() or "0")
            if holder and os.path.exists(f"/proc/{holder}"):
                raise RuntimeError(
                    f"kg job {checkpoint_dir} is being built by live pid "
                    f"{holder}; wait for it or pass a different "
                    f"checkpoint_dir") from None
            with open(lock, "w") as f:  # stale holder: reclaim
                f.write(str(os.getpid()))
        try:
            cp.build_graph_job(
                sorted(files), checkpoint_dir,
                concurrency=concurrency, batch_size=batch_size,
                window_turns=window_turns, max_tokens=max_tokens,
                scorer=scorer, decode_mode=decode_mode,
                context_mode=context_mode,
                link_sim_threshold=link_sim_threshold,
            )
        finally:
            try:
                os.remove(lock)
            except OSError:
                pass
    triples = rd.read_parquet(os.path.join(checkpoint_dir, "triples"))
    nodes = rd.read_parquet(os.path.join(checkpoint_dir, "nodes"))
    edges = rd.read_parquet(os.path.join(checkpoint_dir, "edges"))
    # drop the hive partition key the group-dir layout adds on read, so
    # both routes return ONE mentions schema (the volume-triggered
    # schema change trap)
    mentions = rd.read_parquet(
        os.path.join(checkpoint_dir, "_work", "mentions"))
    if "group" in mentions.schema().names:
        mentions = mentions.drop_columns(["group"])
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
