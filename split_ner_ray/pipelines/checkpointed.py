"""Checkpointed, resumable KG-construction job (north rule contract).

Two phases:

  A. extract  — per commit-group (a chunk of input parquet fragments,
     disjoint in conv_id because the input layout shards by conversation —
     documented partitioning assumption, SURVEY.md §4): read -> detect ->
     classify -> windowed triple extraction; write mentions/ and
     raw_triples/ parquet under group dirs; commit a manifest per group.
     Killed mid-run => committed groups are skipped on restart.

  B. graph    — global: linking blocks, canonicalization, id assignment,
     dedup, nodes/edges; reads phase-A parquet (so phase B never re-runs
     extraction), writes triples/ nodes/ edges/ + metrics.parquet and a
     final _SUCCESS marker.

Phase B is deterministic in the *set* of phase-A rows (all its reductions
are order-insensitive: min-provenance, counts, per-block union-find with
min-root), so a resumed run produces byte-identical final triples — the
FIXTURES.md F5 kill/resume assertion.
"""

from __future__ import annotations

import os
import time

import pyarrow as pa
import pyarrow.parquet as pq

import ray
import ray.data as rd

from ..schemas import METRICS
from ..stages import extract as ex
from ..stages import linking as lk
from ..state import manifest as mf
from .kg import EXTRACT_COLS


class _MetricsLog:
    """Driver-side lineage/metrics rows (FIXTURES.md F6) — appended per
    stage per partition and written with the outputs."""

    def __init__(self):
        self.rows: list[dict] = []

    def add(self, stage: str, partition: int, rows_in: int, rows_out: int,
            wall_s: float, fragments: list[str]):
        self.rows.append(
            {
                "stage": stage,
                "partition": partition,
                "rows_in": rows_in,
                "rows_out": rows_out,
                "wall_s": wall_s,
                "input_fragments": fragments,
            }
        )

    def table(self) -> pa.Table:
        cols = {n: [r[n] for r in self.rows] for n in METRICS.names}
        return pa.Table.from_pydict(cols, schema=METRICS)


def _input_rows(files: list[str]) -> int:
    return sum(pq.read_metadata(f).num_rows for f in files)


def run_extract_phase(
    input_path: str,
    work_dir: str,
    *,
    files_per_group: int = 4,
    concurrency=None,
    batch_size: int = 1024,
    window_turns: int = ex.WINDOW_TURNS,
    max_tokens: int | None = None,
    scorer: str = "rules",
    decode_mode: str = "first_wins",
    context_mode: str = "recency",
    metrics: _MetricsLog | None = None,
    stop_after_groups: int | None = None,
) -> list[int]:
    """Run phase A for every uncommitted group; returns committed group ids.

    ``stop_after_groups`` injects a mid-job kill for the resume test.
    """
    metrics = metrics or _MetricsLog()
    groups = mf.plan_groups(input_path, files_per_group)
    done = mf.committed_groups(work_dir)
    ran = 0
    for g in groups:
        gid = g["group_id"]
        if gid in done:
            continue
        if stop_after_groups is not None and ran >= stop_after_groups:
            break
        t0 = time.time()
        ds = rd.read_parquet(g["files"], columns=EXTRACT_COLS)
        combined = ex.extract_combined(
            ds, concurrency=concurrency, batch_size=batch_size,
            window_turns=window_turns, scorer=scorer, decode_mode=decode_mode,
            context_mode=context_mode,
            max_tokens=max_tokens or ex.rules.MAX_TOKENS_DEFAULT,
        ).materialize()
        mentions = ex.mentions_from_combined(combined).materialize()
        raw = ex.triples_from_combined(combined).materialize()

        m_dir = os.path.join(work_dir, "mentions", f"group={gid:05d}")
        t_dir = os.path.join(work_dir, "raw_triples", f"group={gid:05d}")
        # Idempotent re-run: a kill between the data write and commit_group
        # leaves orphan UUID-named files in the group dirs; write_parquet
        # appends rather than replaces, so a resume would double-count them.
        # Deleting the (uncommitted) group dirs first makes the data write
        # atomic with the manifest commit.
        import shutil

        shutil.rmtree(m_dir, ignore_errors=True)
        shutil.rmtree(t_dir, ignore_errors=True)
        mentions.write_parquet(m_dir)
        raw.write_parquet(t_dir)
        n_in = _input_rows(g["files"])
        n_m, n_t = mentions.count(), raw.count()
        wall = time.time() - t0
        metrics.add("extract", gid, n_in, n_m + n_t, wall, g["files"])
        mf.commit_group(
            work_dir,
            gid,
            {
                "group_id": gid,
                "input_fragments": g["files"],
                "rows_in": n_in,
                "mentions": n_m,
                "raw_triples": n_t,
                "wall_s": wall,
            },
        )
        ran += 1
    return sorted(mf.committed_groups(work_dir))


def run_graph_phase(
    work_dir: str,
    out_dir: str,
    *,
    concurrency=None,
    link_sim_threshold: float | None = None,
    metrics: _MetricsLog | None = None,
):
    """Phase B: global linking/canonicalization/dedup over phase-A output.

    Same scale discipline as pipelines/kg.py: the occurrence table stays a
    distributed Dataset; only the distinct linkable (etype, norm) keys reach
    the driver, and nodes are built distributed from occ."""
    metrics = metrics or _MetricsLog()
    t0 = time.time()
    mentions = rd.read_parquet(os.path.join(work_dir, "mentions"))
    raw = rd.read_parquet(os.path.join(work_dir, "raw_triples"))

    occ = lk.aggregate_occ(lk.occ_partials_from_tables(mentions, raw)).materialize()
    canon_tbl = lk.canonicalize_linkable(occ, threshold=link_sim_threshold)
    canon_ref = ray.put(canon_tbl)
    metrics.add("link_canon", -1, canon_tbl.num_rows, canon_tbl.num_rows,
                time.time() - t0, [])

    t0 = time.time()
    with_ids = lk.assign_entity_ids(raw, canon_ref, concurrency=concurrency)
    triples = lk.dedup_triples(with_ids).materialize()
    triples.write_parquet(os.path.join(out_dir, "triples"))
    metrics.add("dedup_triples", -1, raw.count(), triples.count(), time.time() - t0, [])

    t0 = time.time()
    nodes = lk.build_nodes_from_occ(occ, canon_ref).materialize()
    nodes.write_parquet(os.path.join(out_dir, "nodes"))
    edges = lk.build_edges(triples).materialize()
    edges.write_parquet(os.path.join(out_dir, "edges"))
    metrics.add("nodes_edges", -1, triples.count(), nodes.count() + edges.count(),
                time.time() - t0, [])
    return triples, nodes, edges


def build_graph_job(
    input_path: str,
    out_dir: str,
    *,
    files_per_group: int = 4,
    concurrency=None,
    batch_size: int = 1024,
    window_turns: int = ex.WINDOW_TURNS,
    max_tokens: int | None = None,
    scorer: str = "rules",
    decode_mode: str = "first_wins",
    context_mode: str = "recency",
    link_sim_threshold: float | None = None,
    stop_after_groups: int | None = None,
):
    """Full resumable job (the `ray job submit` entry — cli.py). Safe to
    re-invoke after a kill: phase A skips committed groups; phase B and the
    final metrics/_SUCCESS are rewritten idempotently."""
    metrics = _MetricsLog()
    work_dir = os.path.join(out_dir, "_work")
    run_extract_phase(
        input_path,
        work_dir,
        files_per_group=files_per_group,
        concurrency=concurrency,
        batch_size=batch_size,
        window_turns=window_turns,
        max_tokens=max_tokens,
        scorer=scorer,
        decode_mode=decode_mode,
        context_mode=context_mode,
        metrics=metrics,
        stop_after_groups=stop_after_groups,
    )
    if stop_after_groups is not None:
        return None  # simulated kill: job "died" before phase B
    total = len(mf.plan_groups(input_path, files_per_group))
    have = len(mf.committed_groups(work_dir))
    if have < total:
        raise RuntimeError(f"extract incomplete: {have}/{total} groups committed")
    triples, nodes, edges = run_graph_phase(
        work_dir, out_dir, concurrency=concurrency,
        link_sim_threshold=link_sim_threshold, metrics=metrics,
    )
    pq.write_table(metrics.table(), os.path.join(out_dir, "metrics.parquet"))
    with open(os.path.join(out_dir, "_SUCCESS"), "w") as f:
        f.write("ok")
    return {"triples": triples, "nodes": nodes, "edges": edges}
