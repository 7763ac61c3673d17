"""Kill/resume test (FIXTURES.md F5): a job killed after K committed
partitions, then resumed, produces byte-identical final triples."""

from __future__ import annotations

import os

import pandas as pd
import pyarrow.parquet as pq
import pytest


@pytest.fixture(scope="module")
def transcripts_dir(tmp_path_factory, smoke_transcripts):
    """Write smoke transcripts as a sharded parquet dir (conv-disjoint
    shards — the documented input layout assumption)."""
    import pyarrow as pa

    from split_ner_ray.synth import gen_conv_range

    d = tmp_path_factory.mktemp("transcripts")
    for i, lo in enumerate(range(0, 50, 10)):
        tbl = gen_conv_range(seed=42, lo=lo, hi=lo + 10, n_convs=50)
        pq.write_table(tbl, os.path.join(str(d), f"part-{i:05d}.parquet"))
    return str(d)


def _read_sorted(path: str) -> pd.DataFrame:
    df = pq.read_table(path).to_pandas()
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def test_kill_and_resume_identical_triples(ray_session, transcripts_dir, tmp_path):
    from split_ner_ray.pipelines.checkpointed import build_graph_job
    from split_ner_ray.state import manifest as mf

    uninterrupted = str(tmp_path / "out_a")
    resumed = str(tmp_path / "out_b")

    build_graph_job(transcripts_dir, uninterrupted, files_per_group=1,
                    concurrency=2, batch_size=256)

    # killed run: only 2 of 5 groups commit, no phase B
    r = build_graph_job(transcripts_dir, resumed, files_per_group=1,
                        concurrency=2, batch_size=256, stop_after_groups=2)
    assert r is None
    committed = mf.committed_groups(os.path.join(resumed, "_work"))
    assert len(committed) == 2  # manifests exist for exactly the committed groups
    assert not os.path.exists(os.path.join(resumed, "_SUCCESS"))

    # resume: remaining groups run, phase B completes
    build_graph_job(transcripts_dir, resumed, files_per_group=1,
                    concurrency=2, batch_size=256)
    assert os.path.exists(os.path.join(resumed, "_SUCCESS"))
    assert len(mf.committed_groups(os.path.join(resumed, "_work"))) == 5

    for table in ("triples", "nodes", "edges"):
        a = _read_sorted(os.path.join(uninterrupted, table))
        b = _read_sorted(os.path.join(resumed, table))
        pd.testing.assert_frame_equal(a, b)


def test_metrics_lineage_rows(ray_session, transcripts_dir, tmp_path):
    from split_ner_ray.pipelines.checkpointed import build_graph_job

    out = str(tmp_path / "out")
    build_graph_job(transcripts_dir, out, files_per_group=2, concurrency=2, batch_size=256)
    m = pq.read_table(os.path.join(out, "metrics.parquet")).to_pandas()
    # every stage present, non-empty, with wall time and row counts
    assert set(m["stage"]) == {"extract", "link_canon", "dedup_triples", "nodes_edges"}
    extract = m[m["stage"] == "extract"]
    assert len(extract) == 3  # 5 files in groups of 2
    assert (extract["rows_in"] > 0).all()
    assert (m["wall_s"] >= 0).all()
    frags = [f for row in extract["input_fragments"] for f in row]
    assert len(frags) == 5 and all(f.endswith(".parquet") for f in frags)


def test_job_matches_in_memory_pipeline(ray_session, transcripts_dir, tmp_path, smoke_transcripts):
    """Checkpointed job == pure in-memory pipeline == oracle."""
    import ray.data as rd

    from split_ner_ray import oracle
    from split_ner_ray.pipelines.checkpointed import build_graph_job

    out = str(tmp_path / "out")
    build_graph_job(transcripts_dir, out, files_per_group=2, concurrency=2, batch_size=256)
    got = _read_sorted(os.path.join(out, "triples"))
    o_triples, _ = oracle.build_graph(smoke_transcripts)
    want = o_triples.to_pandas().sort_values(list(o_triples.schema.names)).reset_index(drop=True)
    pd.testing.assert_frame_equal(got[want.columns], want)


def test_crash_between_write_and_commit_is_idempotent(ray_session, transcripts_dir, tmp_path):
    """ADVICE item: a kill AFTER a group's parquet write but BEFORE its
    manifest commit must not double-count the group's rows on resume
    (write_parquet appends UUID-named files; the re-run deletes the
    uncommitted group dirs first)."""
    import pyarrow as pa

    from split_ner_ray.pipelines.checkpointed import build_graph_job
    from split_ner_ray.state import manifest as mf

    clean = str(tmp_path / "clean")
    crashed = str(tmp_path / "crashed")
    build_graph_job(transcripts_dir, clean, files_per_group=1,
                    concurrency=2, batch_size=256)

    # run 2 groups, then simulate the torn state: orphan data files exist
    # for group 2 (written) but its manifest commit never happened
    r = build_graph_job(transcripts_dir, crashed, files_per_group=1,
                        concurrency=2, batch_size=256, stop_after_groups=2)
    assert r is None
    work = os.path.join(crashed, "_work")
    committed = sorted(mf.committed_groups(work))
    victim = committed[-1]
    # steal group `victim`'s data dirs as the orphan of an uncommitted run:
    # delete its manifest so the group re-runs with stale files on disk
    manifest_path = os.path.join(work, "_manifest", f"part-{victim:05d}.json")
    assert os.path.exists(manifest_path)
    os.remove(manifest_path)

    build_graph_job(transcripts_dir, crashed, files_per_group=1,
                    concurrency=2, batch_size=256)
    for table in ("triples", "nodes", "edges"):
        a = _read_sorted(os.path.join(clean, table))
        b = _read_sorted(os.path.join(crashed, table))
        pd.testing.assert_frame_equal(a, b)
    # support counts not inflated: mentions dir for the victim group holds
    # exactly one run's worth of rows
    m_clean = pq.read_table(os.path.join(clean, "_work", "mentions",
                                         f"group={victim:05d}")).num_rows
    m_crash = pq.read_table(os.path.join(crashed, "_work", "mentions",
                                         f"group={victim:05d}")).num_rows
    assert m_clean == m_crash


@pytest.fixture(scope="module")
def docs_dir(tmp_path_factory):
    """sf0.001 documents re-sharded into 5 parquet fragments."""
    d = tmp_path_factory.mktemp("docs_shards")
    tbl = pq.read_table("/root/testdata/sf0.001/documents.parquet")
    n = tbl.num_rows
    step = (n + 4) // 5
    for i in range(5):
        pq.write_table(tbl.slice(i * step, step),
                       os.path.join(str(d), f"part-{i:05d}.parquet"))
    return str(d)


def test_curate_job_kill_and_resume_identical(ray_session, docs_dir, tmp_path):
    """VERDICT r3 item 7: curation under the manifest/commit protocol —
    a kill after K committed quality groups AND a torn write-without-
    commit group both resume to row-identical curated output."""
    from split_ner_ray.pipelines.curate import curate_job
    from split_ner_ray.state import manifest as mf

    clean = str(tmp_path / "clean")
    crashed = str(tmp_path / "crashed")
    curate_job(docs_dir, clean, files_per_group=1)
    assert os.path.exists(os.path.join(clean, "_SUCCESS"))

    r = curate_job(docs_dir, crashed, files_per_group=1, stop_after_groups=2)
    assert r is None
    work = os.path.join(crashed, "_work", "quality")
    committed = sorted(mf.committed_groups(work))
    assert len(committed) == 2
    assert not os.path.exists(os.path.join(crashed, "_SUCCESS"))
    # torn state: victim group's parquet stays on disk, manifest deleted
    victim = committed[-1]
    os.remove(os.path.join(work, "_manifest", f"part-{victim:05d}.json"))

    curate_job(docs_dir, crashed, files_per_group=1)
    assert os.path.exists(os.path.join(crashed, "_SUCCESS"))
    assert len(mf.committed_groups(work)) == 5
    a = _read_sorted(os.path.join(clean, "curated"))
    b = _read_sorted(os.path.join(crashed, "curated"))
    pd.testing.assert_frame_equal(a, b)
    assert len(a) > 0
    # the torn group was rewritten, not appended to
    v_clean = pq.read_table(os.path.join(clean, "_work", "quality",
                                         f"group={victim:05d}")).num_rows
    v_crash = pq.read_table(os.path.join(crashed, "_work", "quality",
                                         f"group={victim:05d}")).num_rows
    assert v_clean == v_crash


def test_auto_route_threshold_byte_identical(ray_session, transcripts_dir, tmp_path):
    """build_graph_datasets auto-routes a pure read over the in-memory
    size threshold to the checkpointed job; triples/nodes/edges are
    byte-identical across both routes, and a transformed dataset never
    routes (the pure-read guard)."""
    import ray.data as rd

    from split_ner_ray.pipelines.kg import (EXTRACT_COLS,
                                            _pure_read_files,
                                            build_graph_datasets)

    def _df(ds, sort_cols):
        df = ds.to_pandas()
        return (df.sort_values(sort_cols).reset_index(drop=True)
                .astype({c: "int64" for c in df.columns
                         if str(df[c].dtype).startswith("int")}))

    read = lambda: rd.read_parquet(transcripts_dir, columns=EXTRACT_COLS)
    # in-memory route (default threshold far above this corpus)
    t_a, n_a, e_a, m_a = build_graph_datasets(read(), concurrency=2,
                                              batch_size=256)
    # forced job route (threshold 0 on the same pure read)
    t_b, n_b, e_b, m_b = build_graph_datasets(
        read(), concurrency=2, batch_size=256, inmem_limit_bytes=0,
        checkpoint_dir=str(tmp_path / "job"))
    assert os.path.exists(str(tmp_path / "job" / "_SUCCESS"))

    for a, b, cols in [(t_a, t_b, ["subj_id", "pred", "obj_id"]),
                       (n_a, n_b, ["entity_id"]),
                       (e_a, e_b, ["src_id", "dst_id", "pred"])]:
        da, db = _df(a, cols), _df(b, cols)
        pd.testing.assert_frame_equal(da, db[da.columns])
    assert m_a.count() == m_b.count()
    # one mentions schema across routes (the job route must drop the
    # hive 'group' partition column its work-dir layout adds on read)
    assert sorted(m_b.schema().names) == sorted(m_a.schema().names)

    # guard: a transformed dataset is not path-routable
    assert _pure_read_files(read().map_batches(lambda x: x)) == []
    assert len(_pure_read_files(read())) == 5


def test_auto_route_driver_lock(ray_session, transcripts_dir, tmp_path):
    """A second driver on the same un-built job dir raises while the
    holder is alive, and a stale (dead-pid) lock is reclaimed."""
    import pytest as _pytest

    import ray.data as rd

    from split_ner_ray.pipelines.kg import EXTRACT_COLS, build_graph_datasets

    job = tmp_path / "job_locked"
    os.makedirs(job)
    with open(job / "_driver.lock", "w") as f:
        f.write(str(os.getpid()))  # a live pid (ours) holds the lock
    read = lambda: rd.read_parquet(transcripts_dir, columns=EXTRACT_COLS)
    with _pytest.raises(RuntimeError, match="live pid"):
        build_graph_datasets(read(), concurrency=2, batch_size=256,
                             inmem_limit_bytes=0, checkpoint_dir=str(job))
    # stale lock: dead pid is reclaimed and the build proceeds
    with open(job / "_driver.lock", "w") as f:
        f.write("999999999")
    t, n, e, m = build_graph_datasets(read(), concurrency=2, batch_size=256,
                                      inmem_limit_bytes=0,
                                      checkpoint_dir=str(job))
    assert os.path.exists(job / "_SUCCESS")
    assert not os.path.exists(job / "_driver.lock")
    assert t.count() > 0
