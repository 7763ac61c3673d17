"""Config parsing + CLI job entry (op R6 and the ray-job-submit path)."""

from __future__ import annotations

import json
import os
import subprocess
import sys

import pyarrow.parquet as pq
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_config_roundtrip(tmp_path):
    from split_ner_ray.config import PipelineConfig

    cfg = PipelineConfig(input_path="/a", output_dir="/b", window_turns=32)
    p = tmp_path / "cfg.json"
    p.write_text(cfg.to_json())
    loaded = PipelineConfig.from_json(str(p))
    assert loaded == cfg
    assert PipelineConfig.from_json('{"max_tokens": 128}').max_tokens == 128


def test_config_rejects_unknown_keys():
    from split_ner_ray.config import PipelineConfig

    with pytest.raises(ValueError, match="unknown config keys"):
        PipelineConfig.from_json('{"max_seq_len": 512}')


def test_cli_build_job(tmp_path):
    """End-to-end CLI run in a fresh process (owns its own Ray session)."""
    from split_ner_ray.synth import gen_conv_range

    inp = tmp_path / "transcripts"
    inp.mkdir()
    for i, lo in enumerate(range(0, 20, 10)):
        pq.write_table(
            gen_conv_range(seed=7, lo=lo, hi=lo + 10, n_convs=20),
            str(inp / f"part-{i:05d}.parquet"),
        )
    out = tmp_path / "out"
    r = subprocess.run(
        [sys.executable, "-m", "split_ner_ray.cli", "build",
         "--input", str(inp), "--output", str(out), "--num-cpus", "4"],
        capture_output=True, text=True, cwd=REPO, timeout=300,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    summary = json.loads(r.stdout.strip().splitlines()[-1])
    assert summary["triples"] > 0 and summary["nodes"] > 0
    assert os.path.exists(out / "_SUCCESS")
    assert os.path.exists(out / "metrics.parquet")


def test_mention_embedder(ray_session):
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from split_ner_ray.stages.embed import embed_mentions, embed_surface

    df = pd.DataFrame({"surface": ["Acme Corp", "Acme Corporation", "Globex", "Acme Corp"]})
    out = embed_mentions(rd.from_pandas(df)).to_pandas()
    vecs = {s: np.array(v) for s, v in zip(out["surface"], out["embedding"])}
    # deterministic + unit-norm
    assert np.allclose(vecs["Acme Corp"], embed_surface("Acme Corp"))
    assert abs(np.linalg.norm(vecs["Globex"]) - 1.0) < 1e-5
    # near-identical surfaces are close; unrelated ones are not
    sim_close = float(vecs["Acme Corp"] @ vecs["Acme Corporation"])
    sim_far = float(vecs["Acme Corp"] @ vecs["Globex"])
    assert sim_close > 0.5 > sim_far


def test_config_value_validation():
    import pytest

    from split_ner_ray.config import PipelineConfig

    with pytest.raises(ValueError, match="detector_backend"):
        PipelineConfig(detector_backend="nope")
    with pytest.raises(ValueError, match="decode_mode"):
        PipelineConfig(decode_mode="majority")
    with pytest.raises(ValueError, match="link_sim_threshold"):
        PipelineConfig(link_sim_threshold=1.5)
    # all registry backends accepted
    for b in ("rules", "oracle", "hf"):
        PipelineConfig(detector_backend=b)


def test_cli_curate_and_compact(tmp_path):
    """Subprocess smoke of the new subcommands (own Ray session)."""
    import json

    env = dict(os.environ, RAY_GRAFT_CPUS="2")
    out1 = tmp_path / "curated"
    r = subprocess.run(
        [sys.executable, "-m", "split_ner_ray.cli", "curate",
         "--input", "/root/testdata/sf0.001/documents.parquet",
         "--output", str(out1), "--num-cpus", "2"],
        capture_output=True, text=True, cwd="/root/repo", env=env, timeout=180,
    )
    assert r.returncode == 0, r.stderr[-800:]
    summary = json.loads(r.stdout.strip().splitlines()[-1])
    assert summary["kept_docs"] > 0

    out2 = tmp_path / "compacted"
    r = subprocess.run(
        [sys.executable, "-m", "split_ner_ray.cli", "compact",
         "--input", str(out1), "--output", str(out2), "--num-cpus", "2"],
        capture_output=True, text=True, cwd="/root/repo", env=env, timeout=180,
    )
    assert r.returncode == 0, r.stderr[-800:]
    assert json.loads(r.stdout.strip().splitlines()[-1])["output_files"] >= 1


def test_cli_curate_resumable(tmp_path):
    """--resumable routes through curate_job: manifests + _SUCCESS."""
    import json

    env = dict(os.environ, RAY_GRAFT_CPUS="2")
    out = tmp_path / "curated_resumable"
    r = subprocess.run(
        [sys.executable, "-m", "split_ner_ray.cli", "curate",
         "--input", "/root/testdata/sf0.001/documents.parquet",
         "--output", str(out), "--resumable", "--files-per-group", "1",
         "--num-cpus", "2"],
        capture_output=True, text=True, cwd="/root/repo", env=env, timeout=300,
    )
    assert r.returncode == 0, r.stderr[-800:]
    summary = json.loads(r.stdout.strip().splitlines()[-1])
    assert summary["kept_docs"] > 0
    assert os.path.exists(out / "_SUCCESS")
    assert os.path.isdir(out / "_work" / "quality" / "_manifest")


def test_cli_index_lifecycle(tmp_path):
    """index build -> probe -> append -> compact end to end through the
    CLI (the incremental crawl loop's operational surface)."""
    import json

    import pandas as pd

    docs = pd.read_parquet("/root/testdata/sf0.001/documents.parquet",
                           columns=["doc_id", "text"])
    corpus = docs[docs["doc_id"] % 10 != 0]
    delta = docs[docs["doc_id"] % 10 == 0].copy()
    delta["doc_id"] += 1_000_000  # globally unique ids, duplicate texts
    cdir, ddir = tmp_path / "corpus", tmp_path / "delta"
    os.makedirs(cdir)
    os.makedirs(ddir)
    corpus.to_parquet(cdir / "part-0.parquet", index=False)
    delta.to_parquet(ddir / "part-0.parquet", index=False)

    env = dict(os.environ, RAY_GRAFT_CPUS="2")
    idx = str(tmp_path / "idx")

    def run(*a):
        r = subprocess.run(
            [sys.executable, "-m", "split_ner_ray.cli", "index", *a,
             "--index", idx, "--num-cpus", "2"],
            capture_output=True, text=True, cwd="/root/repo", env=env,
            timeout=300)
        assert r.returncode == 0, r.stderr[-800:]
        return json.loads(r.stdout.strip().splitlines()[-1])

    run("build", "--input", str(cdir))
    probe1 = run("probe", "--input", str(ddir),
                 "--output", str(tmp_path / "pairs1"))
    assert probe1["pairs"] > 0  # delta docs are copies of corpus docs
    run("append", "--input", str(ddir))
    probe2 = run("probe", "--input", str(ddir),
                 "--output", str(tmp_path / "pairs2"))
    # after appending the delta itself, each delta doc also matches its
    # own indexed copy's text under a different id
    assert probe2["pairs"] > probe1["pairs"]
    run("compact")
    probe3 = run("probe", "--input", str(ddir))
    assert probe3["pairs"] == probe2["pairs"]
