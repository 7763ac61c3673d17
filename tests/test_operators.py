"""Operator tests: joins, top-k, windows, CC, dedup family, ANN, span-F1."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest


@pytest.fixture(scope="module")
def rd(ray_session):
    import ray.data as rd

    return rd


def test_broadcast_join(rd):
    from split_ner_ray.stages.relational import broadcast_join

    big = rd.from_pandas(pd.DataFrame({"k": [1, 2, 3, 2], "v": [10, 20, 30, 40]}))
    small = pd.DataFrame({"k": [1, 2], "name": ["a", "b"]})
    out = broadcast_join(big, small, ["k"]).to_pandas().sort_values(["k", "v"]).reset_index(drop=True)
    assert out.to_dict("list") == {"k": [1, 2, 2], "v": [10, 20, 40], "name": ["a", "b", "b"]}


def test_partitioned_join_matches_pandas(rd):
    from split_ner_ray.stages.relational import partitioned_join

    lf = pd.DataFrame({"k": np.arange(100) % 7, "v": np.arange(100)})
    rf = pd.DataFrame({"k": np.arange(5), "w": np.arange(5) * 100})
    got = (
        partitioned_join(rd.from_pandas(lf).repartition(4), rd.from_pandas(rf), ["k"], num_buckets=8)
        .to_pandas()
        .sort_values(["k", "v"])
        .reset_index(drop=True)
    )
    want = lf.merge(rf, on="k").sort_values(["k", "v"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(got.astype({"k": "int64"}), want)


def test_topk(rd):
    from split_ner_ray.stages.relational import topk

    df = pd.DataFrame({"x": np.arange(1000)[::-1], "id": np.arange(1000)})
    got = topk(rd.from_pandas(df).repartition(8), [("x", True), ("id", False)], 5).to_pandas()
    assert got["x"].tolist() == [999, 998, 997, 996, 995]


def test_tumbling_and_session_windows(rd):
    from split_ner_ray.stages.windows import add_tumbling_window, sessionize

    ts = pd.to_datetime(
        ["2024-01-01 00:05", "2024-01-01 00:50", "2024-01-01 02:00", "2024-01-01 02:10"]
    )
    df = pd.DataFrame({"user_id": [1, 1, 1, 2], "ts": ts})
    w = add_tumbling_window(rd.from_pandas(df), period_s=3600).to_pandas()
    assert w["window_start"].dt.hour.tolist() == [0, 0, 2, 2]
    s = sessionize(rd.from_pandas(df), gap_s=1800).to_pandas().sort_values(["user_id", "session_idx"])
    # user 1: (00:05, 00:50) one session (45min gap=45>30 -> two sessions!)
    u1 = s[s["user_id"] == 1]
    assert len(u1) == 3  # 00:05 | 00:50 | 02:00 (gaps 45min, 70min)
    assert u1["n_events"].tolist() == [1, 1, 1]
    assert s[s["user_id"] == 2]["n_events"].tolist() == [1]


def test_connected_components(rd):
    from split_ner_ray.stages.graph import connected_components

    edges = pd.DataFrame({"src": [1, 2, 5, 10], "dst": [2, 3, 6, 11]})
    out = connected_components(rd.from_pandas(edges)).to_pandas()
    labels = dict(zip(out["node"], out["label"]))
    assert labels[1] == labels[2] == labels[3] == 1
    assert labels[5] == labels[6] == 5
    assert labels[10] == labels[11] == 10


def test_connected_components_chain(rd):
    """A long chain needs multiple propagation rounds."""
    from split_ner_ray.stages.graph import connected_components

    n = 20
    edges = pd.DataFrame({"src": list(range(n - 1)), "dst": list(range(1, n))})
    out = connected_components(rd.from_pandas(edges)).to_pandas()
    assert set(out["label"]) == {0}
    assert len(out) == n


def test_connected_components_distributed_path(rd):
    """Force the bucketed label-propagation path (small_graph_edges=0) and
    assert it matches the driver union-find fast path exactly."""
    from split_ner_ray.stages.graph import connected_components

    edges = pd.DataFrame(
        {"src": [0, 1, 2, 7, 8, 20, 3], "dst": [1, 2, 3, 8, 9, 21, 0]}
    )
    fast = connected_components(rd.from_pandas(edges)).to_pandas()
    dist = connected_components(
        rd.from_pandas(edges), small_graph_edges=0, num_buckets=4
    ).to_pandas()
    f = dict(zip(fast["node"], fast["label"]))
    d = dict(zip(dist["node"], dist["label"]))
    assert f == d
    assert d[3] == 0 and d[9] == 7 and d[21] == 20


def test_exact_dedup(rd):
    from split_ner_ray.stages.dedup import exact_dedup

    df = pd.DataFrame({"doc_id": [1, 2, 3, 4], "text": ["aa", "bb", "aa", "aa"]})
    out = exact_dedup(rd.from_pandas(df)).to_pandas().sort_values("keep_id")
    assert out["keep_id"].tolist() == [1, 2]
    assert out["n_dups"].tolist() == [3, 1]


def _dup_docs():
    base = "the quick brown fox jumps over the lazy dog again and again " * 3
    v1 = base
    v2 = base.replace("lazy", "sleepy", 1)  # near dup (one token differs)
    other = "completely different content about ray data pipelines and arrow " * 3
    return pd.DataFrame({"doc_id": [1, 2, 3], "text": [v1, v2, other]})


def test_minhash_clusters(rd):
    from split_ner_ray.stages.dedup import minhash_clusters, word_shingles

    df = _dup_docs()
    # ground truth: docs 1,2 have high shingle jaccard; doc 3 doesn't
    a, b = word_shingles(df.text[0]), word_shingles(df.text[1])
    assert len(a & b) / len(a | b) > 0.5
    out = minhash_clusters(rd.from_pandas(df), verify_threshold=0.5).to_pandas()
    labels = dict(zip(out["node"], out["label"]))
    assert labels.get(1) == labels.get(2) == 1
    assert 3 not in labels  # no near-dup edge -> not in any cluster


def test_simhash_pairs(rd):
    from split_ner_ray.stages.dedup import simhash_dup_pairs, simhash64

    df = _dup_docs()
    d = bin(simhash64(df.text[0]) ^ simhash64(df.text[1])).count("1")
    assert d <= 3  # near-dups are close in hamming space
    out = simhash_dup_pairs(rd.from_pandas(df), max_hamming=3).to_pandas()
    assert (1, 2) in set(zip(out["src"], out["dst"]))


def test_verify_jaccard(rd):
    from split_ner_ray.stages.dedup import (
        candidate_pairs_from_bands,
        minhash_band_rows,
        minhash_signatures,
        verify_jaccard_pairs,
    )

    df = _dup_docs()
    docs = rd.from_pandas(df)
    sigs = minhash_signatures(docs).materialize()
    pairs = candidate_pairs_from_bands(minhash_band_rows(sigs), sigs, verify_threshold=0.3)
    verified = verify_jaccard_pairs(pairs, docs, threshold=0.5).to_pandas()
    assert set(zip(verified["src"], verified["dst"])) == {(1, 2)}
    assert (verified["jaccard"] > 0.5).all()


def test_cosine_dup_pairs(rd):
    from split_ner_ray.stages.dedup import cosine_dup_pairs

    rng = np.random.RandomState(0)
    base = rng.randn(64)
    vecs = [base, base + rng.randn(64) * 0.01, rng.randn(64)]
    df = pd.DataFrame({"vec_id": [0, 1, 2], "embedding": [list(v) for v in vecs]})
    # brute force is the exact recall oracle; LSH bucketing is the default
    out = cosine_dup_pairs(rd.from_pandas(df), threshold=0.95, lsh=False).to_pandas()
    assert set(zip(out["src"], out["dst"])) == {(0, 1)}
    out_lsh = cosine_dup_pairs(rd.from_pandas(df), threshold=0.95).to_pandas()
    assert set(zip(out_lsh["src"], out_lsh["dst"])) == {(0, 1)}


@pytest.fixture(scope="module")
def emb(rd):
    import ray.data as r

    return r.read_parquet("/root/testdata/sf0.001/embeddings.parquet")


def test_ann_brute_vs_numpy(emb):
    import pyarrow.parquet as pq

    from split_ner_ray.stages.ann import brute_topk, load_queries

    qids, qmat = load_queries(emb, [0, 1, 2])
    got = brute_topk(emb, qids, qmat, k=5).to_pandas().sort_values(["qid", "rank"])

    t = pq.read_table("/root/testdata/sf0.001/embeddings.parquet").to_pandas()
    mat = np.array(t["embedding"].tolist(), dtype=np.float64)
    mat = mat / np.linalg.norm(mat, axis=1)[:, None]
    ids = t["vec_id"].to_numpy()
    for q in (0, 1, 2):
        sims = mat @ mat[list(ids).index(q)]
        order = sorted(zip(-sims, ids))
        want = [int(i) for _, i in order if i != q][:5]
        assert got[got["qid"] == q]["vid"].tolist() == want


def test_ann_ivf_recall(emb):
    from split_ner_ray.stages.ann import brute_topk, ivf_topk, load_queries

    qids, qmat = load_queries(emb, [0, 1, 2, 3])
    brute = brute_topk(emb, qids, qmat, k=5).to_pandas()
    ivf = ivf_topk(emb, qids, qmat, k=5, num_centroids=8, nprobe=4).to_pandas()
    recalls = []
    for q in (0, 1, 2, 3):
        b = set(brute[brute["qid"] == q]["vid"])
        i = set(ivf[ivf["qid"] == q]["vid"])
        recalls.append(len(b & i) / len(b))
    assert np.mean(recalls) >= 0.5  # nprobe=4 of 8 buckets


def test_span_f1_matches_reference_semantics(rd):
    """Micro/macro F1 on a hand-checked case, mirroring analysis.py:32-91."""
    from split_ner_ray.evaluate import span_f1_dataset

    rows = [
        {  # one TP (person), one FN (org), one FP (loc)
            "gold_tags": ["B-per", "I-per", "O", "B-org"],
            "pred_tags": ["B-per", "I-per", "B-loc", "O"],
        },
        {  # typed continuation: pred I-per mismatch -> no span from it, and
           # the truncated pred (org,0,0) != gold (org,0,1) -> FP + FN
            "gold_tags": ["B-org", "I-org", "O"],
            "pred_tags": ["B-org", "I-per", "O"],
        },
    ]
    res = span_f1_dataset(rd.from_items(rows))
    m = res["micro"]
    assert (m["tp"], m["fp"], m["fn"]) == (1, 2, 2)
    assert abs(m["precision"] - 1 / 3) < 1e-6
    assert abs(m["recall"] - 1 / 3) < 1e-6


def test_tsv_roundtrip(rd, tmp_path, smoke_transcripts):
    from split_ner_ray.sources.tsv import read_tsv_corpus, write_bioe_fixture

    path = str(tmp_path / "fixture.tsv")
    n = write_bioe_fixture(smoke_transcripts.slice(0, 200), path)
    corpus = read_tsv_corpus(path)
    rows = corpus.take_all()
    assert len(rows) == n
    # every non-O tag decodes into a span of a known etype
    from split_ner_ray.evaluate import decode_typed_spans

    etypes = set()
    for r in rows:
        for et, _s, _e in decode_typed_spans(r["tags"]):
            etypes.add(et)
    assert etypes <= {"person", "organization", "location", "product", "id", "tool"}
    assert len(etypes) >= 3


def test_minhash_verify_join_path_matches_broadcast(rd):
    """Force the partitioned-join verification path (broadcast_sigs_limit=0)
    and assert it produces exactly the broadcast path's pairs."""
    from split_ner_ray.stages.dedup import (
        candidate_pairs_from_bands,
        minhash_band_rows,
        minhash_signatures,
    )

    docs = rd.from_pandas(_dup_docs())
    sigs = minhash_signatures(docs).materialize()
    bands = minhash_band_rows(sigs)
    a = candidate_pairs_from_bands(bands, sigs, verify_threshold=0.3).to_pandas()
    b = candidate_pairs_from_bands(
        minhash_band_rows(sigs), sigs, verify_threshold=0.3,
        broadcast_sigs_limit=0,
    ).to_pandas()
    assert set(zip(a["src"], a["dst"])) == set(zip(b["src"], b["dst"])) == {(1, 2)}


def test_ivf_disk_index_partition_pruning(emb, tmp_path):
    """ivf_build_index writes one parquet dir per inverted list;
    ivf_search_index reads only probed dirs and matches the in-memory IVF
    (and brute recall) on the same queries."""
    import os

    from split_ner_ray.stages.ann import (
        brute_topk,
        ivf_build_index,
        ivf_search_index,
        load_queries,
    )

    idx = str(tmp_path / "ivf_index")
    cents = ivf_build_index(emb, idx, num_centroids=8)
    assert cents.shape[0] == 8
    bucket_dirs = [d for d in os.listdir(idx) if d.startswith("bucket=")]
    assert len(bucket_dirs) >= 2  # real partitioned layout on disk

    qids, qmat = load_queries(emb, [0, 1, 2, 3])
    got = (
        ivf_search_index(idx, qids, qmat, k=5, nprobe=4)
        .to_pandas()
        .sort_values(["qid", "rank"])
        .reset_index(drop=True)
    )
    brute = (
        brute_topk(emb, qids, qmat, k=5)
        .to_pandas()
        .sort_values(["qid", "rank"])
        .reset_index(drop=True)
    )
    # recall@5 vs exact with nprobe=4 of 8 lists
    recall = len(
        set(zip(got["qid"], got["vid"])) & set(zip(brute["qid"], brute["vid"]))
    ) / len(brute)
    assert recall >= 0.6
    assert (got.groupby("qid")["rank"].max() == 5).all()
