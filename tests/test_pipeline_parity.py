"""End-to-end parity: distributed pipeline vs single-process oracle
(SURVEY.md §5 test plan item b — the north-rule P/R gate, target exact)."""

from __future__ import annotations

import pyarrow.compute as pc
import pytest


@pytest.fixture(scope="module")
def built(ray_session, smoke_transcripts):
    import ray.data as rd

    from split_ner_ray import oracle
    from split_ner_ray.pipelines.kg import build_graph_datasets

    ds = rd.from_arrow(smoke_transcripts).repartition(8)
    triples, nodes, edges, mentions = build_graph_datasets(
        ds, concurrency=2, batch_size=256, window_turns=16
    )
    o_triples, o_nodes = oracle.build_graph(smoke_transcripts)
    return {
        "triples": triples.to_pandas(),
        "nodes": nodes.to_pandas(),
        "edges": edges.to_pandas(),
        "mentions": mentions.to_pandas(),
        "o_triples": o_triples.to_pandas(),
        "o_nodes": o_nodes.to_pandas(),
        "transcripts": smoke_transcripts,
    }


def _triple_keys(df):
    return set(zip(df["subj_id"], df["pred"], df["obj_id"]))


def test_triples_exact_parity(built):
    got = _triple_keys(built["triples"])
    want = _triple_keys(built["o_triples"])
    fp = got - want
    fn = want - got
    precision = len(got & want) / max(1, len(got))
    recall = len(got & want) / max(1, len(want))
    assert precision >= 0.95 and recall >= 0.95, (len(fp), len(fn))
    # target: exact
    assert not fp and not fn, (sorted(fp)[:3], sorted(fn)[:3])


def test_triples_full_rows_match(built):
    got = built["triples"].sort_values(["subj_id", "pred", "obj_id"]).reset_index(drop=True)
    want = built["o_triples"].to_dict("records")
    got_rows = got.to_dict("records")
    assert len(got_rows) == len(want)
    for g, w in zip(got_rows, want):
        assert g == w, (g, w)


def test_nodes_match(built):
    got = built["nodes"].sort_values("entity_id").reset_index(drop=True)
    want = built["o_nodes"].sort_values("entity_id").reset_index(drop=True)
    assert got.to_dict("records") == want.to_dict("records")


def test_mentions_text_equality_invariant(built):
    """Per-turn text equality: every mention's surface is exactly the char
    slice of its turn's text (the input_hint per-row invariant)."""
    text_by_key = {}
    t = built["transcripts"]
    for c, i, x in zip(
        t.column("conv_id").to_pylist(),
        t.column("turn_idx").to_pylist(),
        t.column("text").to_pylist(),
    ):
        text_by_key[(c, i)] = x
    m = built["mentions"]
    assert len(m) > 0
    for c, i, s, e, surf in zip(m["conv_id"], m["turn_idx"], m["start"], m["end"], m["surface"]):
        assert text_by_key[(c, i)][s:e] == surf


def test_edges_consistent_with_triples(built):
    tri = built["triples"]
    edg = built["edges"]
    assert edg["weight"].sum() == tri["support"].sum()
    assert len(edg) == len(tri.groupby(["subj_id", "obj_id", "pred"]))


def test_window_boundary_parity(ray_session, smoke_transcripts):
    """Different window sizes must give identical triples — the carry
    construction makes windowing semantically invisible."""
    import ray.data as rd

    from split_ner_ray.pipelines.kg import build_graph_datasets

    outs = []
    for w in (8, 1000):
        ds = rd.from_arrow(smoke_transcripts).repartition(4)
        triples, *_ = build_graph_datasets(ds, concurrency=2, batch_size=256, window_turns=w)
        df = triples.to_pandas().sort_values(["subj_id", "pred", "obj_id"]).reset_index(drop=True)
        outs.append(df)
    assert outs[0].to_dict("records") == outs[1].to_dict("records")
