"""Round-2 operators: consistency-voting decode (mapping2), scorer-backend
registry, embedding-similarity linking, pattern mining, standoff corpus
converter."""

from __future__ import annotations

import pandas as pd
import pytest


# ---------------------------------------------------------------------------
# mapping2 consistency-voting decode (main_qa.py:165-214)
# ---------------------------------------------------------------------------

def test_mapping2_consistent_assignment():
    from split_ner_ray.functions.decode import consistency_vote_assign

    # hand-executed reference semantics: head sub-token B, continuation I
    # -> token keeps B-person; single-sub-token I -> I-person; O head -> O
    tags = consistency_vote_assign(
        3, [("person", [["B", "I"], ["I"], ["O"]])]
    )
    assert tags == ["B-person", "I-person", "O"]


def test_mapping2_inconsistent_resets_to_o():
    from split_ner_ray.functions.decode import consistency_vote_assign

    # head says B but a continuation sub-token disagrees (O) -> reset to O
    tags = consistency_vote_assign(2, [("person", [["B", "O"], ["B"]])])
    assert tags == ["O", "B-person"]
    # disagreement via a B continuation also resets
    assert consistency_vote_assign(1, [("org", [["B", "B"]])]) == ["O"]
    # E continuations are consistent
    assert consistency_vote_assign(1, [("org", [["B", "I", "E"]])]) == ["B-org"]


def test_mapping2_cross_entity_first_wins():
    from split_ner_ray.functions.decode import consistency_vote_assign

    # token tagged by the first context's entity is not overwritten by a
    # later context (main_qa.py:185-187), but a later context CAN fill a
    # slot the first left O
    tags = consistency_vote_assign(
        2,
        [
            ("person", [["B"], ["O"]]),
            ("org", [["B"], ["B"]]),
        ],
    )
    assert tags == ["B-person", "B-org"]


def test_mapping2_degenerates_to_first_wins_on_atomic_tokens():
    from split_ner_ray.functions.decode import (
        consistency_vote_assign,
        first_wins_assign,
    )

    # single-sub-token tokenizer: both variants agree (the rules backend)
    fw = first_wins_assign(4, [(0, 1, "person"), (2, 3, "org")])
    cv = consistency_vote_assign(
        4,
        [
            ("person", [["B"], ["I"], ["O"], ["O"]]),
            ("org", [["O"], ["O"], ["B"], ["I"]]),
        ],
    )
    assert fw == cv == ["B-person", "I-person", "B-org", "I-org"]


# ---------------------------------------------------------------------------
# scorer-backend registry (stages/detect.py; model_mode main_qa.py:238-250)
# ---------------------------------------------------------------------------

def test_backend_registry_names_and_errors():
    from split_ner_ray.stages.detect import BACKENDS, make_backend

    assert set(BACKENDS) == {"rules", "oracle", "hf"}
    with pytest.raises(ValueError, match="unknown scorer backend"):
        make_backend("nope")
    with pytest.raises(ImportError, match="torch"):
        make_backend("hf")  # loud import gate, no silent fake


def test_rules_and_oracle_backends_agree():
    from split_ner_ray.stages.detect import make_backend

    texts = [
        "Alice Johnson works at Acme Corp .",
        "Deployed HyperDrive X1 in Springfield with CVE-2015-8431 .",
        "nothing here",
    ]
    a = make_backend("rules").score_batch(texts)
    b = make_backend("oracle").score_batch(texts)
    assert a == b
    assert a[0][0].etype == "person" and a[0][1].etype == "organization"


def test_pipeline_backend_agnostic(ray_session, smoke_transcripts):
    """detect_and_classify output is identical under both local backends
    and both execution shapes."""
    import ray.data as rd

    from split_ner_ray.stages.extract import detect_and_classify, flatten_mentions

    ds = rd.from_arrow(smoke_transcripts.slice(0, 200))

    def run(**kw):
        return (
            flatten_mentions(detect_and_classify(ds, **kw))
            .to_pandas()
            .sort_values(["conv_id", "turn_idx", "start"])
            .reset_index(drop=True)
        )

    base = run(scorer="rules")
    assert len(base) > 0
    pd.testing.assert_frame_equal(base, run(scorer="oracle"))
    pd.testing.assert_frame_equal(base, run(scorer="oracle", backend="actors", concurrency=2))


# ---------------------------------------------------------------------------
# embedding-similarity linking (north rule: blocking + embedding similarity)
# ---------------------------------------------------------------------------

def test_embedding_channel_links_pair_containment_misses():
    from split_ner_ray.rules import (
        EMB_SIM_THRESHOLD,
        LINK_SIM_THRESHOLD,
        char_ngrams,
        cluster_block,
        containment_sim,
    )
    from split_ner_ray.stages.embed import embed_surface

    a, b = "springfield", "sprincfield"  # same block ('location|sp')
    cont = containment_sim(char_ngrams(a), char_ngrams(b))
    cos = float(embed_surface(a) @ embed_surface(b))
    assert cont < LINK_SIM_THRESHOLD  # the n-gram containment rule misses
    assert cos >= EMB_SIM_THRESHOLD  # the embedding channel catches it

    canon = cluster_block([("location", a), ("location", b)])
    assert canon[("location", a)] == canon[("location", b)]
    # with the embedding channel disabled the pair stays split
    canon_off = cluster_block([("location", a), ("location", b)], None, 1.1)
    assert canon_off[("location", a)] != canon_off[("location", b)]


def test_embedding_channel_never_crosses_etypes():
    from split_ner_ray.rules import cluster_block

    canon = cluster_block([("location", "springfield"), ("organization", "springfield")])
    assert canon[("location", "springfield")] == "springfield"
    assert canon[("organization", "springfield")] == "springfield"


# ---------------------------------------------------------------------------
# pattern mining (S9 proper; pattern_analysis.py:19-97)
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def mining_docs(ray_session):
    import ray.data as rd

    rows = (
        ["Alice Johnson works at Acme Corp ."] * 6
        + ["Bob Smith works at Globex ."] * 6
        + ["just filler text with no entities"] * 4
    )
    return rd.from_pandas(pd.DataFrame({"doc_id": range(len(rows)), "text": rows}))


def test_intrinsic_pattern_tags(mining_docs):
    from split_ner_ray.stages.mining import intrinsic_pattern_tags

    out = intrinsic_pattern_tags(mining_docs, min_support=5).to_pandas()
    # 'Alice'/'Bob' etc -> pattern 'ul+' dominated by person; plain
    # lowercase filler-only patterns with only-O distributions are dropped
    got = {(p, t) for p, t in zip(out["pattern"], out["tag"])}
    # 'Alice' -> type-0 pattern 'ullll', dominated by person mentions
    assert ("ullll", "person") in got
    # O-only patterns (pure filler tokens) are dropped per the reference
    o_only = {p for p, t in got if t == "O"} - {p for p, t in got if t != "O"}
    assert not o_only


def test_extrinsic_patterns_vs_python_oracle(mining_docs):
    from split_ner_ray.stages.mining import extrinsic_patterns

    out = extrinsic_patterns(
        mining_docs, max_before=1, max_after=2, min_support=6
    ).to_pandas()
    got = dict(zip(out["pattern"], out["n"]))
    # 'person works at organization' shape appears in all 12 entity turns:
    # anchor=person window (b=1,a=2) -> 'person works'
    assert got.get("person works") == 12
    assert all(n >= 6 for n in got.values())


def test_mine_predicate_patterns_and_extend(mining_docs):
    from split_ner_ray.stages.mining import (
        extend_pred_patterns,
        mine_predicate_patterns,
    )

    out = mine_predicate_patterns(mining_docs).to_pandas()
    row = out[(out["gap"] == "works at")]
    assert len(row) == 1 and int(row["n"].iloc[0]) == 12
    assert row["subj_etype"].iloc[0] == "person"
    assert row["obj_etype"].iloc[0] == "organization"
    # 'works at' is already a known predicate -> not re-proposed
    assert "works at" not in extend_pred_patterns(out, min_support=2)

    mined = pd.DataFrame({"gap": ["reported to", "works at"], "n": [15, 12]})
    ext = extend_pred_patterns(mined, min_support=10)
    assert ext == {"reported to": "reported_to"}


# ---------------------------------------------------------------------------
# standoff corpus converter (R5; generate_bio.py:31-84)
# ---------------------------------------------------------------------------

def test_align_char_spans_reference_semantics():
    from split_ner_ray.sources.convert import align_char_spans

    text = "Alice Johnson lives in Springfield."
    anns = [("person", 0, 13), ("location", 23, 34)]
    sents, errors = align_char_spans(text, anns)
    assert errors == 0 and len(sents) == 1
    toks, tags = sents[0]
    assert toks == ["Alice", "Johnson", "lives", "in", "Springfield", "."]
    assert tags == ["B-person", "I-person", "O", "O", "B-location", "O"]

    # overlapping annotation dropped + counted (generate_bio.py:42-50)
    _s, errs = align_char_spans(text, [("person", 0, 13), ("org", 6, 13)])
    assert errs == 1
    # misaligned boundary counted (generate_bio.py:63-66)
    _s, errs = align_char_spans(text, [("person", 1, 13)])
    assert errs == 1


def test_converter_roundtrip_span_f1(ray_session, tmp_path):
    """convert -> TSV -> R1 reader -> decode -> span-F1 == 1.0 vs gold."""
    import ray.data as rd

    from split_ner_ray.evaluate import finalize, sentence_counts
    from split_ner_ray.sources.convert import (
        align_char_spans,
        convert_standoff_docs,
        write_sentences_tsv,
    )
    from split_ner_ray.sources.tsv import read_tsv_corpus

    docs = [
        ("d1", "Alice Johnson lives in Springfield.",
         [{"tag": "person", "start": 0, "end": 13},
          {"tag": "location", "start": 23, "end": 34}]),
        ("d2", "Acme Corp shipped HyperDrive X1 to Bob.",
         [{"tag": "organization", "start": 0, "end": 9},
          {"tag": "product", "start": 18, "end": 31},
          {"tag": "person", "start": 35, "end": 38}]),
    ]
    ds = rd.from_pandas(pd.DataFrame(
        {"doc_id": [d[0] for d in docs], "text": [d[1] for d in docs],
         "annotations": [d[2] for d in docs]}
    ))
    rows = convert_standoff_docs(ds).to_pandas().sort_values("source_file")
    gold = {}
    all_sents = []
    for d in docs:
        sents, errs = align_char_spans(
            d[1], [(a["tag"], a["start"], a["end"]) for a in d[2]]
        )
        assert errs == 0
        gold[d[0]] = sents
        all_sents.extend(sents)

    tsv = tmp_path / "fixture.tsv"
    write_sentences_tsv(all_sents, str(tsv))
    read_back = read_tsv_corpus(str(tsv)).to_pandas().sort_values("sent_idx")
    assert len(read_back) == len(all_sents)

    from collections import Counter

    counts: Counter = Counter()
    for (_i, row), (toks, tags) in zip(read_back.iterrows(), all_sents):
        assert list(row["tokens"]) == toks
        counts.update(sentence_counts(tags, list(row["tags"])))
    m = finalize(counts)
    assert m["micro"]["f1"] == pytest.approx(1.0, abs=1e-6)
    assert m["micro"]["tp"] == 5  # all five gold mentions survive round-trip

    # the distributed converter agrees with the pure function
    for doc_id, sents in gold.items():
        sub = rows[rows["source_file"] == doc_id]
        assert [list(t) for t in sub["tokens"]] == [s[0] for s in sents]
        assert [list(t) for t in sub["tags"]] == [s[1] for s in sents]


# ---------------------------------------------------------------------------
# distributed canon-map fallback agrees with the driver-side default
# ---------------------------------------------------------------------------

def test_build_canon_map_matches_canonicalize_linkable(ray_session):
    import ray.data as rd

    from split_ner_ray.stages import linking as lk

    mentions = pd.DataFrame(
        {
            "etype": ["organization", "organization", "location", "id"],
            "surface": ["Acme Corp", "Acme Corporation", "Springfield", "CVE-2015-8431"],
        }
    )
    triples = pd.DataFrame(
        {
            "subj_etype": ["person"], "subj_surface": ["Alice"],
            "obj_etype": ["organization"], "obj_surface": ["Acme Corp"],
        }
    )
    m_ds, t_ds = rd.from_pandas(mentions), rd.from_pandas(triples)

    dist = (
        lk.build_canon_map(lk.mention_keys(m_ds, t_ds))
        .to_pandas()
        .sort_values(["etype", "norm"])
        .reset_index(drop=True)
    )
    occ = lk.aggregate_occ(lk.occ_partials_from_tables(m_ds, t_ds))
    drv = lk.canonicalize_linkable(occ).to_pandas().sort_values(
        ["etype", "norm"]
    ).reset_index(drop=True)

    # linkable keys identical between the two paths
    link = dist[dist["etype"] != "id"].reset_index(drop=True)
    pd.testing.assert_frame_equal(link, drv)
    # abbreviation linked in both
    assert (
        link.loc[link["norm"] == "acme corporation", "canonical_norm"].iloc[0]
        == "acme corp"
    )
    # the distributed path also carries non-linkable keys with inline-id
    # semantics (entity_id of own norm)
    from split_ner_ray.rules import entity_id

    idrow = dist[dist["etype"] == "id"].iloc[0]
    assert idrow["canonical_norm"] == idrow["norm"]
    assert idrow["entity_id"] == entity_id("id", idrow["norm"])


def test_precomputed_triples_equal_text_path():
    """rules.triples_from_precomputed == rules.extract_turn_triples for any
    turn (the precompute split keeps turn text out of the shuffle)."""
    from split_ner_ray import rules

    texts = [
        ("Alice Johnson works at Acme Corp .", "", None),
        ("He moved to Springfield .", "search", "Bob"),
        ("Acme Corp shipped HyperDrive X1 and Bob met Carol .", "sql_query", None),
        ("no entities here", "", "Alice"),
        ("CVE-2015-8431 reported", "browser", None),
    ]
    for text, tool, prev in texts:
        ms = rules.detect_typed_mentions(text)
        want = rules.extract_turn_triples(text, tool, ms, prev)
        pair_preds, pron_pred = rules.precompute_turn_preds(text, ms)
        got = rules.triples_from_precomputed(
            sorted(ms, key=lambda m: m.start), pair_preds, pron_pred, tool, prev
        )
        assert got == want, (text, got, want)


def test_predicate_mining_matches_python_oracle(ray_session, smoke_transcripts):
    """Distributed predicate-gap miner == plain-python loop over the same
    turns (corpus-level cross-check, not just the seeded fixture)."""
    from collections import Counter

    import ray.data as rd

    from split_ner_ray import rules
    from split_ner_ray.stages.mining import mine_predicate_patterns

    tbl = smoke_transcripts.slice(0, 400)
    got = mine_predicate_patterns(
        rd.from_arrow(tbl), min_support=1
    ).to_pandas()
    got_map = {
        (g, s, o): int(n)
        for g, s, o, n in zip(got["gap"], got["subj_etype"], got["obj_etype"], got["n"])
    }

    want: Counter = Counter()
    for text in tbl.column("text").to_pylist():
        ms = sorted(rules.detect_typed_mentions(text), key=lambda m: m.start)
        for a, b in zip(ms, ms[1:]):
            gap = " ".join(text[a.end: b.start].split()).lower()
            if gap and 1 <= len(gap.split()) <= 4:
                want[(gap, a.etype, b.etype)] += 1
    assert got_map == dict(want)
    assert len(got_map) > 0


# ---------------------------------------------------------------------------
# WordPiece subtoken alignment (M4) feeding mapping1/mapping2 decode
# ---------------------------------------------------------------------------

def test_wordpiece_greedy_longest_match():
    from split_ner_ray.functions.wordpiece import UNK, wordpiece_tokenize

    vocab = {"un", "##aff", "##able", "##ffable", "a", "##b", "hello"}
    assert wordpiece_tokenize("unaffable", vocab) == ["un", "##aff", "##able"]
    assert wordpiece_tokenize("hello", vocab) == ["hello"]
    assert wordpiece_tokenize("ab", vocab) == ["a", "##b"]
    assert wordpiece_tokenize("zzz", vocab) == [UNK]  # unmatchable -> UNK


def test_align_subtokens_structure():
    from split_ner_ray.functions.wordpiece import align_subtokens, default_wordpiece_vocab

    vocab = default_wordpiece_vocab(["Johnson"])
    out = align_subtokens(["Alice", "Johnson"], vocab)
    assert len(out["sub_text"]) == len(out["word_offset"]) == len(out["is_head"])
    # every word has exactly one head; offsets point at source words in order
    heads = [o for o, h in zip(out["word_offset"], out["is_head"]) if h]
    assert heads == [0, 1]
    assert out["word_offset"] == sorted(out["word_offset"])
    assert all(t == 1 for t in out["token_type"])
    # 'Johnson' in vocab -> single sub-token; 'Alice' splits to chars
    assert out["sub_text"].count("Johnson") == 1
    assert sum(1 for o in out["word_offset"] if o == 0) == len("Alice")


def test_wordpiece_grid_feeds_mapping2():
    """End-to-end M4 -> S4: subtoken predictions regrouped per word drive
    consistency_vote_assign; an inconsistent continuation resets the word."""
    from split_ner_ray.functions.decode import consistency_vote_assign
    from split_ner_ray.functions.wordpiece import (
        align_subtokens,
        default_wordpiece_vocab,
        subtoken_grid,
    )

    words = ["Alice", "works", "at", "Acme"]
    vocab = default_wordpiece_vocab(["Alice", "works", "at"])  # Acme splits
    al = align_subtokens(words, vocab)
    n_subs = len(al["sub_text"])
    # model says: B on Alice (1 sub), O elsewhere, B+I+I+E on Acme's subs
    preds = []
    for off, head in zip(al["word_offset"], al["is_head"]):
        if words[off] == "Alice":
            preds.append("B")
        elif words[off] == "Acme":
            preds.append("B" if head else "I")
        else:
            preds.append("O")
    assert len(preds) == n_subs
    grid = subtoken_grid(len(words), al["word_offset"], preds)
    tags = consistency_vote_assign(len(words), [("person", grid)])
    assert tags == ["B-person", "O", "O", "B-person"]

    # now a disagreeing continuation sub-token on Acme -> reset to O
    preds2 = [p for p in preds]
    acme_tail = [i for i, (o, h) in enumerate(zip(al["word_offset"], al["is_head"]))
                 if words[o] == "Acme" and not h]
    assert acme_tail  # Acme really is multi-sub-token
    preds2[acme_tail[-1]] = "O"
    grid2 = subtoken_grid(len(words), al["word_offset"], preds2)
    tags2 = consistency_vote_assign(len(words), [("person", grid2)])
    assert tags2 == ["B-person", "O", "O", "O"]


def test_entity_free_corpus_produces_empty_graph(ray_session):
    """Degenerate input: no detectable entities -> empty (not crashed)
    triples/nodes/edges/mentions through the whole distributed path."""
    import pyarrow as pa
    import ray.data as rd

    from split_ner_ray.pipelines.kg import build_graph_datasets

    tbl = pa.table(
        {
            "conv_id": pa.array(["c1", "c1"], pa.string()),
            "turn_idx": pa.array([0, 1], pa.int32()),
            "text": pa.array(["no entities here", "plain filler text"], pa.string()),
            "tool": pa.array(["", ""], pa.string()),
        }
    )
    t, n, e, m = build_graph_datasets(rd.from_arrow(tbl), batch_size=8)
    assert t.count() == n.count() == e.count() == m.count() == 0
