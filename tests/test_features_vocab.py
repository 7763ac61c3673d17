"""Feature-id encoders (M14), punctuation handlers (M3), vocab file
readers (R4), multi-seed summary (A4), multi-table LSH."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest


# ---------------------------------------------------------------------------
# punctuation handlers (dataset.py:507-556) — hand-executed expectations
# ---------------------------------------------------------------------------

def test_punctuation_schemes_both_variants():
    from split_ner_ray.functions.features import (
        punctuation_class,
        punctuation_vocab_size,
    )

    # handle_punctuation1 semantics
    assert punctuation_class(",", "type1") == 1
    assert punctuation_class("word", "type1") == 0
    assert punctuation_class(",", "type1-and") == 0
    assert punctuation_class("And", "type1-and") == 1
    assert punctuation_class("word", "type1-and") == -1
    assert punctuation_class(".", "type2") == 0  # index of '.' in ".,-/()"
    assert punctuation_class("(", "type2") == 4
    assert punctuation_class("!", "type2") == 6  # catch-all P
    assert punctuation_class("word", "type2") == 0  # non-punct O (ref quirk: same id as '.')

    # handle_punctuation2 (shifted positive) semantics
    assert punctuation_class(",", "type1", variant=2) == 1
    assert punctuation_class("word", "type1", variant=2) == 2
    assert punctuation_class(",", "type1-and", variant=2) == 1
    assert punctuation_class("and", "type1-and", variant=2) == 2
    assert punctuation_class("word", "type1-and", variant=2) == 3
    assert punctuation_class(".", "type2", variant=2) == 1
    assert punctuation_class("!", "type2", variant=2) == 7
    assert punctuation_class("word", "type2", variant=2) == 8

    assert punctuation_vocab_size("type1") == 1
    assert punctuation_vocab_size("type1-and") == 2
    assert punctuation_vocab_size("type2") == 8
    with pytest.raises(NotImplementedError):
        punctuation_class("x", "type9")


# ---------------------------------------------------------------------------
# feature-id encoders (dataset.py:472-505, 652-698)
# ---------------------------------------------------------------------------

def test_char_id_matrix_reference_semantics():
    from split_ner_ray.functions.features import char_id_matrix, char_vocab

    vocab = char_vocab()
    out = char_id_matrix([["ab", "c"], ["xyzw"]], max_len=3, vocab=vocab)
    assert out.shape == (2, 3, 4)  # max word len 4
    a = vocab.index("a") + 1  # +1 shift, 0 = pad
    assert out[0, 0, 0] == a and out[0, 0, 1] == vocab.index("b") + 1
    assert out[0, 0, 2] == 0  # word pad
    assert (out[0, 2] == 0).all()  # sentence pad
    # chars outside the vocab are dropped
    out2 = char_id_matrix([["aéb"]], max_len=1, vocab=vocab)
    assert out2[0, 0, 0] == a and out2[0, 0, 1] == vocab.index("b") + 1
    # max_word_len floored at 3 (CNN kernel guard)
    assert char_id_matrix([["a"]], max_len=1, vocab=vocab).shape == (1, 1, 3)


def test_pattern_matrices_and_token_ids():
    from split_ner_ray.functions.features import (
        pattern_id_matrix,
        pattern_token_ids,
        pattern_vocab,
    )

    m = pattern_id_matrix([["Alice", "12"]], max_len=2, pattern_type="0")
    pv = pattern_vocab("0")
    # 'Alice' -> type-0 'ullll': first char id = index('u')+1
    assert m[0, 0, 0] == pv.index("u") + 1
    assert m[0, 0, 1] == pv.index("l") + 1

    tok = pattern_token_ids([["ul", "??"]], max_len=3, vocab=["ul", "dd"])
    assert tok.tolist() == [[0, 2, 0]]  # known->index, OOV->vocab_size, pad 0


def test_flair_stream_boundaries():
    from split_ner_ray.functions.features import flair_stream, flair_vocab

    vocab = flair_vocab()
    start, end, pad = len(vocab), len(vocab) + 1, len(vocab) + 2
    ids, bnd, mask = flair_stream([["ab", "c"]], max_len=4)
    # stream: [START] a b ' ' c [END]
    want = [start, vocab.index("a"), vocab.index("b"), vocab.index(" "),
            vocab.index("c"), end]
    assert ids[0, : len(want)].tolist() == want
    assert mask[0].sum() == len(want)
    # boundaries: before word0 (START pos 0), before word1 (space pos 3),
    # END pos 5; padded with -1 to max_len+1
    assert bnd[0].tolist() == [0, 3, 5, -1, -1]


# ---------------------------------------------------------------------------
# vocab file readers (R4; dataset.py:73-93, dataset_qa.py:54-63)
# ---------------------------------------------------------------------------

def test_vocab_readers_roundtrip(tmp_path):
    from split_ner_ray.sources.vocab import (
        read_aux_tag_vocab,
        read_tag_names,
        read_tag_vocab,
        write_tag_names,
        write_vocab,
    )

    p = tmp_path / "tag_vocab.txt"
    write_vocab(["B-person", "I-person", "O"], str(p))
    assert read_tag_vocab(str(p)) == ["B-person", "I-person", "O"]

    assert read_aux_tag_vocab(str(p), "O", do_task=False) == []
    assert read_aux_tag_vocab(str(p), "NONE") == ["NONE", "B-person", "I-person", "O"]

    n = tmp_path / "tag_names.txt"
    write_tag_names({"person": "person name", "org": "organization"}, str(n))
    assert read_tag_names(str(n)) == {"person": "person name", "org": "organization"}


# ---------------------------------------------------------------------------
# multi-seed summary (A4; analysis_multirun.py:427-447)
# ---------------------------------------------------------------------------

def test_multi_seed_summary():
    from split_ner_ray.evaluate import multi_seed_summary

    runs = [
        {"micro": {"precision": 0.9, "recall": 0.8, "f1": 0.85}, "macro_f1": 0.7},
        {"micro": {"precision": 0.8, "recall": 0.9, "f1": 0.85}, "macro_f1": 0.9},
    ]
    s = multi_seed_summary(runs)
    assert s["n_runs"] == 2
    assert s["micro_f1"]["mean"] == pytest.approx(0.85)
    assert s["micro_f1"]["std"] == pytest.approx(0.0)
    assert s["macro_f1"]["mean"] == pytest.approx(0.8)
    assert s["macro_f1"]["std"] == pytest.approx(0.1)
    assert s["micro_p"]["runs"] == [0.9, 0.8]


# ---------------------------------------------------------------------------
# multi-table LSH OR-construction recall
# ---------------------------------------------------------------------------

def test_cosine_lsh_multi_table_recall(ray_session):
    import ray.data as rd

    from split_ner_ray.stages.dedup import cosine_dup_pairs

    rng = np.random.RandomState(3)
    base = rng.randn(10, 32)
    # 10 moderate-similarity pairs (cos ~0.93): single-table recall is
    # partial; 8-table OR-construction should find (nearly) all
    vecs, ids = [], []
    for i, b in enumerate(base):
        vecs += [list(b), list(b + rng.randn(32) * 0.12)]
        ids += [2 * i, 2 * i + 1]
    df = pd.DataFrame({"vec_id": ids, "embedding": vecs})
    ds = rd.from_pandas(df)

    brute = cosine_dup_pairs(ds, threshold=0.9, lsh=False).to_pandas()
    want = set(zip(brute["src"], brute["dst"]))
    assert len(want) >= 8  # sanity: the planted pairs clear the threshold

    multi = cosine_dup_pairs(ds, threshold=0.9, num_planes=4, num_tables=8).to_pandas()
    got = set(zip(multi["src"], multi["dst"]))
    assert got <= want  # LSH candidates verified exactly -> no false pairs
    assert len(got & want) / len(want) >= 0.9  # OR-construction recall
