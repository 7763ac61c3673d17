"""Unit tests for the pure function layer (patterns, tokenize, decode).

Pattern expectations were captured by EXECUTING the reference functions
(splitner/dataset.py:192-335) on the same inputs — including type4's quirky
symbol handling — so these are true conformance tests, not self-tests.
"""

from __future__ import annotations

from split_ner_ray.functions.decode import (
    bio_to_bioe,
    bioes_to_bio,
    decode_bi_spans,
    first_wins_assign,
)
from split_ner_ray.functions.patterns import (
    make_pattern,
    pattern_type0,
    pattern_type2,
    pattern_type4,
    word_type,
)
from split_ner_ray.functions.tokenize import tokenize_with_offsets, tokens_of


# --- patterns (reference ground truth, captured by execution) -------------

REFERENCE_TYPE4 = {
    "CVE-2015-8431": "--1--1D4",
    "Nvidia": "U1L5",
    "hello": "L5",
    "HELLO": "U5",
    "Abc123": "U1L2D3",
    "a-b": "--1L1",
    "-": "-",
    "x": "L1",
    "Ab": "U1L1",
    "2015": "D4",
    "a--b": "---1L1",
    "A1-b2": "U1--1L1D1",
}

REFERENCE_TYPE2 = {
    "CVE-2015-8431": "uuu-dddd-dddd",
    "Nvidia": "ulllll",
    "Abc123": "ullddd",
    "a-b": "l-l",
    "": "",
}

REFERENCE_WORD_TYPE = {
    "CVE-2015-8431": "B",
    "Nvidia": "F",
    "hello": "L",
    "HELLO": "U",
    "Abc123": "A",
    "a-b": "B",
    "-": "P",
    "2015": "D",
    "": "B",
    "[CLS]": "C",
    "[SEP]": "S",
}


def test_pattern_type4_matches_reference():
    for text, want in REFERENCE_TYPE4.items():
        assert pattern_type4(text) == want, text
    assert pattern_type4("") == ""  # reference crashes here; we don't


def test_pattern_type2_matches_reference():
    for text, want in REFERENCE_TYPE2.items():
        assert pattern_type2(text) == want, text


def test_word_type_matches_reference():
    for text, want in REFERENCE_WORD_TYPE.items():
        assert word_type(text) == want, text


def test_pattern_type0_and_dispatch():
    assert pattern_type0("Ab1-") == "ul1-"
    assert make_pattern("hello", "1") == "L"
    assert make_pattern("Abc12", "3") == "ulldd"
    assert make_pattern("Abc12", "1") == "ulc12".replace("c", "l")  # falls to type0


# --- tokenizer -------------------------------------------------------------

def test_tokenize_offsets_roundtrip():
    text = "Alice Johnson works at Acme Corp. See CVE-2015-8431, ok?"
    spans = tokenize_with_offsets(text)
    toks = tokens_of(text)
    assert [text[s:e] for s, e in spans] == toks
    assert "CVE-2015-8431" in toks  # IDs stay one token
    assert "," in toks and "?" in toks


def test_tokenize_empty_and_unicode():
    assert tokenize_with_offsets("") == []
    toks = tokens_of("café 你好 — ok")
    assert "caf" in toks[0]  # ASCII word chars only; accents split as punct


# --- decode (S4/R2 parity contracts) ---------------------------------------

def test_decode_bi_adjacency_rule():
    # stray I- dropped; I- after gap does not reattach (dataset_span.py:166-176)
    tags = ["O", "I-ENTITY", "B-ENTITY", "I-ENTITY", "O", "I-ENTITY", "B-ENTITY"]
    assert decode_bi_spans(tags) == [(2, 3), (6, 6)]


def test_decode_consecutive_b_starts_new_spans():
    assert decode_bi_spans(["B-E", "B-E", "I-E"]) == [(0, 0), (1, 2)]


def test_first_wins_truncates_overlaps():
    # proposal 2 overlaps tokens already tagged -> only its tail is tagged,
    # and that tail is an I- without adjacency -> dropped at decode
    tags = first_wins_assign(5, [(0, 2, "ENTITY"), (2, 4, "ENTITY")])
    assert tags == ["B-ENTITY", "I-ENTITY", "I-ENTITY", "I-ENTITY", "I-ENTITY"]
    # the overlapped second proposal's tokens continue the first span
    assert decode_bi_spans(tags) == [(0, 4)]


def test_first_wins_order_matters():
    a = first_wins_assign(4, [(0, 1, "X"), (1, 3, "Y")])
    b = first_wins_assign(4, [(1, 3, "Y"), (0, 1, "X")])
    assert a == ["B-X", "I-X", "I-Y", "I-Y"]
    assert b == ["B-X", "B-Y", "I-Y", "I-Y"]


def test_bioes_normalization():
    assert bioes_to_bio(["S-P", "E-P", "B-P", "O"]) == ["B-P", "I-P", "B-P", "O"]
    assert bio_to_bioe(["B-P", "I-P", "I-P", "O", "B-Q", "I-Q"]) == [
        "B-P", "I-P", "E-P", "O", "B-Q", "E-Q",
    ]
