"""Tests for the shared rule core (detector/typer/predicates/linking keys)."""

from __future__ import annotations

from split_ner_ray import rules
from split_ner_ray.oracle import link_entities


def test_detect_gazetteer_and_id():
    text = "Alice Johnson works at Acme Corp and filed CVE-2015-8431 ."
    ms = rules.detect_typed_mentions(text)
    surfaces = {(m.surface, m.etype) for m in ms}
    assert ("Alice Johnson", "person") in surfaces
    assert ("Acme Corp", "organization") in surfaces
    assert ("CVE-2015-8431", "id") in surfaces
    for m in ms:
        assert text[m.start : m.end] == m.surface  # text-equality invariant


def test_detect_longest_match_wins():
    ms = rules.detect_typed_mentions("Alice Johnson met Bob .")
    surfaces = [m.surface for m in ms]
    assert "Alice Johnson" in surfaces  # not the bare first name
    assert "Bob" in surfaces


def test_truncation_contract():
    # entity planted past MAX_TOKENS_DEFAULT must not be detected (M9)
    filler = "word " * rules.MAX_TOKENS_DEFAULT
    text = filler + "Acme Corp"
    assert rules.detect_typed_mentions(text) == []
    # ... but is detected when the limit allows
    assert rules.detect_typed_mentions("pad " * 10 + "Acme Corp")[0].surface == "Acme Corp"


def test_empty_and_punct_texts():
    assert rules.detect_typed_mentions("") == []
    assert rules.detect_typed_mentions("?!?? ... ;; ----") == []


def test_turn_triples_pattern():
    text = "Alice Johnson works at Acme Corp ."
    ms = rules.detect_typed_mentions(text)
    triples = rules.extract_turn_triples(text, "", ms, None)
    assert ("Alice Johnson", "person", "works_at", "Acme Corp", "organization") in triples


def test_turn_triples_pronoun_coref():
    text = "She lives in Springfield ."
    ms = rules.detect_typed_mentions(text)
    triples = rules.extract_turn_triples(text, "", ms, prev_person="Carol Chen")
    assert ("Carol Chen", "person", "based_in", "Springfield", "location") in triples
    # no previous person -> no triple
    assert rules.extract_turn_triples(text, "", ms, None) == []


def test_turn_triples_tool_rule():
    text = "Check CVE-2020-123 now ."
    ms = rules.detect_typed_mentions(text)
    triples = rules.extract_turn_triples(text, "search", ms, None)
    assert ("CVE-2020-123", "id", "extracted_via", "search", "tool") in triples


def test_normalize_and_linking():
    assert rules.normalize_surface("Acme  Corp.") == "acme corp"
    canon = link_entities(
        [
            ("organization", "acme corp"),
            ("organization", "acme corporation"),
            ("organization", "globex"),
            ("person", "acme corp"),  # different etype -> never linked
        ]
    )
    assert canon[("organization", "acme corp")] == canon[("organization", "acme corporation")]
    assert canon[("organization", "globex")] == "globex"
    assert canon[("person", "acme corp")] == "acme corp"


def test_entity_id_stable():
    assert rules.entity_id("person", "alice") == rules.entity_id("person", "alice")
    assert rules.entity_id("person", "alice") != rules.entity_id("organization", "alice")
