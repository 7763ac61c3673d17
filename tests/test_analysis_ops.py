"""Diagnostic metric ops: boundary-error segregation (A5), prediction diff
(D4), overlap taxonomy."""

from __future__ import annotations

from split_ner_ray.evaluate import overlap_category


def test_overlap_taxonomy():
    g = ("org", 2, 5)
    assert overlap_category(g, ("org", 2, 5)) == "exact"
    assert overlap_category(g, ("per", 2, 5)) == "type_mismatch"
    assert overlap_category(g, ("org", 3, 5)) == "missed_prefix"
    assert overlap_category(g, ("org", 2, 4)) == "missed_suffix"
    assert overlap_category(g, ("org", 3, 4)) == "missed_prefix+missed_suffix"
    assert overlap_category(g, ("org", 1, 5)) == "extra_prefix"
    assert overlap_category(g, ("org", 2, 6)) == "extra_suffix"
    assert overlap_category(g, ("org", 1, 6)) == "extra_prefix+extra_suffix"
    assert overlap_category(g, ("org", 4, 7)) == "overlap"
    assert overlap_category(g, ("org", 6, 8)) == "disjoint"


def test_boundary_error_counts(ray_session):
    import ray.data as rd

    from split_ner_ray.evaluate import boundary_error_counts

    rows = [
        {
            "gold_tags": ["B-org", "I-org", "O", "B-per"],
            "pred_tags": ["B-org", "I-org", "O", "O"],  # exact + missed
        },
        {
            "gold_tags": ["O", "B-loc", "I-loc", "O"],
            "pred_tags": ["O", "B-loc", "O", "B-id"],  # missed_suffix + spurious
        },
    ]
    c = boundary_error_counts(rd.from_items(rows))
    assert c.get("exact") == 1
    assert c.get("missed") == 1
    assert c.get("missed_suffix") == 1
    assert c.get("spurious") == 1


def test_compare_predictions(ray_session):
    import ray.data as rd

    from split_ner_ray.evaluate import compare_predictions

    a = rd.from_items(
        [
            {"conv_id": "c", "turn_idx": 0, "start": 0, "end": 5, "etype": "person"},
            {"conv_id": "c", "turn_idx": 1, "start": 2, "end": 8, "etype": "org"},
        ]
    )
    b = rd.from_items(
        [
            {"conv_id": "c", "turn_idx": 0, "start": 0, "end": 5, "etype": "person"},
            {"conv_id": "c", "turn_idx": 1, "start": 2, "end": 8, "etype": "location"},
        ]
    )
    d = compare_predictions(a, b)
    assert d["common"] == 1
    assert len(d["only_a"]) == 1 and d["only_a"][0][-1] == "org"
    assert len(d["only_b"]) == 1 and d["only_b"][0][-1] == "location"
