"""Executed-reference parity for the torch-free reference functions.

The reference module (`/root/reference/splitner/dataset.py`) imports torch
at module level, so it cannot be imported here; instead the pure static
methods under test are AST-extracted and exec'd standalone, then fuzzed
against our implementations — parity with the REFERENCE CODE ITSELF, not
with hand-derived expectations."""

from __future__ import annotations

import ast
import random
import string

import pytest

REF = "/root/reference/splitner/dataset.py"
_WANTED = {
    "handle_punctuation1",
    "handle_punctuation2",
    "get_punctuation_vocab_size",
    "get_char_vocab",
    "get_flair_vocab",
    "get_pattern_vocab",
    "get_word_type_vocab",
}


@pytest.fixture(scope="module")
def ref_fns():
    tree = ast.parse(open(REF).read())
    ns: dict = {"NerDataset": None}
    fns: dict = {}
    for node in ast.walk(tree):
        if isinstance(node, ast.FunctionDef) and node.name in _WANTED:
            node.decorator_list = []  # drop @staticmethod
            mod = ast.Module(body=[node], type_ignores=[])
            ast.fix_missing_locations(mod)
            exec(compile(mod, REF, "exec"), ns)
            fns[node.name] = ns[node.name]
    # get_flair_vocab calls NerDataset.get_char_vocab — patch the name

    class _NS:
        pass

    _NS.get_char_vocab = staticmethod(fns["get_char_vocab"])
    ns["NerDataset"] = _NS
    assert set(fns) == _WANTED
    return fns


def _fuzz_words(n=300, seed=5):
    rng = random.Random(seed)
    alphabet = string.ascii_letters + string.digits + ",;.!?:'\"/\\|_@#$%^&*~`+-=<>()[]{}"
    words = ["and", "And", "AND", ".", ",", "(", "!", "-", "word", "X1"]
    for _ in range(n):
        words.append("".join(rng.choice(alphabet) for _ in range(rng.randint(1, 8))))
    return words


def test_punctuation_handlers_match_executed_reference(ref_fns):
    from split_ner_ray.functions.features import punctuation_class

    for ptype in ("type1", "type1-and", "type2"):
        for w in _fuzz_words():
            assert punctuation_class(w, ptype, variant=1) == ref_fns["handle_punctuation1"](w, ptype), (w, ptype)
            assert punctuation_class(w, ptype, variant=2) == ref_fns["handle_punctuation2"](w, ptype), (w, ptype)


def test_vocab_builders_match_executed_reference(ref_fns):
    from split_ner_ray.functions.features import (
        char_vocab,
        flair_vocab,
        pattern_vocab,
        punctuation_vocab_size,
        word_type_vocab,
    )

    assert char_vocab() == ref_fns["get_char_vocab"]()
    assert flair_vocab() == ref_fns["get_flair_vocab"]()
    assert word_type_vocab() == ref_fns["get_word_type_vocab"]()
    for t in ("type1", "type1-and", "type2"):
        assert punctuation_vocab_size(t) == ref_fns["get_punctuation_vocab_size"](t)
    for p in ("0", "1", "2", "3", "4"):
        assert pattern_vocab(p) == ref_fns["get_pattern_vocab"](p)
