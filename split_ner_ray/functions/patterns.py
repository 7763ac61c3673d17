"""Orthographic pattern / word-type maps (reference ops M1-M3).

Re-implements the semantics of the reference's character-class transductions
(`splitner/dataset.py:192-335` — make_pattern_type0..4, get_word_type) as
pure functions plus numpy-vectorized batch variants. These feed the span
detector's pattern features and the linking blocking keys, and are exposed
as a standalone `queries()` operator (`doc_patterns`) with a DuckDB oracle.

The reference's [CLS]/[SEP] specials are model-input artifacts; our engine
never materializes them in tables, but the functions honor them so the
conformance tests can compare against reference semantics 1:1.
"""

from __future__ import annotations

import re

import numpy as np

_LOWER = re.compile(r"[a-z]+\Z")
_UPPER = re.compile(r"[A-Z]+\Z")
_FIRST = re.compile(r"[A-Z][a-z]+\Z")
_MIXED = re.compile(r"[A-Za-z]+\Z")
_DIGIT = re.compile(r"[0-9]+\Z")
_PUNCT = re.compile(r"[^A-Za-z0-9]+\Z")
_ALNUM = re.compile(r"[A-Za-z0-9]+\Z")


def pattern_type0(text: str) -> str:
    """a-z -> 'l', A-Z -> 'u', everything else kept (dataset.py:207-216)."""
    out = []
    for c in text:
        if "a" <= c <= "z":
            out.append("l")
        elif "A" <= c <= "Z":
            out.append("u")
        else:
            out.append(c)
    return "".join(out)


def pattern_type2(text: str) -> str:
    """Like type0 but digits -> 'd' (dataset.py:237-253)."""
    if text == "[CLS]":
        return "C"
    if text == "[SEP]":
        return "S"
    out = []
    for c in text:
        if "a" <= c <= "z":
            out.append("l")
        elif "A" <= c <= "Z":
            out.append("u")
        elif "0" <= c <= "9":
            out.append("d")
        else:
            out.append(c)
    return "".join(out)


def _whole_word_class(text: str) -> str | None:
    if text == "[CLS]":
        return "C"
    if text == "[SEP]":
        return "S"
    if _LOWER.fullmatch(text):
        return "L"
    if _UPPER.fullmatch(text):
        return "U"
    if _FIRST.fullmatch(text):
        return "F"
    if _MIXED.fullmatch(text):
        return "M"
    return None


def pattern_type1(text: str) -> str:
    """Whole-word class L/U/F/M, else char transduction (dataset.py:219-234)."""
    cls = _whole_word_class(text)
    return cls if cls is not None else pattern_type0(text)


def pattern_type3(text: str) -> str:
    """Whole-word class, else digit-aware transduction (dataset.py:256-270)."""
    cls = _whole_word_class(text)
    return cls if cls is not None else pattern_type2(text)


def pattern_type4(text: str) -> str:
    """Run-length compressed char classes (dataset.py:273-313).

    Faithful to the reference algorithm including its quirks: a symbol is
    emitted verbatim WITHOUT flushing the preceding run, and a run change
    right after a symbol re-emits the symbol with a count ('Nvidia' ->
    'U1L5', but 'CVE-2015-8431' -> '--1--1D4', verified by executing the
    reference function). The reference crashes on '' (UnboundLocalError);
    we return ''.
    """
    if text == "[CLS]":
        return "C"
    if text == "[SEP]":
        return "S"
    out = []
    prev = ""
    cnt = 0
    cur = ""
    is_symbol = True  # empty text -> no trailing flush
    for c in text:
        if "a" <= c <= "z":
            cur, is_symbol = "L", False
        elif "A" <= c <= "Z":
            cur, is_symbol = "U", False
        elif "0" <= c <= "9":
            cur, is_symbol = "D", False
        else:
            cur, is_symbol = c, True
        if prev == "":
            prev = cur
        if is_symbol:
            out.append(cur)
            prev = cur
            cnt = 0
        elif prev != cur:
            out.append(prev + str(cnt))
            prev = cur
            cnt = 0
        cnt += 1
    if not is_symbol:
        out.append(cur + str(cnt))
    return "".join(out)


def make_pattern(text: str, pattern_type: str) -> str:
    fn = {
        "0": pattern_type0,
        "1": pattern_type1,
        "2": pattern_type2,
        "3": pattern_type3,
        "4": pattern_type4,
    }.get(pattern_type)
    if fn is None:
        raise NotImplementedError(f"pattern_type={pattern_type}")
    return fn(text)


def word_type(text: str) -> str:
    """Token -> one of C S L U F M D P A B (dataset.py:316-335)."""
    cls = _whole_word_class(text)
    if cls is not None:
        return cls
    if _DIGIT.fullmatch(text):
        return "D"
    if _PUNCT.fullmatch(text):
        return "P"
    if _ALNUM.fullmatch(text):
        return "A"
    return "B"


# --- vectorized batch variants (numpy over object arrays; the per-token
# regex work is C-speed, the Python loop is only over the batch) ---------

def pattern_type2_batch(tokens: np.ndarray) -> np.ndarray:
    return np.array([pattern_type2(t) for t in tokens], dtype=object)


def word_type_batch(tokens: np.ndarray) -> np.ndarray:
    return np.array([word_type(t) for t in tokens], dtype=object)
