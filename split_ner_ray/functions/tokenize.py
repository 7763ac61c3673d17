"""Deterministic tokenizer with char offsets.

The reference consumes pre-tokenized TSV (one token per line,
`splitner/dataset.py:149-171`) produced by its corpus converters, whose
splitter is `re.split("([,;.!?:…]|\\s+)", text)` (`utils/generate_bio.py:32`).
Our engine tokenizes raw turn text itself; the contract is: word tokens keep
internal hyphens/dots/slashes (so alphanumeric IDs like CVE-2015-8431 stay
one token — the pattern features of dataset.py:206-313 exist exactly for
such tokens), every other non-space char is a single punctuation token.

Offsets are (start, end) char offsets into the original text, end exclusive
— the per-turn text-equality invariant means `text[start:end] == token`.
"""

from __future__ import annotations

import re

TOKEN_RE = re.compile(r"[A-Za-z0-9_]+(?:['\-./][A-Za-z0-9_]+)*|[^\sA-Za-z0-9_]")


def tokenize_with_offsets(text: str) -> list[tuple[int, int]]:
    """Return [(start, end), ...] token char spans; pure function of text."""
    return [m.span() for m in TOKEN_RE.finditer(text)]


def tokens_of(text: str) -> list[str]:
    return [m.group(0) for m in TOKEN_RE.finditer(text)]
