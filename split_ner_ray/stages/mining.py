"""Frequent-pattern mining (reference op S9 proper —
`/root/reference/splitner/utils/pattern_analysis.py:19-97`).

Three miners, all shaped as per-batch Counter partials -> one bucketed
hash aggregate (combiner pattern; the shuffle moves (pattern, n) partial
rows, never token streams):

- intrinsic_pattern_tags: per-token orthographic pattern (make_pattern
  type 0) -> tag distribution, with the reference's exact thresholds
  (support >= 10, tag share >= 10%, drop O-only patterns) —
  pattern_analysis.intrinsic_patterns:19-41.
- extrinsic_patterns: typed-placeholder window patterns around mentions
  (before-window 1..B x after-window 1..A, the reference's 5x5 grid) —
  pattern_analysis.extrinsic_patterns:43-97 with its min-support cut.
- mine_predicate_patterns: the engine-specific S9 payload — gap texts
  between consecutive typed mentions with (subj_etype, obj_etype)
  support, the exact shape rules.PRED_PATTERNS consumes;
  extend_pred_patterns turns high-support gaps into new predicate rules.
"""

from __future__ import annotations

from collections import Counter

import pandas as pd

from .. import rules
from ..functions.patterns import make_pattern
from ..functions.tokenize import TOKEN_RE


def _count_rows(counter: Counter, cols: list[str]) -> pd.DataFrame:
    keys = list(counter.keys())
    data = {c: [k[i] for k in keys] for i, c in enumerate(cols)}
    data["n"] = pd.array([counter[k] for k in keys], dtype="int64")
    return pd.DataFrame(data)


def _agg_counts(parts, key_cols: list[str], final_fn=None):
    from .relational import hash_aggregate

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        out = g.groupby(key_cols, as_index=False)["n"].sum()
        out["n"] = out["n"].astype("int64")
        return final_fn(out) if final_fn is not None else out

    return hash_aggregate(parts, key_cols, per_bucket)


def _token_tags(text: str, max_tokens: int = rules.MAX_TOKENS_DEFAULT):
    """Tokens of one turn with their mention tag (etype or 'O') — the
    token-grid view the reference miners consume."""
    spans = [m.span() for m in TOKEN_RE.finditer(text)]
    toks = [text[s:e] for s, e in spans]
    tags = ["O"] * len(toks)
    for m in rules.detect_typed_mentions(text, max_tokens):
        for i, (s, e) in enumerate(spans):
            if s >= m.start and e <= m.end:
                tags[i] = m.etype
    return toks, tags


def intrinsic_pattern_tags(ds, *, text_col: str = "text", min_support: int = 10,
                           min_share: float = 0.1):
    """-> Dataset (pattern, tag, n, share_pct): per-pattern tag
    distributions, reference semantics: keep a (pattern -> tag) entry only
    if the pattern's total support >= min_support, the tag's share >= 10%,
    and the surviving distribution is not {O} alone
    (pattern_analysis.py:30-38)."""

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        c: Counter = Counter()
        for text in batch[text_col]:
            toks, tags = _token_tags(text)
            for t, g in zip(toks, tags):
                c[(make_pattern(t, "0"), g)] += 1
        return _count_rows(c, ["pattern", "tag"])

    parts = ds.map_batches(partial, batch_format="pandas")
    agg = _agg_counts(parts, ["pattern", "tag"])

    # per-pattern finalize: one more bucketed pass keyed on pattern only
    # (all of a pattern's tag rows land in one bucket)
    def finalize(g: pd.DataFrame) -> pd.DataFrame:
        frames = []
        for _p, sub in g.groupby("pattern", sort=False):
            d = int(sub["n"].sum())
            if d < min_support:
                continue
            keep = sub[sub["n"] / d >= min_share].copy()
            if len(keep) == 1 and keep["tag"].iloc[0] == "O":
                continue
            keep["share_pct"] = (keep["n"] * 100.0 / d).round(1)
            frames.append(keep)
        if not frames:
            return pd.DataFrame(
                {"pattern": [], "tag": [], "n": pd.array([], dtype="int64"),
                 "share_pct": []}
            )
        return pd.concat(frames, ignore_index=True)

    from .relational import hash_aggregate

    return hash_aggregate(agg, ["pattern"], finalize)


def extrinsic_patterns(ds, *, text_col: str = "text", max_before: int = 5,
                       max_after: int = 5, min_support: int = 40):
    """-> Dataset (pattern, n): window patterns around typed-placeholder
    mentions. Mentions collapse to their etype placeholder; for every
    placeholder position i, every window [i-b, i+a) with b in 1..max_before,
    a in 1..max_after is counted (the reference's 25-window grid,
    pattern_analysis.py:60-93), cut at min_support (>= 40 there)."""

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        c: Counter = Counter()
        for text in batch[text_col]:
            toks, tags = _token_tags(text)
            # collapse mention runs to one placeholder token (B- only in the
            # reference; a run of same-tag tokens = one mention here)
            new_toks: list[str] = []
            anchors: list[int] = []
            prev_tag = None
            for t, g in zip(toks, tags):
                if g == "O":
                    new_toks.append(t)
                elif g != prev_tag or prev_tag is None:
                    anchors.append(len(new_toks))
                    new_toks.append(g)
                prev_tag = g if g != "O" else None
            n = len(new_toks)
            for i in anchors:
                for b in range(1, max_before + 1):
                    for a in range(1, max_after + 1):
                        c[(" ".join(new_toks[max(0, i - b): min(n, i + a)]),)] += 1
        return _count_rows(c, ["pattern"])

    parts = ds.map_batches(partial, batch_format="pandas")

    def cut(out: pd.DataFrame) -> pd.DataFrame:
        return out[out["n"] >= min_support]

    return _agg_counts(parts, ["pattern"], cut)


def mine_predicate_patterns(ds, *, text_col: str = "text", max_gap_tokens: int = 4,
                            min_support: int = 2):
    """-> Dataset (gap, subj_etype, obj_etype, n): the between-text of every
    consecutive typed-mention pair whose gap is 1..max_gap_tokens tokens —
    exactly the keys rules.PRED_PATTERNS matches on, with per-gap type-pair
    support so high-precision gaps can be promoted to predicates."""

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        c: Counter = Counter()
        for text in batch[text_col]:
            ms = sorted(rules.detect_typed_mentions(text), key=lambda m: m.start)
            for a, b in zip(ms, ms[1:]):
                gap = " ".join(text[a.end: b.start].split()).lower()
                if gap and 1 <= len(gap.split()) <= max_gap_tokens:
                    c[(gap, a.etype, b.etype)] += 1
        return _count_rows(c, ["gap", "subj_etype", "obj_etype"])

    parts = ds.map_batches(partial, batch_format="pandas")

    def cut(out: pd.DataFrame) -> pd.DataFrame:
        return out[out["n"] >= min_support]

    return _agg_counts(parts, ["gap", "subj_etype", "obj_etype"], cut)


def extend_pred_patterns(mined: pd.DataFrame, *, min_support: int = 10) -> dict[str, str]:
    """Mined (gap, n) rows -> {gap_text: predicate_slug} for gaps above
    min_support that are not already in rules.PRED_PATTERNS. The slug is
    the underscored gap ('reported to' -> 'reported_to'). Merge into
    rules.PRED_PATTERNS to widen extraction with corpus-discovered
    predicates (the reference's mined-pattern feedback loop)."""
    support = mined.groupby("gap", as_index=False)["n"].sum()
    out: dict[str, str] = {}
    for gap, n in zip(support["gap"], support["n"]):
        if n >= min_support and gap not in rules.PRED_PATTERNS:
            slug = "_".join(gap.split())
            if slug.replace("_", "").isalpha():
                out[gap] = slug
    return out
