"""Tag-grid -> span decode (the correctness-critical op S4/R2).

Reproduces the reference's two decode contracts exactly:

1. First-wins tag assignment (`main_qa.py:112-160`,
   bert_to_orig_token_mapping1): when multiple sources propose a tag for
   the same token, the first proposal that is not PAD/O sticks; later
   proposals are skipped.

2. B/I adjacency span decode (`dataset_span.py:156-190`, parse_infer_file):
   a `B-` tag opens a span; an `I-` tag extends the current span ONLY if it
   is immediately adjacent to an open span (`continue_span`); a stray `I-`
   (no preceding B-/attached I-) is DROPPED, and anything else closes the
   span. Consecutive `B-` tags start separate spans.

Both the distributed pipeline and the single-process oracle import these
functions, so decode semantics cannot diverge between them.
"""

from __future__ import annotations

O_TAG = "O"
PAD_TAG = "[PAD]"


def decode_bi_spans(tags: list[str]) -> list[tuple[int, int]]:
    """BIO tag list -> [(start_tok, end_tok)] inclusive token spans.

    Exact semantics of parse_infer_file (dataset_span.py:166-176): B- opens,
    I- continues only while adjacent, stray I- dropped.
    """
    spans: list[tuple[int, int]] = []
    continue_span = False
    for i, tag in enumerate(tags):
        if tag.startswith("B-"):
            spans.append((i, i))
            continue_span = True
        elif tag.startswith("I-") and continue_span:
            spans[-1] = (spans[-1][0], i)
        else:
            continue_span = False
    return spans


def first_wins_assign(n_tokens: int, proposals: list[tuple[int, int, str]]) -> list[str]:
    """Assign per-token tags from ordered span proposals, first-wins.

    ``proposals`` is an ordered list of (start_tok, end_tok_inclusive,
    entity) candidate spans. A proposal is applied token-by-token; a token
    already holding a non-PAD tag is skipped (main_qa.py:137-139), which can
    truncate overlapping proposals — exactly the reference's merge behavior
    when several QA contexts write to one sentence grid.
    """
    tags = [PAD_TAG] * n_tokens
    for start, end, entity in proposals:
        for i in range(max(start, 0), min(end, n_tokens - 1) + 1):
            if tags[i] != PAD_TAG:
                continue
            tags[i] = ("B-" if i == start else "I-") + entity
    return [O_TAG if t == PAD_TAG else t for t in tags]


def consistency_vote_assign(
    n_tokens: int, contexts: list[tuple[str, list[list[str]]]]
) -> list[str]:
    """`bert_to_orig_token_mapping2` semantics (main_qa.py:165-214) — the
    reference's consistency-voting decode variant ("slightly more true
    positives, considerably fewer false positives").

    ``contexts`` is an ordered list of (entity, token_preds); token_preds
    holds, per original token, the predicted class chars of its sub-tokens
    (head first): 'B'/'S'/'I'/'E' or anything else for O/none.

    Per context: the HEAD sub-token assigns B-/I-/O exactly as mapping1
    does (B/S -> B-entity, I/E -> I-entity, else O; only onto PAD/O slots),
    but the token KEEPS the assignment only if every continuation sub-token
    predicts I or E — an inconsistent token is reset to O. A token already
    tagged with a different context's entity is skipped (cross-entity
    first-wins, main_qa.py:185-187).

    Documented divergence: the reference's inconsistency test is
    ``prediction[j] != I or prediction[j] != E`` (main_qa.py:205-206) — a
    tautology (flagged "TODO: needs proof-reading" in the reference) that
    would reset EVERY multi-sub-token assignment. We implement the
    documented intent (logical and): reset only when a continuation
    sub-token is neither I nor E. For single-sub-token tokenizers (our
    rules backend) both variants coincide with first-wins.
    """
    tags = [PAD_TAG] * n_tokens
    for entity, tok_preds in contexts:
        for ptr in range(min(n_tokens, len(tok_preds))):
            subs = tok_preds[ptr]
            if not subs:
                continue
            cur = tags[ptr]
            if cur not in (PAD_TAG, O_TAG) and cur[2:] != entity:
                continue  # another entity's context got here first
            head = subs[0]
            if head in ("B", "S"):
                assign = "B-" + entity
            elif head in ("I", "E"):
                assign = "I-" + entity
            else:
                assign = O_TAG
            if tags[ptr] in (PAD_TAG, O_TAG):
                tags[ptr] = assign
            if len(subs) > 1 and any(s not in ("I", "E") for s in subs[1:]):
                if tags[ptr] not in (PAD_TAG, O_TAG) and tags[ptr][2:] == entity:
                    tags[ptr] = O_TAG
    return [O_TAG if t == PAD_TAG else t for t in tags]


def bioes_to_bio(tags: list[str]) -> list[str]:
    """S- -> B-, E- -> I- normalization (main.py:104-158 seq-tag variant)."""
    out = []
    for t in tags:
        if t.startswith("S-"):
            out.append("B-" + t[2:])
        elif t.startswith("E-"):
            out.append("I-" + t[2:])
        else:
            out.append(t)
    return out


def bio_to_bioe(tags: list[str]) -> list[str]:
    """BIO -> BIOE: last token of each multi-token span becomes E-
    (dataset.py:421-461 rewrite direction used by the detector)."""
    out = list(tags)
    n = len(out)
    for i in range(n):
        if not out[i].startswith("I-"):
            continue
        nxt = out[i + 1] if i + 1 < n else "O"
        if not (nxt.startswith("I-") and nxt[2:] == out[i][2:]) and not nxt.startswith("E-"):
            out[i] = "E-" + out[i][2:]
    return out
