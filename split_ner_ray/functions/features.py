"""Feature-id encoders + punctuation handlers (reference ops M3/M14).

numpy re-implementations of the reference's collator-side feature builders
(`/root/reference/splitner/dataset.py:472-602,652-698`): char-id matrices,
pattern-id matrices/vectors, the three punctuation schemes (both indexing
variants), and the flair character stream with word boundaries. These feed
a scorer backend's feature tensors; they stay off the Arrow table (arrays
built inside the actor per batch, exactly like the reference's collator).

Zero-pad semantics, +1 index shifts, the max_word_len >= 3 floor (CNN
kernel guard, dataset.py:475-476) and the boundary layout
(count(boundaries) = count(words) + 1, dataset.py:684) are preserved
exactly.
"""

from __future__ import annotations

import numpy as np

PUNCT_ALL = list(",;.!?:'\"/\\|_@#$%^&*~`+-=<>()[]{}")
_PUNCT_TYPE2 = list(".,-/()")


def char_vocab() -> list[str]:
    """dataset.py:560-567 (94 chars; no space/newline)."""
    return (
        PUNCT_ALL
        + list("abcdefghijklmnopqrstuvwxyz")
        + list("ABCDEFGHIJKLMNOPQRSTUVWXYZ")
        + list("0123456789")
    )


def flair_vocab() -> list[str]:
    """dataset.py:569-573 (char vocab + space)."""
    return char_vocab() + [" "]


def pattern_vocab(pattern_type: str) -> list[str]:
    """dataset.py:575-598."""
    vocab = list(PUNCT_ALL)
    extra = {
        "0": list("ul") + list("0123456789"),
        "1": list("ulCSLUFM") + list("0123456789"),
        "2": list("CSlud"),
        "3": list("CSLUFMlud"),
        "4": list("CSLUD") + list("0123456789"),
    }.get(pattern_type)
    if extra is None:
        raise NotImplementedError(f"pattern_type={pattern_type}")
    return vocab + extra


def word_type_vocab() -> list[str]:
    return list("CSLUFMDPAB")


def punctuation_vocab_size(punctuation_type: str) -> int:
    """dataset.py:507-513."""
    if punctuation_type == "type1":
        return 1
    if punctuation_type == "type1-and":
        return 2
    if punctuation_type == "type2":
        return len(list("O.,-/()P"))
    raise NotImplementedError(f"punctuation_type={punctuation_type}")


def punctuation_class(word: str, punctuation_type: str, *, variant: int = 1) -> int:
    """The reference's two punctuation handlers (dataset.py:515-556):
    ``variant=1`` = handle_punctuation1 (zero-based, 'and' scheme uses -1
    for other words), ``variant=2`` = handle_punctuation2 (shifted positive
    indexing — the "YJ: update ... not to return 0 or negative" variant)."""
    if variant == 1:
        if punctuation_type == "type1":
            return 1 if word in PUNCT_ALL else 0
        if punctuation_type == "type1-and":
            if word in PUNCT_ALL:
                return 0
            return 1 if word.lower() == "and" else -1
        if punctuation_type == "type2":
            if word in _PUNCT_TYPE2:
                return _PUNCT_TYPE2.index(word)
            if word in PUNCT_ALL:
                return len(_PUNCT_TYPE2)  # catch-all P
            return 0  # non-punctuation (O)
        raise NotImplementedError(f"punctuation_type={punctuation_type}")
    if variant == 2:
        if punctuation_type == "type1":
            return 1 if word in PUNCT_ALL else 2
        if punctuation_type == "type1-and":
            if word in PUNCT_ALL:
                return 1
            return 2 if word.lower() == "and" else 3
        if punctuation_type == "type2":
            if word in _PUNCT_TYPE2:
                return _PUNCT_TYPE2.index(word) + 1
            if word in PUNCT_ALL:
                return len(_PUNCT_TYPE2) + 1
            return len(_PUNCT_TYPE2) + 2
        raise NotImplementedError(f"punctuation_type={punctuation_type}")
    raise NotImplementedError(f"variant={variant}")


def char_id_matrix(batch_tokens: list[list[str]], max_len: int,
                   vocab: list[str]) -> np.ndarray:
    """get_char_ids (dataset.py:472-487): (B, max_len, max_word_len) int64;
    ids are vocab.index+1, chars outside the vocab dropped, zero padding;
    max_word_len floored at 3 (CNN kernel guard)."""
    idx = {c: i + 1 for i, c in enumerate(vocab)}
    max_word_len = max(
        (len(w) for sent in batch_tokens for w in sent), default=3
    )
    max_word_len = max(max_word_len, 3)
    out = np.zeros((len(batch_tokens), max_len, max_word_len), dtype=np.int64)
    for b, sent in enumerate(batch_tokens):
        for s, word in enumerate(sent[:max_len]):
            ids = [idx[c] for c in word if c in idx]
            out[b, s, : len(ids)] = ids
    return out


def pattern_id_matrix(batch_tokens: list[list[str]], max_len: int,
                      pattern_type: str) -> np.ndarray:
    """Collator pattern_ids path (dataset.py:659-663): make_pattern per
    word, then char-id encoding against the pattern vocab."""
    from .patterns import make_pattern

    pats = [[make_pattern(w, pattern_type) for w in sent] for sent in batch_tokens]
    return char_id_matrix(pats, max_len, pattern_vocab(pattern_type))


def pattern_token_ids(batch_tokens: list[list[str]], max_len: int,
                      vocab: list[str]) -> np.ndarray:
    """get_pattern_ids (dataset.py:489-505): one id per token —
    vocab.index for known patterns, vocab_size for OOV, zero padding."""
    out = np.zeros((len(batch_tokens), max_len), dtype=np.int64)
    idx = {p: i for i, p in enumerate(vocab)}
    for b, sent in enumerate(batch_tokens):
        for s, word in enumerate(sent[:max_len]):
            out[b, s] = idx.get(word, len(vocab))
    return out


def flair_stream(batch_tokens: list[list[str]], max_len: int):
    """Collator flair_ids path (dataset.py:665-698): per sentence a char
    stream [START] w1 ␣ w2 ␣ ... wn [END] with word-boundary positions.

    Returns (flair_ids (B, S), boundary (B, max_len+1), mask (B, S)) —
    boundary padded with -1, ids padded with pad_index, semantics exactly
    the reference's (boundary[i] = index of the separator BEFORE word i;
    last boundary = index of [END])."""
    vocab = flair_vocab()
    idx = {c: i for i, c in enumerate(vocab)}
    start_index, end_index, pad_index = len(vocab), len(vocab) + 1, len(vocab) + 2
    space = idx[" "]

    streams: list[list[int]] = []
    boundaries: list[list[int]] = []
    for sent in batch_tokens:
        sent_ids = [start_index]
        boundary = []
        if sent:
            for word in sent[:-1]:
                boundary.append(len(sent_ids) - 1)
                sent_ids += [idx[c] for c in word if c in idx]
                sent_ids.append(space)
            boundary.append(len(sent_ids) - 1)
            sent_ids += [idx[c] for c in sent[-1] if c in idx]
        sent_ids.append(end_index)
        boundary.append(len(sent_ids) - 1)
        streams.append(sent_ids)
        boundaries.append(boundary)

    flair_max = max((len(s) for s in streams), default=1)
    ids = np.full((len(streams), flair_max), pad_index, dtype=np.int64)
    mask = np.zeros((len(streams), flair_max), dtype=np.int64)
    bnd = np.full((len(streams), max_len + 1), -1, dtype=np.int64)
    for b, (s, bo) in enumerate(zip(streams, boundaries)):
        ids[b, : len(s)] = s
        mask[b, : len(s)] = 1
        bnd[b, : len(bo)] = bo[: max_len + 1]
    return ids, bnd, mask
