"""WordPiece subtoken tokenization + token alignment (reference op M4).

The reference builds `BertToken` records per WordPiece sub-token with a
back-pointer to the source word (`utils/general.py:39-52`; alignment loop
`dataset.py:394-419` via HF `return_offsets_mapping`). transformers is not
installed in this sandbox, so this module implements the standard greedy
longest-match-first WordPiece algorithm in pure Python (the same algorithm
HF's BertTokenizer uses) and the same alignment structure as plain arrays:

    (sub_text, word_offset, is_head, token_type)

word_offset is the index of the source word (`BertToken.token.offset` —
the pointer mapping1/mapping2 decode walks), is_head marks the first
sub-token of each word (`BertToken.is_head`), token_type distinguishes
query (0) vs sentence (1) segments. `subtoken_grid` regroups per-sub-token
model predictions back onto the word grid — exactly the input shape
`functions/decode.consistency_vote_assign` (mapping2) and first-wins
(mapping1) consume.
"""

from __future__ import annotations

UNK = "[UNK]"


def wordpiece_tokenize(word: str, vocab: set[str], *, max_chars: int = 100) -> list[str]:
    """Greedy longest-match-first WordPiece split of one word; continuation
    pieces carry the '##' prefix; an unmatchable word becomes [UNK]."""
    if len(word) > max_chars:
        return [UNK]
    pieces: list[str] = []
    start = 0
    n = len(word)
    while start < n:
        end = n
        cur = None
        while start < end:
            sub = word[start:end]
            if start > 0:
                sub = "##" + sub
            if sub in vocab:
                cur = sub
                break
            end -= 1
        if cur is None:
            return [UNK]
        pieces.append(cur)
        start = end
    return pieces or [UNK]


def align_subtokens(
    words: list[str], vocab: set[str], *, token_type: int = 1
) -> dict[str, list]:
    """Words -> flat aligned sub-token arrays (the BertToken structure as
    columns): sub_text, word_offset (source-word index), is_head,
    token_type. One entry per sub-token, words in order."""
    sub_text: list[str] = []
    word_offset: list[int] = []
    is_head: list[bool] = []
    for wi, w in enumerate(words):
        for i, piece in enumerate(wordpiece_tokenize(w, vocab)):
            sub_text.append(piece)
            word_offset.append(wi)
            is_head.append(i == 0)
    return {
        "sub_text": sub_text,
        "word_offset": word_offset,
        "is_head": is_head,
        "token_type": [token_type] * len(sub_text),
    }


def subtoken_grid(
    n_words: int, word_offset: list[int], preds: list[str]
) -> list[list[str]]:
    """Per-sub-token prediction chars -> per-word lists (head first) — the
    token_preds input of consistency_vote_assign / the walk order of
    mapping1 (main_qa.py:128-150)."""
    grid: list[list[str]] = [[] for _ in range(n_words)]
    for off, p in zip(word_offset, preds):
        if 0 <= off < n_words:
            grid[off].append(p)
    return grid


def default_wordpiece_vocab(corpus_words: list[str] | None = None) -> set[str]:
    """A deterministic sandbox vocab: single characters + '##'-prefixed
    characters (always sufficient to avoid [UNK] for ASCII words), plus
    whole words / prefixes harvested from an optional corpus sample —
    enough structure to produce realistic multi-sub-token splits."""
    import string

    chars = string.ascii_letters + string.digits + "-_'."
    vocab = set(chars) | {f"##{c}" for c in chars}
    for w in corpus_words or []:
        if len(w) > 3:
            vocab.add(w[:4])  # common stems as head pieces
        vocab.add(w)
    return vocab
