"""Corpus converter (reference op R5): char-offset annotations -> canonical
token-level BIO TSV, reproducing the reference's alignment math.

The reference converts each raw public corpus (WNUT, BioNLP13CG, MIT, ...)
with ~300 lines of char-offset -> token-span alignment
(`/root/reference/splitner/utils/generate_bio.py:31-84` make_entry_context,
`utils/general.py:313-605`). This module lifts that converter to a batch
operator over a Dataset of standoff-annotated documents
(doc_id, text, annotations=[(tag, start_char, end_char), ...]) and emits
the SENTENCE_SCHEMA rows / TSV files the R1 reader consumes.

Alignment contract (generate_bio.py:42-66, reproduced exactly):
- tokenizer: ``re.split`` on the reference's punctuation/whitespace class,
  keeping char offsets, dropping whitespace-only pieces;
- overlap resolution: annotations are processed in file order; one whose
  start precedes the previous kept annotation's end is DROPPED and counted
  as an overlap error (generate_bio.py:42-50);
- B- goes to the token whose start char == annotation start; I- to each
  later token fully inside the annotation; an annotation whose boundaries
  never coincide with token boundaries is counted as a boundary error
  (its partial B-/I- writes are kept, as in the reference);
- long texts split into sentences after 300 tokens at the next "." token
  (generate_bio.py:71-82).
"""

from __future__ import annotations

import re

import pyarrow as pa

from .tsv import SENTENCE_SCHEMA

# the reference's tokenizer class VERBATIM (generate_bio.py:32). Note the
# `+-=` inside the character class is a RANGE (0x2B..0x3D), covering
# `+,-./0123456789:;<=` — so digit runs tokenize as single characters
# ('2015' -> '2','0','1','5'), exactly as the reference converter does;
# the executed-reference parity test asserts this pattern matches the one
# in the reference source character for character.
_SPLIT_RE = re.compile(r"""([,;.!?:'"/|_@#$%^&*~`+-=<>()\[\]{}]|\s+)""")
_SPLIT_LEN = 300


def tokenize_standoff(text: str) -> list[tuple[str, int, int]]:
    """-> [(token, start_char, end_char)] with reference tokenization."""
    out = []
    end = 0
    for piece in _SPLIT_RE.split(text):
        start = end
        end = start + len(piece)
        tok = piece.strip()
        if tok:
            out.append((tok, start, end))
    return out


def align_char_spans(
    text: str, annotations: list[tuple[str, int, int]]
) -> tuple[list[tuple[list[str], list[str]]], int]:
    """One document -> ([(tokens, tags)] sentences, error_count)."""
    toks = tokenize_standoff(text)
    tags = ["O"] * len(toks)
    errors = 0

    # overlap resolution in input order (generate_bio.py:42-50)
    kept = []
    cursor = 0
    for tag, start, end in annotations:
        if start >= cursor:
            kept.append((tag, start, end))
            cursor = end
        else:
            errors += 1

    for tag, start, end in kept:
        found_start = found_end = False
        for i, (_t, ts, te) in enumerate(toks):
            if ts == start:
                tags[i] = f"B-{tag}"
                found_start = True
            elif found_start and ts > start and te <= end:
                tags[i] = f"I-{tag}"
            if te == end:
                found_end = True
                break
        if not (found_start and found_end):
            errors += 1

    # sentence split: after _SPLIT_LEN tokens, break at the next "."
    sentences = []
    start_i = 0
    do_split = False
    for i in range(len(toks)):
        if i - start_i >= _SPLIT_LEN:
            do_split = True
        if do_split and toks[i][0] == ".":
            sentences.append((
                [t for t, _s, _e in toks[start_i: i + 1]],
                tags[start_i: i + 1],
            ))
            start_i = i + 1
            do_split = False
    if start_i < len(toks):
        sentences.append(([t for t, _s, _e in toks[start_i:]], tags[start_i:]))
    return sentences, errors


def convert_standoff_docs(ds, *, doc_id_col: str = "doc_id",
                          text_col: str = "text",
                          ann_col: str = "annotations"):
    """Dataset of standoff documents -> SENTENCE_SCHEMA sentence rows.
    ``annotations`` is list<struct<tag, start, end>> (or list of dicts).
    Embarrassingly parallel map_batches; POS/dep columns are left empty
    (the reference fills them with a spaCy pass — out of sandbox scope)."""

    def per_batch(batch: pa.Table) -> pa.Table:
        cols = {n: [] for n in SENTENCE_SCHEMA.names}
        for doc_id, text, anns in zip(
            batch.column(doc_id_col).to_pylist(),
            batch.column(text_col).to_pylist(),
            batch.column(ann_col).to_pylist(),
        ):
            triples = [(a["tag"], int(a["start"]), int(a["end"])) for a in anns]
            sentences, _errors = align_char_spans(text, triples)
            for idx, (toks, tags) in enumerate(sentences):
                cols["sent_idx"].append(idx)
                cols["source_file"].append(str(doc_id))
                cols["tokens"].append(toks)
                cols["pos"].append([""] * len(toks))
                cols["dep"].append([""] * len(toks))
                cols["tags"].append(tags)
        return pa.Table.from_pydict(cols, schema=SENTENCE_SCHEMA)

    return ds.map_batches(per_batch, batch_format="pyarrow", zero_copy_batch=True)


def write_sentences_tsv(sentences: list[tuple[list[str], list[str]]],
                        out_path: str) -> int:
    """Sentences -> the canonical 4-col TSV (write_token_data shape,
    general.py:347-353); returns sentence count."""
    with open(out_path, "w", encoding="utf-8") as f:
        for toks, tags in sentences:
            for tok, tag in zip(toks, tags):
                f.write(f"{tok}\t\t\t{tag}\n")
            f.write("\n")
    return len(sentences)
