"""Per-corpus raw-format parsers (reference op R5's format layer).

The generic standoff converter (sources/convert.py) reproduces the hard
char-offset alignment math; this module adds the reference's FORMAT
parsers, so a user holding an actual WNUT / MIT / ATIS raw file gets the
same canonical 4-column TSV the R1 reader consumes:

- read_raw_blocks  == reference read_data (general.py:186-199): blank-line
  separated sentences of sep-split tuples;
- wnut  == read_wnut_data (general.py:399-407): lines are "token<TAB>tag";
- mit   == read_mit_data (general.py:313-321): lines are "tag<TAB>token"
  (the .bio layout of the MIT movie/restaurant corpora);
- atis  == read_atis_data (general.py:415-426): one line per sentence,
  "token sent<TAB>tag sent", both wrapped in BOS/EOS markers that are
  stripped ([1:-1]).

POS/dep columns are written empty — the reference fills them with a spaCy
pass (add_pos_dep_features, general.py:325-345), which is out of sandbox
scope and orthogonal to the format parsing. Output goes through
write_token_data's exact 4-column shape (general.py:347-353), so
parse -> write -> read_tsv_corpus round-trips with span-F1 1.0 (tested).
"""

from __future__ import annotations

from .convert import write_sentences_tsv

Sent = tuple[list[str], list[str]]  # (tokens, tags)


def read_raw_blocks(path: str, sep: str = "\t") -> list[list[list[str]]]:
    """Reference read_data semantics (general.py:186-199): returns
    sentences as lists of sep-split line tuples; a trailing sentence
    without a closing blank line is kept."""
    data: list[list[list[str]]] = []
    sent: list[list[str]] = []
    with open(path, "r", encoding="utf-8") as f:
        for line in f:
            line = line.strip()
            if line:
                sent.append(line.split(sep))
            else:
                data.append(sent)
                sent = []
    if sent:
        data.append(sent)
    return data


def parse_wnut(path: str) -> list[Sent]:
    """WNUT raw file -> sentences (read_wnut_data: token first, tag second)."""
    out = []
    for block in read_raw_blocks(path):
        out.append(([t[0] for t in block], [t[1] for t in block]))
    return out


def parse_mit(path: str) -> list[Sent]:
    """MIT movie/restaurant .bio file -> sentences (read_mit_data: tag
    first, token second)."""
    out = []
    for block in read_raw_blocks(path):
        out.append(([t[1] for t in block], [t[0] for t in block]))
    return out


def parse_atis(path: str) -> list[Sent]:
    """ATIS iob file -> sentences (read_atis_data: 'tokens<TAB>tags' per
    line, BOS/EOS wrappers stripped)."""
    out = []
    with open(path, "r", encoding="utf-8") as f:
        for line in f:
            if not line.strip():
                continue
            tok_sent, tag_sent = line.split("\t")
            tokens = tok_sent.split()[1:-1]
            tags = tag_sent.split()[1:-1]
            out.append((tokens, tags))
    return out


PARSERS = {"wnut": parse_wnut, "mit": parse_mit, "atis": parse_atis}


def tag_vocab(sentences: list[Sent]) -> list[str]:
    """Sorted distinct tag vocabulary (generate_dataset_files,
    general.py:377-395)."""
    return sorted({tag for _toks, tags in sentences for tag in tags})


def convert_corpus_file(in_path: str, fmt: str, out_tsv: str) -> int:
    """Raw corpus file -> canonical 4-col TSV for the R1 reader; returns
    the sentence count."""
    try:
        parser = PARSERS[fmt]
    except KeyError:
        raise ValueError(f"unknown corpus format {fmt!r}; known: {sorted(PARSERS)}")
    sentences = parser(in_path)
    return write_sentences_tsv(sentences, out_tsv)
