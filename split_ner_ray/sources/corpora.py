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
  stripped ([1:-1]);
- conllpp == read_conllpp_data (general.py:533-543): space-separated
  4 columns with '-X-' POS placeholder -> 'O';
- onto2012 == read_onto_data + process_onto_entity_spans
  (general.py:434-478): CoNLL-2012 gold_conll with parenthesized NE
  span markers in column 10 -> BIO;
- onto_final == read_onto_final_data (general.py:560-576): parallel
  .words/.ner files with per-sentence length assertions.

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


SentP = tuple[list[str], list[str], list[str]]  # (tokens, pos, tags)


def parse_conllpp(path: str) -> list[SentP]:
    """CoNLL++ raw file -> sentences (read_conllpp_data,
    general.py:533-543): space-separated 4 columns, token=col0,
    pos=col1 with the '-X-' placeholder rewritten to 'O', tag=col3."""
    out = []
    for block in read_raw_blocks(path, sep=" "):
        toks = [t[0] for t in block]
        pos = ["O" if t[1] == "-X-" else t[1] for t in block]
        tags = [t[3] for t in block]
        out.append((toks, pos, tags))
    return out


def _onto_spans_to_bio(tags: list[str]) -> list[str]:
    """CoNLL-2012 NE column -> BIO (process_onto_entity_spans,
    general.py:464-478): '(' opens a span whose type is the cell minus its
    first and last char (covers both '(PERSON)' and '(ORG*'), ')' closes
    the most recently opened span; everything else is filler. The
    reference's span list is processed in order with partial overwrites
    exactly as its two write loops do."""
    spans: list[list] = []  # [tag, start, end]
    for i, cell in enumerate(tags):
        if cell.startswith("("):
            spans.append([cell[1:-1], i, i])
        if cell.endswith(")"):
            spans[-1][2] = i
    bio = ["O"] * len(tags)
    for tag, start, end in spans:
        bio[start] = f"B-{tag}"
        for i in range(start + 1, end + 1):
            bio[i] = f"I-{tag}"
    return bio


def parse_onto_conll2012(path: str) -> list[SentP]:
    """OntoNotes CoNLL-2012 gold_conll file -> BIO sentences
    (read_onto_data, general.py:434-461 + process_onto_entity_spans):
    '#begin/#end document' lines skipped, blank or <11-field lines are
    sentence boundaries, text=col3, pos=col4, NE=col10."""
    out: list[SentP] = []
    toks: list[str] = []
    pos: list[str] = []
    ne: list[str] = []

    def flush():
        if toks:
            out.append((toks.copy(), pos.copy(), _onto_spans_to_bio(ne)))
            toks.clear(), pos.clear(), ne.clear()

    with open(path, "r", encoding="utf-8") as f:
        for line in f:
            line = line.strip()
            if line.startswith("#begin document") or line.startswith("#end document"):
                continue
            s = line.split()
            if not line or len(s) < 11:
                flush()
                continue
            toks.append(s[3])
            pos.append(s[4])
            ne.append(s[10])
    flush()
    return out


def parse_onto_final(words_path: str, labels_path: str) -> list[Sent]:
    """Parallel .words/.ner files -> sentences (read_onto_final_data,
    general.py:560-576), with the reference's per-sentence length
    assertion."""
    with open(words_path, "r", encoding="utf-8") as f:
        text = [line.split() for line in f]
    with open(labels_path, "r", encoding="utf-8") as f:
        labels = [line.split() for line in f]
    out = []
    for i, (toks, tags) in enumerate(zip(text, labels)):
        assert len(toks) == len(tags), (
            f"Error parsing sent: {i} (text: {len(toks)}, labels: {len(tags)})"
        )
        out.append((toks, tags))
    return out


def write_sentences_tsv_pos(sentences: list[SentP], out_path: str) -> int:
    """(tokens, pos, tags) sentences -> canonical 4-col TSV with the POS
    column filled (write_token_data shape, general.py:347-353)."""
    with open(out_path, "w", encoding="utf-8") as f:
        for toks, pos, tags in sentences:
            for tok, p, tag in zip(toks, pos, tags):
                f.write(f"{tok}\t{p}\t\t{tag}\n")
            f.write("\n")
    return len(sentences)


PARSERS = {"wnut": parse_wnut, "mit": parse_mit, "atis": parse_atis}


def tag_vocab(sentences: list[Sent]) -> list[str]:
    """Sorted distinct tag vocabulary (generate_dataset_files,
    general.py:377-395)."""
    return sorted({tag for _toks, tags in sentences for tag in tags})


POS_PARSERS = {"conllpp": parse_conllpp, "onto2012": parse_onto_conll2012}


def convert_corpus_file(
    in_path: str, fmt: str, out_tsv: str, labels_path: str | None = None
) -> int:
    """Raw corpus file -> canonical 4-col TSV for the R1 reader; returns
    the sentence count. ``labels_path`` is required only for the
    'onto_final' parallel words/ner layout."""
    if fmt == "onto_final":
        if labels_path is None:
            raise ValueError("onto_final needs labels_path (.ner file)")
        return write_sentences_tsv(parse_onto_final(in_path, labels_path), out_tsv)
    if fmt in POS_PARSERS:
        return write_sentences_tsv_pos(POS_PARSERS[fmt](in_path), out_tsv)
    try:
        parser = PARSERS[fmt]
    except KeyError:
        known = sorted([*PARSERS, *POS_PARSERS, "onto_final"])
        raise ValueError(f"unknown corpus format {fmt!r}; known: {known}")
    sentences = parser(in_path)
    return write_sentences_tsv(sentences, out_tsv)
