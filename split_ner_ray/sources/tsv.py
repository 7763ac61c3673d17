"""Reference-format TSV corpus reader/writer (ops R1/R3, FIXTURES.md F3).

The reference's on-disk corpus is a 4-column TSV — ``<Token>\\t<POS>\\t<Dep>
\\t<NER tag>`` with blank-line sentence separators (data/README.md "Dataset
Format", reader splitner/dataset.py:149-171). Sentences must not be split
across block boundaries, so the Ray reader parses per FILE (fixture corpora
are file-sharded) via read_binary_files -> one row per sentence with list
columns. Prediction TSVs ((token, gold, pred) rows, main_qa.py:101-108) use
the same shape with 2 tag columns.
"""

from __future__ import annotations

import pyarrow as pa

SENTENCE_SCHEMA = pa.schema(
    [
        ("sent_idx", pa.int64()),
        ("source_file", pa.string()),
        ("tokens", pa.list_(pa.string())),
        ("pos", pa.list_(pa.string())),
        ("dep", pa.list_(pa.string())),
        ("tags", pa.list_(pa.string())),
    ]
)


def parse_tsv_sentences(data: bytes, source: str) -> pa.Table:
    """One TSV file -> sentence rows. Token lines keep only tags[0]
    semantics downstream (dataset.py:356 uses the first tag)."""
    cols = {n: [] for n in SENTENCE_SCHEMA.names}
    toks, pos, dep, tags = [], [], [], []
    idx = 0
    for line in data.decode("utf-8").splitlines():
        line = line.strip("\n")
        if line.strip():
            parts = line.split("\t")
            toks.append(parts[0])
            pos.append(parts[1] if len(parts) > 1 else "")
            dep.append(parts[2] if len(parts) > 2 else "")
            tags.append(parts[3] if len(parts) > 3 else "O")
        elif toks:
            cols["sent_idx"].append(idx)
            cols["source_file"].append(source)
            cols["tokens"].append(toks)
            cols["pos"].append(pos)
            cols["dep"].append(dep)
            cols["tags"].append(tags)
            toks, pos, dep, tags = [], [], [], []
            idx += 1
    if toks:
        cols["sent_idx"].append(idx)
        cols["source_file"].append(source)
        cols["tokens"].append(toks)
        cols["pos"].append(pos)
        cols["dep"].append(dep)
        cols["tags"].append(tags)
    return pa.Table.from_pydict(cols, schema=SENTENCE_SCHEMA)


def read_tsv_corpus(path: str):
    """Ray Data reader: one task per file, sentences never straddle tasks."""
    import ray.data as rd

    files = rd.read_binary_files(path, include_paths=True)

    def parse(batch: pa.Table) -> pa.Table:
        tables = [
            parse_tsv_sentences(data, p)
            for p, data in zip(batch.column("path").to_pylist(), batch.column("bytes").to_pylist())
        ]
        return pa.concat_tables(tables) if tables else pa.Table.from_pydict(
            {n: [] for n in SENTENCE_SCHEMA.names}, schema=SENTENCE_SCHEMA
        )

    return files.map_batches(parse, batch_format="pyarrow")


def write_bioe_fixture(transcripts: pa.Table, out_path: str,
                       max_tokens: int | None = None) -> int:
    """FIXTURES.md F3: turns -> reference-shape TSV with gold BIO tags from
    the rule core (the eval-corpus stand-in for WNUT17/OntoNotes fixtures).
    Returns sentence count."""
    from .. import rules
    from ..functions.decode import first_wins_assign
    from ..functions.tokenize import tokenize_with_offsets

    max_tokens = max_tokens or rules.MAX_TOKENS_DEFAULT
    n = 0
    with open(out_path, "w", encoding="utf-8") as f:
        for text in transcripts.column("text").to_pylist():
            spans = tokenize_with_offsets(text)
            if not spans:
                continue
            mentions = rules.detect_typed_mentions(text, max_tokens)
            starts = {s: i for i, (s, _e) in enumerate(spans)}
            ends = {e: i for i, (_s, e) in enumerate(spans)}
            proposals = []
            for m in sorted(mentions, key=lambda m: (m.start, -(m.end - m.start))):
                ti, tj = starts.get(m.start), ends.get(m.end)
                if ti is not None and tj is not None:
                    proposals.append((ti, tj, m.etype))
            tags = first_wins_assign(len(spans), proposals)
            for (s, e), tag in zip(spans, tags):
                f.write(f"{text[s:e]}\tX\tx\t{tag}\n")
            f.write("\n")
            n += 1
    return n
