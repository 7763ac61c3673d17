"""JSONL / CSV document-table sources and sinks.

The reference ingests TSV sentence files (sources/tsv.py mirrors that,
c3sr/split-ner dataset.py:149-171); real training-data corpora arrive as
JSONL or CSV shards. These wrappers keep the engine's documents schema
(doc_id, text, ...) over ray.data's native readers — block-parallel,
streaming, no driver materialization — and the sinks write one file per
block so a failed run resumes per shard (the brief's resumable-output
rule; same contract as pipelines/checkpointed.py).
"""

from __future__ import annotations

import ray.data as rd


def read_documents_jsonl(path: str, *, columns: list[str] | None = None):
    """Read a JSONL documents corpus (one JSON object per line; file or
    directory of shards). Column pruning happens right after parse —
    JSON is row-major, so unlike parquet the reader must touch every
    byte; convert hot corpora to parquet for the columns= pushdown."""
    ds = rd.read_json(path)
    return ds.select_columns(columns) if columns else ds


def read_documents_csv(path: str, *, columns: list[str] | None = None):
    """Read a CSV documents corpus (file or directory of shards)."""
    ds = rd.read_csv(path)
    return ds.select_columns(columns) if columns else ds


def write_documents_jsonl(ds, path: str):
    """Write a dataset as JSONL shards (one file per block)."""
    ds.write_json(path)
