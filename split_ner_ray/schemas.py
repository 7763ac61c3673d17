"""Arrow schemas for every table the engine reads or writes.

The input shape is fixed by BASELINE.json ``input_hint``; output shapes by
FIXTURES.md F4/F6. Keeping the schemas in one module lets every stage assert
its contract and keeps ``write_parquet`` output stable across runs (the
resume test depends on byte-stable schemas).
"""

from __future__ import annotations

import pyarrow as pa

# Primary input (BASELINE.json input_hint): one row per conversation turn.
TRANSCRIPTS = pa.schema(
    [
        ("conv_id", pa.string()),
        ("turn_idx", pa.int32()),
        ("role", pa.string()),
        ("text", pa.string()),
        ("tool", pa.string()),
        ("ts", pa.timestamp("us")),
    ]
)

# Detector/typer output: one row per typed mention (char offsets into text).
# Mirrors the reference's Span (evaluator.py:119-133) lifted to char offsets.
MENTIONS = pa.schema(
    [
        ("conv_id", pa.string()),
        ("turn_idx", pa.int32()),
        ("start", pa.int32()),  # char offset, inclusive
        ("end", pa.int32()),  # char offset, exclusive
        ("surface", pa.string()),
        ("etype", pa.string()),
        ("score", pa.float32()),
    ]
)

# Raw (pre-linking) triples with provenance.
RAW_TRIPLES = pa.schema(
    [
        ("subj_surface", pa.string()),
        ("subj_etype", pa.string()),
        ("pred", pa.string()),
        ("obj_surface", pa.string()),
        ("obj_etype", pa.string()),
        ("conv_id", pa.string()),
        ("turn_idx", pa.int32()),
    ]
)

# Final deduplicated triples (FIXTURES.md F4).
TRIPLES = pa.schema(
    [
        ("subj_id", pa.string()),
        ("pred", pa.string()),
        ("obj_id", pa.string()),
        ("conv_id", pa.string()),  # first (min) provenance
        ("turn_idx", pa.int32()),
        ("subj_surface", pa.string()),
        ("obj_surface", pa.string()),
        ("support", pa.int64()),
    ]
)

NODES = pa.schema(
    [
        ("entity_id", pa.string()),
        ("canonical_surface", pa.string()),
        ("etype", pa.string()),
        ("n_mentions", pa.int64()),
    ]
)

EDGES = pa.schema(
    [
        ("src_id", pa.string()),
        ("dst_id", pa.string()),
        ("pred", pa.string()),
        ("weight", pa.int64()),
    ]
)

# Lineage / metrics rows (FIXTURES.md F6) — one per stage per partition.
METRICS = pa.schema(
    [
        ("stage", pa.string()),
        ("partition", pa.int32()),
        ("rows_in", pa.int64()),
        ("rows_out", pa.int64()),
        ("wall_s", pa.float64()),
        ("input_fragments", pa.list_(pa.string())),
    ]
)
