"""Sequence packing for LLM training-data preparation.

GPT-style concat-then-chunk packing: documents are laid end to end in a
deterministic key order into one global token stream, which is cut into
fixed-length training sequences ("packs"). Each document's placement is a
pure function of the global token offsets, so the assignment is computed
distributed — ``relational.global_prefix_sums`` (two-level range scan, no
global sort) supplies each doc's exclusive token offset, and the pack
span is integer arithmetic per row. Exactly SQL-checkable
(SUM(n) OVER (ORDER BY id) window).

No reference analog (SURVEY §2.11); this is the last mile between a
curated corpus and a token-budgeted training run — per-pack manifests
let a trainer read exactly the docs of its shard.
"""

from __future__ import annotations

import numpy as np
import pandas as pd


def pack_sequences(ds, *, id_col: str = "doc_id", text_col: str = "text",
                   seq_len: int = 512, num_ranges: int = 256):
    """Assign every document its span in the packed token stream:
    (id, n_tokens, tok_start, tok_end, pack_first, pack_last) with
    tok_start = sum of token counts over all smaller ids,
    pack = tok // seq_len. A document with more tokens than the tail of
    its pack continues into the next (concat-then-chunk semantics — no
    padding waste, long docs split across packs); empty docs occupy zero
    tokens and land on the boundary pack. Token counts use whitespace
    tokenization (swap in a tokenizer actor upstream for BPE-exact
    packing)."""
    from .relational import global_prefix_sums

    def counts(b: pd.DataFrame) -> pd.DataFrame:
        toks = b[text_col].str.split()
        return pd.DataFrame({
            id_col: b[id_col].astype("int64"),
            "n_tokens": toks.map(len).astype("int64"),
        })

    sized = ds.map_batches(counts, batch_format="pandas")
    offs = global_prefix_sums(sized, id_col, "n_tokens",
                              num_ranges=num_ranges)

    def spans(b: pd.DataFrame) -> pd.DataFrame:
        start = b["offset"].to_numpy(dtype=np.int64)
        n = b["n_tokens"].to_numpy(dtype=np.int64)
        end = start + n
        last_tok = np.maximum(end - 1, start)  # empty doc -> boundary pack
        return pd.DataFrame({
            id_col: b[id_col].astype("int64"),
            "n_tokens": n,
            "tok_start": start,
            "tok_end": end,
            "pack_first": start // seq_len,
            "pack_last": last_tok // seq_len,
        })

    return offs.map_batches(spans, batch_format="pandas")
