"""Dataset maintenance utilities: small-file compaction.

A 100 TB corpus accumulates small parquet files (per-shard resumable
writes, incremental appends); reads then pay per-file open/footer costs
and lose row-group pruning. Compaction rewrites a directory to
~target-sized files with a block-count repartition — a split/coalesce of
existing blocks (NOT an all-to-all shuffle; row order within blocks is
preserved, global order is not guaranteed, same as any parallel write).
"""

from __future__ import annotations

import os


def dir_parquet_bytes(path: str) -> int:
    """Total on-disk bytes of the parquet files under ``path``."""
    total = 0
    for root, _dirs, files in os.walk(path):
        for f in files:
            if f.endswith(".parquet"):
                total += os.path.getsize(os.path.join(root, f))
    return total


def compact_parquet(in_path: str, out_path: str, *,
                    target_file_mb: int = 256) -> int:
    """Rewrite ``in_path``'s parquet files into ``out_path`` at
    ~``target_file_mb`` per file (compressed, estimated from the INPUT's
    on-disk bytes). Returns the number of output files requested. The
    write itself streams — no driver materialization."""
    import ray.data as rd

    n_files = max(1, -(-dir_parquet_bytes(in_path) // (target_file_mb << 20)))
    rd.read_parquet(in_path).repartition(n_files).write_parquet(out_path)
    return n_files
