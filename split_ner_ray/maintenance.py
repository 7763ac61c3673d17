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


def summarize_stats(stats_text: str) -> list[dict]:
    """Parse ``Dataset.stats()`` output into per-operator rows
    [{operator, wall_s, rows_out}] — the at-a-glance view for deciding
    which stage of a pipeline to tune (the loop the driver brief
    prescribes: read stats, iterate until useful compute dominates).
    Tolerant of format drift: unrecognized sections are skipped, missing
    fields are None."""
    import re

    rows: list[dict] = []
    op = None
    for line in stats_text.splitlines():
        m = re.match(
            r"Operator (\d+) (.+?): (\d+) tasks executed, "
            r"\d+ blocks produced in ([\d.]+)s", line)
        if m:
            op = {"operator": m.group(2), "n_tasks": int(m.group(3)),
                  "wall_s": float(m.group(4)), "rows_out": None}
            rows.append(op)
            continue
        if op is not None:
            m = re.search(r"Output num rows per block: .*?, (\d+) total", line)
            if m:
                op["rows_out"] = int(m.group(1))
    return rows
