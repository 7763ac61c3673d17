"""Per-partition checkpoint manifests (north rule: "resumes from the last
committed partition"; SURVEY.md §4 Checkpoint/resume row).

The reference checkpoints only model training (HF checkpoints,
additional_args.py:86-87); its prediction runs are all-or-nothing. Our
batch job needs output-side resumability: work is planned as groups of
input parquet FRAGMENTS (file paths — stable across runs, unlike task or
block ids, which shuffles do not preserve), each group's outputs are
written to its own directory and committed by an atomic manifest rename.
On restart, committed groups are filtered out before the pipeline is built.
"""

from __future__ import annotations

import json
import os


def plan_groups(input_path: str | list[str],
                files_per_group: int = 4) -> list[dict]:
    """Deterministic work plan: sorted parquet fragments chunked into
    commit groups. Group identity = its sorted file list, so re-planning
    after a crash yields identical groups. Accepts a directory, a single
    file, or an explicit file list (the auto-routed kg path hands over
    the exact files its Dataset read)."""
    if isinstance(input_path, (list, tuple)):
        files = sorted(input_path)
        groups = []
        for i in range(0, len(files), files_per_group):
            groups.append({"group_id": i // files_per_group,
                           "files": files[i:i + files_per_group]})
        return groups
    if os.path.isdir(input_path):
        files = sorted(
            os.path.join(input_path, f)
            for f in os.listdir(input_path)
            if f.endswith(".parquet")
        )
    else:
        files = [input_path]
    groups = []
    for i in range(0, len(files), files_per_group):
        groups.append({"group_id": i // files_per_group, "files": files[i : i + files_per_group]})
    return groups


def _manifest_dir(out_dir: str) -> str:
    return os.path.join(out_dir, "_manifest")


def manifest_path(out_dir: str, group_id: int) -> str:
    return os.path.join(_manifest_dir(out_dir), f"part-{group_id:05d}.json")


def committed_groups(out_dir: str) -> set[int]:
    d = _manifest_dir(out_dir)
    if not os.path.isdir(d):
        return set()
    out = set()
    for f in os.listdir(d):
        if f.startswith("part-") and f.endswith(".json"):
            out.add(int(f[5:-5]))
    return out


def commit_group(out_dir: str, group_id: int, info: dict) -> None:
    """Atomic commit: write tmp file then rename (POSIX rename is atomic on
    one filesystem) — a crash mid-commit leaves no half manifest."""
    d = _manifest_dir(out_dir)
    os.makedirs(d, exist_ok=True)
    path = manifest_path(out_dir, group_id)
    tmp = path + f".tmp.{os.getpid()}"
    with open(tmp, "w") as f:
        json.dump(info, f, sort_keys=True)
    os.replace(tmp, path)


def read_manifests(out_dir: str) -> list[dict]:
    d = _manifest_dir(out_dir)
    if not os.path.isdir(d):
        return []
    out = []
    for f in sorted(os.listdir(d)):
        if f.startswith("part-") and f.endswith(".json"):
            with open(os.path.join(d, f)) as fh:
                out.append(json.load(fh))
    return out
