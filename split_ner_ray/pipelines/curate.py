"""End-to-end document-curation pipeline: the composition a training-data
user actually runs — quality filter, exact dedup, language-ID, token
counts, partitioned parquet output.

Stage order is the 100 TB order: the cheap vectorized quality filter
prunes FIRST (rows never reach the shuffle), exact dedup then moves only
(md5, id) pairs of survivors through one bucketed aggregate, and the
Bloom semi-join ships a ~512 KiB bitset of keeper ids instead of
shuffling the corpus against the keeper table. Everything streams — the
only driver-sized object is the Bloom bitset.

No single reference analog: composes M10/M13 (tag filter / cleaner,
SURVEY §2.3) with the engine's training-data ops (SURVEY §2.11).
"""

from __future__ import annotations

import os

import pandas as pd

from ..stages.dedup import exact_dedup
from ..stages.relational import bloom_semi_join
from ..stages.text import add_bpe_token_counts, add_langid, add_quality_stats


def curate_documents(ds, *, id_col: str = "doc_id", text_col: str = "text",
                     out_dir: str | None = None, work_dir: str | None = None):
    """Return the curated documents Dataset: quality-passing, exactly
    deduplicated (min-id keeper per content hash), annotated with
    lang_pred / token counts. With ``out_dir``, also stream the result to
    parquet partitioned by lang_pred (one directory per language —
    resumable, and downstream per-language reads prune at the directory
    level).

    ``work_dir``: the quality stage is consumed twice downstream (dedup
    keeper scan, final re-select); a lazy Dataset recomputes it per
    consumer. With work_dir set, the stage is spilled to parquet ONCE
    and each consumer re-reads columnar-pruned — the checkpoint-reuse
    pattern for when the upstream transform is expensive relative to
    columnar IO (model scoring, heavy regex). For this corpus's cheap
    stats the recompute is marginally faster (sf0.1 funnel best-of-3:
    3.6 s lazy vs 3.9 s spilled), so None is the default; the caller
    owns cleanup of work_dir."""
    import ray.data as rd

    quality = add_quality_stats(ds, text_col).map_batches(
        lambda b: b[b["is_quality"] == 1], batch_format="pandas"
    )
    if work_dir is not None:
        quality.write_parquet(work_dir)
        quality = rd.read_parquet(work_dir)
    keepers = exact_dedup(quality, id_col=id_col, text_col=text_col)

    def keep_ids(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({id_col: b["keep_id"].astype("int64")})

    # the keeper-ID set is consumed twice by the Bloom semi-join (bitset
    # build + exact verify); it is ID-ONLY — 8 bytes per distinct doc —
    # so materializing it in the object store is cheap at any scale and
    # saves a full re-execution of the dedup aggregate (unlike the
    # corpus-shaped quality stage, which is spilled via work_dir instead)
    keep_ds = keepers.map_batches(keep_ids, batch_format="pandas").materialize()
    kept = bloom_semi_join(quality, keep_ds, [id_col])
    curated = add_bpe_token_counts(add_langid(kept, text_col), text_col)
    if out_dir is not None:
        # partition-key sort first: otherwise every block splits into
        # every language dir (blocks x langs tiny files)
        curated.sort("lang_pred").write_parquet(
            out_dir, partition_cols=["lang_pred"])
        # hand back the WRITTEN data: returning the lazy graph would make
        # the caller's first consumption re-run the whole pipeline
        # (second Bloom build included)
        return rd.read_parquet(out_dir)
    return curated


def curate_job(input_path: str, out_dir: str, *, id_col: str = "doc_id",
               text_col: str = "text", files_per_group: int = 4,
               stop_after_groups: int | None = None):
    """Resumable curation job under the manifest/commit protocol of
    ``pipelines/checkpointed.build_graph_job`` (north rule: resumes from
    the last committed partition). Safe to re-invoke after a kill.

      A. quality — per commit-group (a chunk of input parquet fragments,
         ``state.manifest.plan_groups``): read -> vectorized quality
         stats -> filter; write each group's survivors to its own parquet
         dir under ``out_dir/_work/quality``; atomic manifest commit per
         group. A kill between the data write and the commit leaves an
         uncommitted group dir, which is DELETED and rewritten on resume
         (write+commit is effectively atomic), so committed groups are
         never double-counted.
      B. global — exact dedup over the phase-A output (min-id keeper per
         content hash: order-insensitive), Bloom re-select, langid + BPE
         counts, write ``out_dir/curated`` partitioned by lang_pred, then
         a final ``_SUCCESS``. Phase B is deterministic in the SET of
         phase-A rows, so a resumed run is row-identical to an
         uninterrupted one; a crash mid-phase-B leaves no _SUCCESS and
         the partial curated dir is deleted and rewritten on resume.

    ``stop_after_groups`` injects a mid-job kill for the resume test.
    Returns the curated Dataset (read back from the committed output).
    """
    import shutil

    import ray.data as rd

    from ..state import manifest as mf

    work = os.path.join(out_dir, "_work", "quality")
    groups = mf.plan_groups(input_path, files_per_group)
    done = mf.committed_groups(work)
    ran = 0
    for g in groups:
        gid = g["group_id"]
        if gid in done:
            continue
        if stop_after_groups is not None and ran >= stop_after_groups:
            break
        ds = rd.read_parquet(g["files"])
        # group-sized materialize: write + count share one execution
        q = add_quality_stats(ds, text_col).map_batches(
            lambda b: b[b["is_quality"] == 1], batch_format="pandas"
        ).materialize()
        gdir = os.path.join(work, f"group={gid:05d}")
        shutil.rmtree(gdir, ignore_errors=True)
        q.write_parquet(gdir)
        mf.commit_group(work, gid, {"group_id": gid,
                                    "input_fragments": g["files"],
                                    "rows_out": q.count()})
        ran += 1
    if stop_after_groups is not None:
        return None  # simulated kill: job "died" before phase B
    have = len(mf.committed_groups(work))
    if have < len(groups):
        raise RuntimeError(
            f"quality phase incomplete: {have}/{len(groups)} groups committed")

    cur_dir = os.path.join(out_dir, "curated")
    success = os.path.join(out_dir, "_SUCCESS")
    if os.path.exists(success):
        return rd.read_parquet(cur_dir)
    files = []
    for g in groups:
        gdir = os.path.join(work, f"group={g['group_id']:05d}")
        files.extend(sorted(os.path.join(gdir, f) for f in os.listdir(gdir)
                            if f.endswith(".parquet")))
    quality = rd.read_parquet(files)
    keepers = exact_dedup(quality, id_col=id_col, text_col=text_col)

    def keep_ids(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({id_col: b["keep_id"].astype("int64")})

    keep_ds = keepers.map_batches(keep_ids, batch_format="pandas").materialize()
    kept = bloom_semi_join(quality, keep_ds, [id_col])
    curated = add_bpe_token_counts(add_langid(kept, text_col), text_col)
    shutil.rmtree(cur_dir, ignore_errors=True)  # partial output from a prior crash
    curated = curated.sort("lang_pred")  # one file per language dir
    curated.write_parquet(cur_dir, partition_cols=["lang_pred"])
    with open(success, "w") as f:
        f.write("ok")
    return rd.read_parquet(cur_dir)
