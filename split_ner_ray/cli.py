"""Job entry point for ``ray job submit`` (north rule contract).

    ray job submit -- python -m split_ner_ray.cli build --config job.json
    python -m split_ner_ray.cli build --input DIR --output DIR [--resume]

Owns the Ray session (the only module besides bench.py and the test
fixture allowed to call ray.init); the library never does.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

from .config import PipelineConfig


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(prog="split_ner_ray")
    sub = ap.add_subparsers(dest="cmd", required=True)

    b = sub.add_parser("build", help="run the checkpointed KG-construction job")
    b.add_argument("--config", help="JSON config file (PipelineConfig keys)")
    b.add_argument("--input", help="transcripts parquet dir (overrides config)")
    b.add_argument("--output", help="output dir (overrides config)")
    b.add_argument("--num-cpus", type=int, default=int(os.environ.get("RAY_GRAFT_CPUS", "32")))
    b.add_argument("--no-resume", action="store_true",
                   help="fail instead of skipping committed partitions")

    c = sub.add_parser("curate", help="run the document-curation pipeline")
    c.add_argument("--input", required=True, help="documents parquet dir/file")
    c.add_argument("--output", required=True, help="curated parquet output dir")
    c.add_argument("--resumable", action="store_true",
                   help="manifest-committed job (curate_job): safe to "
                        "re-invoke after a kill; resumes from the last "
                        "committed quality group")
    c.add_argument("--files-per-group", type=int, default=4,
                   help="input fragments per commit group (--resumable)")
    c.add_argument("--num-cpus", type=int,
                   default=int(os.environ.get("RAY_GRAFT_CPUS", "32")))

    k = sub.add_parser("compact", help="coalesce small parquet files")
    k.add_argument("--input", required=True)
    k.add_argument("--output", required=True)
    k.add_argument("--target-file-mb", type=int, default=256)
    k.add_argument("--num-cpus", type=int,
                   default=int(os.environ.get("RAY_GRAFT_CPUS", "32")))

    # incremental-dedup index lifecycle (the crawl loop: build the corpus
    # index once; per crawl, probe the delta, append its keepers; compact
    # periodically)
    x = sub.add_parser("index", help="persistent MinHash-LSH dedup index")
    x.add_argument("action", choices=["build", "append", "probe", "compact"])
    x.add_argument("--index", required=True, help="index directory")
    x.add_argument("--input", help="documents parquet (build/append/probe)")
    x.add_argument("--output", help="pairs parquet output dir (probe)")
    x.add_argument("--threshold", type=float, default=0.9,
                   help="verify threshold (probe)")
    x.add_argument("--num-cpus", type=int,
                   default=int(os.environ.get("RAY_GRAFT_CPUS", "32")))

    args = ap.parse_args(argv)

    if args.cmd == "index":
        import ray

        ray.init(address="local", num_cpus=args.num_cpus,
                 include_dashboard=False, ignore_reinit_error=True,
                 logging_level="ERROR")
        try:
            from ray.data import DataContext

            DataContext.get_current().enable_progress_bars = False
            import ray.data as rd

            from .stages import dedup as dd

            if args.action == "compact":
                dd.minhash_index_compact(args.index)
                print(json.dumps({"index": args.index, "compacted": True}))
                return 0
            if not args.input:
                ap.error("index build/append/probe need --input")
            docs = rd.read_parquet(args.input)
            if args.action == "build":
                meta = dd.minhash_index_build(docs, args.index)
                print(json.dumps({"index": args.index, "meta": meta}))
            elif args.action == "append":
                meta = dd.minhash_index_append(docs, args.index)
                print(json.dumps({"index": args.index, "meta": meta,
                                  "appended": docs.count()}))
            else:  # probe
                pairs = dd.minhash_dups_against_index(
                    docs, args.index,
                    verify_threshold=args.threshold).materialize()
                n = pairs.count()
                if args.output:
                    pairs.write_parquet(args.output)
                print(json.dumps({"index": args.index, "pairs": n,
                                  "output_dir": args.output}))
            return 0
        finally:
            ray.shutdown()

    if args.cmd in ("curate", "compact"):
        import ray

        ray.init(address="local", num_cpus=args.num_cpus,
                 include_dashboard=False, ignore_reinit_error=True,
                 logging_level="ERROR")
        try:
            from ray.data import DataContext

            DataContext.get_current().enable_progress_bars = False
            if args.cmd == "curate":
                import ray.data as rd

                from .pipelines.curate import curate_documents, curate_job

                if args.resumable:
                    out = curate_job(args.input, args.output,
                                     files_per_group=args.files_per_group)
                else:
                    out = curate_documents(rd.read_parquet(args.input),
                                           out_dir=args.output)
                print(json.dumps({"kept_docs": out.count(),
                                  "output_dir": args.output}))
            else:
                from .maintenance import compact_parquet

                n = compact_parquet(args.input, args.output,
                                    target_file_mb=args.target_file_mb)
                print(json.dumps({"output_files": n,
                                  "output_dir": args.output}))
            return 0
        finally:
            ray.shutdown()
    cfg = PipelineConfig.from_json(args.config) if args.config else PipelineConfig()
    if args.input:
        cfg.input_path = args.input
    if args.output:
        cfg.output_dir = args.output
    if not cfg.input_path or not cfg.output_dir:
        ap.error("need --input and --output (or a config providing them)")

    import ray

    ray.init(
        address="local",
        num_cpus=args.num_cpus,
        include_dashboard=False,
        ignore_reinit_error=True,
        logging_level="ERROR",
    )
    try:
        from ray.data import DataContext

        DataContext.get_current().enable_progress_bars = False

        from .pipelines.checkpointed import build_graph_job
        from .state import manifest as mf

        if args.no_resume or not cfg.resume:
            done = mf.committed_groups(os.path.join(cfg.output_dir, "_work"))
            if done:
                print(f"error: {len(done)} committed groups exist; rerun without --no-resume",
                      file=sys.stderr)
                return 2
        out = build_graph_job(
            cfg.input_path,
            cfg.output_dir,
            files_per_group=cfg.files_per_group,
            concurrency=(cfg.min_actors, cfg.max_actors),
            batch_size=cfg.batch_size,
            window_turns=cfg.window_turns,
            max_tokens=cfg.max_tokens,
            scorer=cfg.detector_backend,
            decode_mode=cfg.decode_mode,
            context_mode=cfg.context_retrieval,
            link_sim_threshold=cfg.link_sim_threshold,
        )
        summary = {
            "triples": out["triples"].count(),
            "nodes": out["nodes"].count(),
            "edges": out["edges"].count(),
            "output_dir": cfg.output_dir,
        }
        print(json.dumps(summary))
        return 0
    finally:
        ray.shutdown()


if __name__ == "__main__":
    raise SystemExit(main())
