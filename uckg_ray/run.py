"""CLI entry point — the `ray job submit` lifecycle (SURVEY.md §3.4):

    ray job submit -- python -m uckg_ray.run \
        --input /path/to/transcripts --fixtures /path/to/dicts \
        --output /path/to/out [--files-per-group N] [--no-canonicalize]
        [--no-resume]

Or against a driver testdata sf dir (fixtures auto-generated):

    python -m uckg_ray.run --sf /root/testdata/sf0.01 --output /tmp/kg

This script owns the Ray session (guarded init — inside `ray job submit`
the cluster is already up). Library code never calls ray.init.
"""

from __future__ import annotations

import argparse
import json
import sys


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(prog="python -m uckg_ray.run")
    ap.add_argument("--input", help="transcript parquet dir")
    ap.add_argument("--fixtures", help="dictionary parquet dir")
    ap.add_argument("--sf", help="driver sf dir (auto-generates fixtures)")
    ap.add_argument("--output", required=True)
    ap.add_argument("--files-per-group", type=int, default=None)
    ap.add_argument("--no-canonicalize", action="store_true")
    ap.add_argument("--no-resume", action="store_true")
    ap.add_argument("--incremental", action="store_true",
                    help="daily re-sync mode: detect changed/added/removed "
                         "input files via group manifests, re-extract only "
                         "the affected file-keyed groups, re-merge, and "
                         "report the graph-level edge diff")
    ap.add_argument("--num-cpus", type=int, default=None,
                    help="only used when starting a local session")
    ap.add_argument("--status", action="store_true",
                    help="report build status for --output and exit "
                         "(no Ray session needed)")
    args = ap.parse_args(argv)

    if args.status:
        from uckg_ray.state.manifest import build_status
        print(json.dumps(build_status(args.output)))
        return 0

    import ray
    if not ray.is_initialized():
        kw = {"include_dashboard": False, "logging_level": "ERROR"}
        if args.num_cpus:
            kw["num_cpus"] = args.num_cpus
        ray.init(address="local", **kw)
    from ray.data import DataContext
    DataContext.get_current().enable_progress_bars = False

    from uckg_ray.config import PipelineConfig
    from uckg_ray.pipelines.kg import build_kg, build_kg_incremental
    from uckg_ray.sources import fixtures as fx

    if args.sf:
        fdir = fx.ensure_fixtures(args.sf)
        input_dir = f"{fdir}/transcripts"
        fixture_dir = fdir
    else:
        if not (args.input and args.fixtures):
            ap.error("either --sf or both --input and --fixtures required")
        input_dir, fixture_dir = args.input, args.fixtures

    cfg = PipelineConfig(files_per_group=args.files_per_group)
    if args.incremental:
        manifest = build_kg_incremental(
            input_dir, fixture_dir, args.output, cfg,
            canonicalize=not args.no_canonicalize)
    else:
        manifest = build_kg(input_dir, fixture_dir, args.output, cfg,
                            resume=not args.no_resume,
                            canonicalize=not args.no_canonicalize)
    print(json.dumps(manifest, default=str))
    ray.shutdown()
    return 0


if __name__ == "__main__":
    sys.exit(main())
