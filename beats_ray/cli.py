"""Command-line entry point — the ``ray job submit`` surface.

A user of the reference runs ``filebeat -c filebeat.yml``; the engine
equivalent is::

    python -m beats_ray --input '/data/transcripts/part-*.parquet' \
        --out /data/routed --config pipeline.yaml --resume

    # on a cluster:
    ray job submit --working-dir . -- python -m beats_ray --input ... --out ...

The config file carries the same YAML surface as the reference
(``processors:`` with ``when:``, ``routes:`` selector rules — see
beats_ray.pipeline.FLAGSHIP_CONFIG for the default). ``--resume`` uses
the per-partition lineage records; a fresh ``--out`` starts clean.

This module owns its Ray session (guarded init) — library code never
calls ray.init (driver contract).
"""

from __future__ import annotations

import argparse
import glob
import json
import sys


def build_arg_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="beats_ray",
        description="Ray-Data-native parse -> enrich -> route -> aggregate engine",
    )
    p.add_argument("--input", required=True,
                   help="input parquet glob(s), comma-separated")
    p.add_argument("--out", required=True, help="output directory")
    p.add_argument("--config", help="pipeline YAML/JSON (default: flagship)")
    p.add_argument("--num-parts", type=int, default=None,
                   help="partition count (default: number of input files)")
    p.add_argument("--no-enrich", action="store_true")
    p.add_argument("--no-resume", action="store_true",
                   help="ignore existing lineage; reprocess everything")
    p.add_argument("--num-cpus", type=int, default=None,
                   help="ray.init num_cpus when starting a local session")
    p.add_argument("--stream", action="store_true",
                   help="micro-batch streaming mode (event-time windows)")
    p.add_argument("--window-s", type=int, default=3600,
                   help="streaming window size in seconds (with --stream)")
    return p


def load_config(path: str | None) -> dict | None:
    if path is None:
        return None
    import yaml

    with open(path) as fh:
        if path.endswith(".json"):
            return json.load(fh)
        return yaml.safe_load(fh)


def main(argv: list[str] | None = None) -> int:
    args = build_arg_parser().parse_args(argv)
    files: list[str] = []
    for pat in args.input.split(","):
        files.extend(sorted(glob.glob(pat)))
    if not files:
        print(f"error: no input files match {args.input!r}", file=sys.stderr)
        return 2
    config = load_config(args.config)

    import ray

    if not ray.is_initialized():
        kwargs = {"num_cpus": args.num_cpus} if args.num_cpus else {}
        ray.init(address="local", include_dashboard=False,
                 logging_level="ERROR", **kwargs)

    # --no-resume must run BEFORE dispatching to either mode: stale
    # lineage (batch OR stream layout) would otherwise skip work the
    # user explicitly asked to reprocess. Removing the lineage dirs
    # wholesale also drops the hidden .attempts.json counter file.
    if args.no_resume:
        import shutil
        from pathlib import Path

        out = Path(args.out)
        for d in list(out.glob("part_id=*")) + list(out.glob("window=*")):
            shutil.rmtree(d)
        for sub in ("_lineage", "_stream_lineage"):
            if (out / sub).exists():
                shutil.rmtree(out / sub)

    if args.stream:
        from .stream import MicroBatchRunner

        totals = MicroBatchRunner(args.out, window_s=args.window_s).run(
            files, config=config
        )
        print(json.dumps(totals, sort_keys=True))
        ray.shutdown()
        return 0

    from .state import CheckpointRunner

    runner = CheckpointRunner(args.out)
    metrics = runner.run(
        files,
        config=config,
        num_parts=args.num_parts,
        enrich=not args.no_enrich,
    )
    print(json.dumps(metrics, sort_keys=True))
    ray.shutdown()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
