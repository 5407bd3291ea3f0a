"""CLI entry: ``python -m rayextract <input_glob> <out_dir> [options]``.

The ``ray job submit`` surface replacing the reference's resident Windows
service + folder poll (/root/reference/TextExtraction/Program.cs:10-31,
Worker.cs:45-56): one submitted job per input batch, resumable via the
per-shard manifest (re-submit to continue after a crash).
"""

from __future__ import annotations

import argparse
import json
import os
import sys


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(prog="rayextract", description=__doc__)
    p.add_argument("input_glob", help="parquet transcript files (glob or dir)")
    p.add_argument("out_dir", help="output directory (turns/, conv_fields/, _manifest.jsonl)")
    p.add_argument("--shards", type=int, default=64, help="resume granularity")
    p.add_argument("--no-turns", action="store_true", help="skip the per-turn sink")
    p.add_argument("--no-patient", action="store_true")
    p.add_argument("--no-invoice", action="store_true")
    p.add_argument("--salt-buckets", type=int, default=0)
    p.add_argument("--batch-size", type=int, default=4096)
    p.add_argument("--concurrency", type=int, default=0,
                   help="tagger actor pool max (0 = cpus - 2)")
    p.add_argument("--dry-run", action="store_true",
                   help="K4 Testing-mode analog: sample + log, no writes")
    p.add_argument("--watch", type=float, default=0, metavar="SEC",
                   help="S1 poll-loop analog: re-sweep the input glob every "
                        "SEC seconds; only shards with new files recompute")
    args = p.parse_args(argv)

    import ray

    if not ray.is_initialized():
        # under `ray job submit` RAY_ADDRESS points at the cluster; honor it
        # so the documented submit command actually scales out (standalone
        # runs keep the single-node default)
        ray.init(
            address=os.environ.get("RAY_ADDRESS", "local"),
            include_dashboard=False, logging_level="ERROR",
        )
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    from .config import ExtractConfig, parse_pool_size
    from .pipeline import run_extraction, run_sharded

    cpus = int(ray.cluster_resources().get("CPU", 4))
    cfg = ExtractConfig(
        extract_patient=not args.no_patient,
        extract_invoice=not args.no_invoice,
        salt_buckets=args.salt_buckets,
        batch_size=args.batch_size,
        tagger_concurrency=args.concurrency or parse_pool_size(cpus),
    )
    if args.dry_run:
        # reference Testing=true: log instead of persist (Worker.cs:259-263)
        turns, conv = run_extraction(args.input_glob, cfg)
        sample = conv.take(5)
        print(json.dumps({"sample_conv_fields": [
            {k: v for k, v in r.items() if not k.startswith("_")} for r in sample
        ]}, default=str))
        return 0
    if args.watch > 0:
        from .pipeline import poll_and_run

        poll_and_run(args.input_glob, args.out_dir, cfg,
                     interval_sec=args.watch, n_shards=args.shards)
        return 0
    stats = run_sharded(
        args.input_glob, args.out_dir, cfg,
        n_shards=args.shards, write_turns=not args.no_turns,
    )
    print(json.dumps(stats))
    return 0


if __name__ == "__main__":
    sys.exit(main())
