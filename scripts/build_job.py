"""Cluster job entrypoint: index build (+ optional query smoke) via Ray Jobs.

The north-rule deployment path — on a real cluster::

    ray job submit --working-dir . -- \
        python scripts/build_job.py --input s3://bucket/pages --out /mnt/idx \
            --waves 8 --partitions 64

The script attaches to the cluster Ray (``RAY_ADDRESS`` from the job
runtime; falls back to a local session when unset, which is how the
single-node sandbox runs it), builds or resumes the index, prints one JSON
status line, and exits non-zero on failure.  All scale knobs surface as
flags; resumability comes from the checkpoint manifest, so re-submitting a
failed job continues where it died.
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True)
    ap.add_argument("--out", required=True)
    ap.add_argument("--waves", type=int, default=4)
    ap.add_argument("--partitions", type=int, default=8)
    ap.add_argument("--shard-group-size", type=int, default=8)
    ap.add_argument("--tokenize-concurrency", type=int, default=4)
    ap.add_argument("--tokenizer", default="regex", choices=["regex", "bert_union"])
    ap.add_argument("--embed-dim", type=int, default=0)
    ap.add_argument("--pre-extracted", action="store_true")
    ap.add_argument("--smoke-query", default=None,
                    help="run one query after the build as a health check")
    args = ap.parse_args()

    import ray

    if not ray.is_initialized():
        # under `ray job submit`, RAY_ADDRESS points at the cluster; the
        # sandbox presets RAY_ADDRESS=local so the same script runs anywhere
        ray.init(include_dashboard=False, ignore_reinit_error=True,
                 logging_level="ERROR")

    from vexor_ray.index.build import BuildConfig, build_index
    from vexor_ray.query.searcher import Searcher

    cfg = BuildConfig(
        num_waves=args.waves,
        partitions_per_wave=args.partitions,
        shard_group_size=args.shard_group_size,
        tokenize_concurrency=args.tokenize_concurrency,
        tokenizer=args.tokenizer,
        embed_dim=args.embed_dim,
        pre_extracted=args.pre_extracted,
    )
    t0 = time.perf_counter()
    manifest = build_index(args.input, args.out, cfg)
    wall = time.perf_counter() - t0
    out = {
        "status": "ok",
        "build_sec": round(wall, 3),
        "stats": manifest["stats"],
        "partitions": len(manifest["partitions"]),
    }
    if args.smoke_query:
        s = Searcher(args.out)
        out["smoke_hits"] = len(s.search(args.smoke_query, k=10))
    print(json.dumps(out))
    ray.shutdown()
    return 0


if __name__ == "__main__":
    sys.exit(main())
