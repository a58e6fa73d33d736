"""Cluster job entrypoint — `ray job submit -- python jobs/run.py ...`.

Runs the checkpoint-resumable backfill over a token corpus on whatever
cluster Ray is attached to (on a real multi-node cluster, submit with
`ray job submit --working-dir .`; in this sandbox it runs local). Designed
for the north rule's two-cluster-size runs: identical invocations on N and
4N nodes, throughput reported on stdout as one JSON line.

Usage:
  python jobs/run.py --input /path/corpus --out /path/out \
      [--partitions 256] [--skew-threshold 1000000]
  python jobs/run.py --mode pack --input /path/corpus --out /path/out \
      [--max-len 512] [--pack-len 2048]   # tokens -> packed examples

Resume is implicit: re-running the same command skips every partition
whose lineage manifest already exists (the summary reports
``partitions_resumed``); delete the output dir for a clean run.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

# `python jobs/run.py` puts jobs/ (not the repo root) on sys.path
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def build_pipeline():
    from ballet_ray.feature import Feature
    from ballet_ray.pipeline import FeatureEngineeringPipeline
    from ballet_ray.stages.core import Log1p, TokenCount
    from ballet_ray.stages.encoders import StandardScaler
    from ballet_ray.stages.groupwise import GroupwiseTransform
    from ballet_ray.stages.windows import Lag, RollingMean, Sessionize

    return FeatureEngineeringPipeline(
        [
            Feature("tokens", TokenCount(), output="token_count"),
            Feature("n_tok", Log1p(), output="log_n_tok"),
            Feature("n_tok", GroupwiseTransform(StandardScaler(), groupby="source"), output="n_tok_z"),
            Feature("n_tok", Lag(1, key="doc_id", order_by="event_ts")),
            Feature("n_tok", RollingMean(3, key="doc_id", order_by="event_ts")),
            Feature("event_ts", Sessionize(3600, key="doc_id", order_by="event_ts")),
        ]
    )


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True)
    ap.add_argument("--out", required=True)
    ap.add_argument("--partitions", type=int, default=64)
    ap.add_argument("--key", default="doc_id")
    ap.add_argument("--skew-threshold", type=int, default=None)
    ap.add_argument("--slice-target", type=int, default=250_000)
    ap.add_argument("--hot-sample-frac", type=float, default=0.05)
    ap.add_argument("--num-cpus", type=int, default=None)
    ap.add_argument("--mode", choices=["backfill", "pack"], default="backfill")
    ap.add_argument("--max-len", type=int, default=512)
    ap.add_argument("--stride", type=int, default=None)
    ap.add_argument("--pack-len", type=int, default=2048)
    ap.add_argument("--files-per-part", type=int, default=2)
    ap.add_argument("--sep-token", type=int, default=None)
    args = ap.parse_args()

    import ray

    if not ray.is_initialized():
        kw = {"num_cpus": args.num_cpus} if args.num_cpus else {}
        ray.init(address="local", include_dashboard=False, logging_level="ERROR", **kw)
    from ray.data.context import DataContext, ShuffleStrategy

    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False
    ctx.shuffle_strategy = ShuffleStrategy.SORT_SHUFFLE_PUSH_BASED

    if args.mode == "pack":
        from ballet_ray.state.checkpoint import CheckpointedPack

        t0 = time.time()
        summary = CheckpointedPack(
            args.out, max_len=args.max_len, stride=args.stride,
            pack_len=args.pack_len, files_per_part=args.files_per_part,
            sep_token=args.sep_token,
        ).run(args.input)
        dt = time.time() - t0
        summary["wall_s_total"] = round(dt, 3)
        if summary.get("tokens_out"):
            summary["tokens_per_sec"] = round(summary["tokens_out"] / dt)
        print(json.dumps(summary))
        ray.shutdown()
        return

    from ballet_ray.state.checkpoint import CheckpointedBackfill

    t0 = time.time()
    summary = CheckpointedBackfill(
        args.out,
        key=args.key,
        num_partitions=args.partitions,
        skew_threshold=args.skew_threshold,
        slice_target=args.slice_target,
        hot_sample_frac=args.hot_sample_frac,
        fit_columns=["doc_id", "event_ts", "n_tok", "source"],
    ).run(args.input, build_pipeline())
    dt = time.time() - t0
    summary["wall_s_total"] = round(dt, 3)
    if summary.get("rows_processed"):
        summary["rows_per_sec"] = round(summary["rows_processed"] / dt)
    print(json.dumps(summary))
    ray.shutdown()


if __name__ == "__main__":
    main()
