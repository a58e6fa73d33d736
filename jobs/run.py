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


def run_ingest(args) -> None:
    """End-to-end corpus ingest: streaming exact dedup (sharded Bloom
    index, state checkpointed under <out>/bloom_state so a later run of
    NEW data suppresses everything already ingested) → Gopher-style fused
    quality filter → hash tokenization to the canonical (doc_id, tokens,
    n_tok) shape → resumable chunk+pack (CheckpointedPack manifests).
    Everything up to the pack phase is one map-only streaming chain —
    zero shuffles; the pack phase resumes per shard-group."""
    import ray

    import pyarrow as pa
    import pyarrow.compute as pc
    import ray.data as rd

    from ballet_ray.feature import Feature
    from ballet_ray.pipeline import FeatureEngineeringPipeline
    from ballet_ray.stages.streaming_dedup import make_bloom_index, streaming_exact_dedup
    from ballet_ray.stages.text import QualityScore, WordRepetition, hash_tokenize
    from ballet_ray.state.checkpoint import CheckpointedPack

    t0 = time.time()
    out = args.out
    state_dir = os.path.join(out, "bloom_state")
    tokens_dir = os.path.join(out, "tokens")
    handles = make_bloom_index(args.bloom_shards, bits=args.bloom_bits)
    restored = False
    if os.path.isdir(state_dir):
        blobs = []
        for s in range(args.bloom_shards):
            p = os.path.join(state_dir, f"shard-{s}.bin")
            blobs.append(open(p, "rb").read() if os.path.exists(p) else None)
        if all(b is not None for b in blobs):
            ray.get([h.restore.remote(b) for h, b in zip(handles, blobs)])
            restored = True

    ds = rd.read_parquet(args.input, columns=["doc_id", "text"])
    docs_in = ds.count()
    deduped = streaming_exact_dedup(ds, col="text", handles=handles)

    pipe = FeatureEngineeringPipeline(
        [Feature("text", QualityScore()), Feature("text", WordRepetition())]
    )
    scored = pipe.fit_transform(deduped)

    min_words = args.min_words

    def keep(t: pa.Table) -> pa.Table:
        m = pc.and_(
            pc.and_(
                pc.greater_equal(t.column("words"), min_words),
                pc.less_equal(t.column("dup_word_frac"), 0.6),
            ),
            pc.less_equal(t.column("top_word_frac"), 0.13),
        )
        return t.filter(m).select(["doc_id", "text"])

    vocab = args.vocab

    def tokenize(t: pa.Table) -> pa.Table:
        return hash_tokenize(t, text_col="text", vocab=vocab).select(
            ["doc_id", "tokens", "n_tok"]
        )

    kept = scored.map_batches(keep, batch_format="pyarrow").map_batches(
        tokenize, batch_format="pyarrow"
    )
    # intermediate tokens parquet = the pack phase's resume substrate
    if os.path.isdir(tokens_dir):
        import shutil

        shutil.rmtree(tokens_dir)
    kept.write_parquet(tokens_dir)
    os.makedirs(tokens_dir, exist_ok=True)  # empty stream writes no files
    has_tokens = any(f.endswith(".parquet") for f in os.listdir(tokens_dir))
    docs_kept = (
        rd.read_parquet(tokens_dir, columns=["doc_id"]).count() if has_tokens else 0
    )

    if has_tokens:
        pack_summary = CheckpointedPack(
            os.path.join(out, "packs"), max_len=args.max_len, stride=args.stride,
            pack_len=args.pack_len, files_per_part=args.files_per_part,
            sep_token=args.sep_token,
        ).run(tokens_dir)
    else:  # everything suppressed by the index (a pure replay) or filtered
        pack_summary = {"partitions_total": 0, "partitions_processed": 0,
                        "partitions_resumed": 0, "packs": 0, "tokens_out": 0}

    os.makedirs(state_dir, exist_ok=True)
    for s, blob in enumerate(ray.get([h.state.remote() for h in handles])):
        tmp = os.path.join(state_dir, f".shard-{s}.tmp")
        with open(tmp, "wb") as f:
            f.write(blob)
        os.replace(tmp, os.path.join(state_dir, f"shard-{s}.bin"))

    dt = time.time() - t0
    summary = {
        "mode": "ingest",
        "docs_in": int(docs_in),
        "docs_kept": int(docs_kept),
        "bloom_restored": restored,
        "pack": pack_summary,
        "wall_s_total": round(dt, 3),
    }
    if getattr(args, "report", False):
        from ballet_ray.stages.report import corpus_report

        # full-schema read: the mixture section needs lang/source columns
        # the ingest path prunes away
        summary["input_report"] = corpus_report(
            rd.read_parquet(args.input), text_col="text", id_col="doc_id"
        )
    print(json.dumps(summary))


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
    ap.add_argument("--mode", choices=["backfill", "pack", "ingest"], default="backfill")
    ap.add_argument("--bloom-shards", type=int, default=4)
    ap.add_argument("--bloom-bits", type=int, default=1 << 24)
    ap.add_argument("--vocab", type=int, default=50_257)
    ap.add_argument("--min-words", type=int, default=20)
    ap.add_argument("--report", action="store_true",
                    help="ingest mode: include a sketch-backed corpus_report "
                         "of the INPUT in the summary JSON")
    ap.add_argument("--pipeline", default=None,
                    help="path to a saved pipeline artifact (state/persist.py); "
                         "backfill mode applies it instead of the built-in pipeline")
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

    if args.mode == "ingest":
        run_ingest(args)
        ray.shutdown()
        return

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

    if args.pipeline:
        from ballet_ray.state.persist import load_pipeline

        pipeline = load_pipeline(args.pipeline)
    else:
        pipeline = build_pipeline()

    t0 = time.time()
    summary = CheckpointedBackfill(
        args.out,
        key=args.key,
        num_partitions=args.partitions,
        skew_threshold=args.skew_threshold,
        slice_target=args.slice_target,
        hot_sample_frac=args.hot_sample_frac,
        fit_columns=["doc_id", "event_ts", "n_tok", "source"],
    ).run(args.input, pipeline)
    dt = time.time() - t0
    summary["wall_s_total"] = round(dt, 3)
    if summary.get("rows_processed"):
        summary["rows_per_sec"] = round(summary["rows_processed"] / dt)
    print(json.dumps(summary))
    ray.shutdown()


if __name__ == "__main__":
    main()
