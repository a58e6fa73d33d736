"""Checkpoint/resume: clean run == resumed run, manifests carry lineage."""

import json
import os
import shutil

import numpy as np
import pandas as pd
import pyarrow.parquet as pq
import pytest
import ray.data as rd

from ballet_ray.feature import Feature
from ballet_ray.pipeline import FeatureEngineeringPipeline
from ballet_ray.stages.core import Log1p, TokenCount
from ballet_ray.stages.encoders import StandardScaler
from ballet_ray.stages.groupwise import GroupwiseTransform
from ballet_ray.stages.windows import Lag, Sessionize
from ballet_ray.state.checkpoint import CheckpointedBackfill


def _pipe():
    return FeatureEngineeringPipeline(
        [
            Feature("tokens", TokenCount(), output="token_count"),
            Feature("n_tok", Log1p(), output="log_n_tok"),
            Feature("n_tok", GroupwiseTransform(StandardScaler(), groupby="source"), output="n_tok_z"),
            Feature("n_tok", Lag(1, key="doc_id", order_by="event_ts")),
            Feature("event_ts", Sessionize(3600, key="doc_id", order_by="event_ts")),
        ]
    )


def _read_all(features_dir):
    parts = sorted(os.listdir(features_dir))
    dfs = [pq.read_table(os.path.join(features_dir, p)).to_pandas() for p in parts if p.startswith("part=")]
    out = pd.concat(dfs, ignore_index=True)
    return out.sort_values(["doc_id", "event_ts"]).reset_index(drop=True)


def test_checkpoint_run_resume_equals_clean(tmp_path, corpus_dir):
    out_a = str(tmp_path / "run_a")
    out_b = str(tmp_path / "run_b")

    # clean run A
    run = CheckpointedBackfill(out_a, key="doc_id", num_partitions=8)
    summary = run.run(corpus_dir, _pipe())
    assert summary["partitions_processed"] > 0
    a = _read_all(os.path.join(out_a, "features"))

    # run B, then simulate failure: delete half the outputs+manifests, resume
    run_b = CheckpointedBackfill(out_b, key="doc_id", num_partitions=8)
    run_b.run(corpus_dir, _pipe())
    for k in range(0, 8, 2):
        m = os.path.join(out_b, "manifest", f"part-{k}.json")
        d = os.path.join(out_b, "features", f"part={k}")
        if os.path.exists(m):
            os.remove(m)
        if os.path.isdir(d):
            shutil.rmtree(d)
    summary_b = CheckpointedBackfill(out_b, key="doc_id", num_partitions=8).run(corpus_dir, _pipe())
    assert summary_b["partitions_resumed"] > 0  # skipped completed parts
    b = _read_all(os.path.join(out_b, "features"))

    # identical content
    assert len(a) == len(b)
    for c in ["token_count", "log_n_tok", "n_tok_z", "n_tok_lag1", "session_id"]:
        assert np.allclose(a[c].to_numpy(dtype=float), b[c].to_numpy(dtype=float), equal_nan=True), c
    # token arrays bit-equal
    for x, y in zip(a["tokens"].head(50), b["tokens"].head(50)):
        assert np.array_equal(np.asarray(x), np.asarray(y))


def test_manifests_carry_lineage(tmp_path, corpus_dir):
    out = str(tmp_path / "runm")
    CheckpointedBackfill(out, key="doc_id", num_partitions=4).run(corpus_dir, _pipe())
    mans = sorted(os.listdir(os.path.join(out, "manifest")))
    assert len(mans) == 4
    man = json.load(open(os.path.join(out, "manifest", mans[0])))
    for field in ("part", "input_files", "rows", "tokens", "checksum", "wall_s"):
        assert field in man
    # rows in manifests == corpus rows
    total = sum(json.load(open(os.path.join(out, "manifest", m)))["rows"] for m in mans)
    assert total == rd.read_parquet(corpus_dir).count()


def test_checkpoint_output_matches_streaming_pipeline(tmp_path, corpus_dir):
    """Bucket-local computation must equal the streaming keyed pass."""
    out = str(tmp_path / "runc")
    CheckpointedBackfill(out, key="doc_id", num_partitions=4).run(corpus_dir, _pipe())
    a = _read_all(os.path.join(out, "features"))
    stream = _pipe().fit_transform(rd.read_parquet(corpus_dir)).to_pandas()
    stream = stream.sort_values(["doc_id", "event_ts"]).reset_index(drop=True)
    for c in ["token_count", "n_tok_z", "n_tok_lag1", "session_id"]:
        assert np.allclose(a[c].to_numpy(dtype=float), stream[c].to_numpy(dtype=float), equal_nan=True), c


def test_checkpoint_skew_sliced_matches_unsliced(tmp_path, corpus_dir):
    """Hot-entity time slicing in phase 1 must not change any feature value
    (cross-slice carries restore exact window semantics)."""
    out_a = str(tmp_path / "plain")
    out_b = str(tmp_path / "sliced")
    CheckpointedBackfill(out_a, key="doc_id", num_partitions=8).run(corpus_dir, _pipe())
    runb = CheckpointedBackfill(
        out_b, key="doc_id", num_partitions=8, skew_threshold=300, slice_target=200
    )
    runb.run(corpus_dir, _pipe())
    # the hot doc must actually have been sliced into >1 partitions
    parts = [d for d in os.listdir(os.path.join(out_b, "buckets")) if d.startswith("part=")]
    hot_parts = [d for d in parts if int(d.split("=")[1]) >= 8]
    assert len(hot_parts) >= 2, parts
    a = _read_all(os.path.join(out_a, "features"))
    b = _read_all(os.path.join(out_b, "features"))
    assert len(a) == len(b)
    for c in ["token_count", "log_n_tok", "n_tok_z", "n_tok_lag1", "session_id"]:
        assert np.allclose(a[c].to_numpy(dtype=float), b[c].to_numpy(dtype=float), equal_nan=True), c
    # per-partition row counts bounded by ~slice size for hot parts
    import json as _json

    for d in hot_parts:
        k = int(d.split("=")[1])
        man = _json.load(open(os.path.join(out_b, "manifest", f"part-{k}.json")))
        assert man["rows"] <= 3 * 200, man


def test_two_clean_runs_identical_checksums(tmp_path, corpus_dir):
    """Determinism under parallelism (SURVEY §5.2 item 5): two independent
    clean runs produce byte-identical per-partition content checksums."""
    import json as _json

    outs = []
    for name in ("d1", "d2"):
        out = str(tmp_path / name)
        CheckpointedBackfill(out, key="doc_id", num_partitions=8).run(corpus_dir, _pipe())
        sums = {}
        for m in os.listdir(os.path.join(out, "manifest")):
            j = _json.load(open(os.path.join(out, "manifest", m)))
            sums[j["part"]] = j["checksum"]
        outs.append(sums)
    assert outs[0] == outs[1]


def test_checkpointed_pack_resume(tmp_path):
    import json
    import os

    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from ballet_ray.state.checkpoint import CheckpointedPack

    # 6 shard files of token rows
    src = tmp_path / "corpus"
    src.mkdir()
    rng = np.random.default_rng(0)
    total_tokens = 0
    for s in range(6):
        rows = [rng.integers(0, 100, size=int(rng.integers(1, 900))).astype(np.int32).tolist() for _ in range(40)]
        total_tokens += sum(len(r) for r in rows)
        pq.write_table(
            pa.table({"doc_id": [f"{s}:{i}" for i in range(40)], "tokens": pa.array(rows, pa.list_(pa.int32()))}),
            src / f"shard-{s:02d}.parquet",
        )

    out = tmp_path / "packed"
    job = CheckpointedPack(str(out), max_len=128, pack_len=512, files_per_part=2)
    s1 = job.run(str(src))
    assert s1["partitions_total"] == 3 and s1["partitions_processed"] == 3
    # stride=max_len chunking preserves token mass through packing
    assert s1["tokens_out"] == total_tokens

    # resume: delete one manifest -> exactly one partition reruns
    mans = sorted(os.listdir(out / "manifest"))
    (out / "manifest" / mans[1]).unlink()
    s2 = CheckpointedPack(str(out), max_len=128, pack_len=512, files_per_part=2).run(str(src))
    assert s2["partitions_resumed"] == 2 and s2["partitions_processed"] == 1

    # manifests carry lineage + fill; output parquet readable and capped
    man = json.load(open(out / "manifest" / mans[0]))
    assert man["input_files"] == ["shard-00.parquet", "shard-01.parquet"]
    assert 0 < man["fill"] <= 1
    t = pq.read_table(out / "examples" / "part=0" / "data.parquet")
    assert max(t.column("n_tok").to_pylist()) <= 512
