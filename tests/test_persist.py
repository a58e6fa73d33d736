"""Fitted-artifact persistence (state/persist.py): fit once, save, load in
a 'later job', transform without re-fitting."""

import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from ballet_ray import Feature, FeatureEngineeringPipeline
from ballet_ray.stages.encoders import StandardScaler
from ballet_ray.state.persist import (
    load_artifact,
    load_pipeline,
    save_artifact,
    save_pipeline,
)


def _ds(vals):
    return rd.from_pandas(pd.DataFrame({"x": vals}))


def test_pipeline_roundtrip_preserves_fit(tmp_path):
    train = np.array([1.0, 2.0, 3.0, 4.0])
    pipe = FeatureEngineeringPipeline([Feature("x", StandardScaler(), output="xz")])
    pipe.fit(_ds(train))
    p = save_pipeline(pipe, str(tmp_path / "pipe.pkl"))
    loaded = load_pipeline(p)
    # transform NEW data with the TRAIN-time mean/std — no re-fit
    out = loaded.transform(_ds(np.array([10.0]))).to_pandas()
    mu, sd = train.mean(), train.std(ddof=0)
    assert out["xz"].iloc[0] == pytest.approx((10.0 - mu) / sd)


def test_artifact_roundtrip_bpe(tmp_path):
    from ballet_ray.stages.bpe import train_bpe

    ds = rd.from_items([{"doc_id": 0, "text": "low low lower lowest"}])
    tok = train_bpe(ds, num_merges=5)
    p = save_artifact(tok, str(tmp_path / "tok.pkl"))
    tok2 = load_artifact(p, expect_class="BpeTokenizer")
    assert tok2.encode_word("lower") == tok.encode_word("lower")


def test_load_rejects_foreign_and_mismatched(tmp_path):
    foreign = tmp_path / "x.pkl"
    import pickle

    foreign.write_bytes(pickle.dumps({"not": "an artifact"}))
    with pytest.raises(ValueError, match="not a ballet_ray artifact"):
        load_artifact(str(foreign))

    p = save_artifact({"model": 1}, str(tmp_path / "d.pkl"))
    with pytest.raises(ValueError, match="expected"):
        load_artifact(p, expect_class="BpeTokenizer")


def test_save_is_atomic(tmp_path):
    # no temp litter after a successful save
    p = save_artifact([1, 2, 3], str(tmp_path / "a.pkl"))
    import os

    assert os.path.exists(p)
    assert not [f for f in os.listdir(tmp_path) if f.startswith(".")]


def test_backfill_job_with_saved_pipeline(tmp_path):
    """jobs/run.py --pipeline <artifact>: the backfill applies a loaded
    pipeline instead of the built-in one."""
    import json
    import os
    import subprocess
    import sys as _sys

    from ballet_ray.schema import write_corpus

    corpus = write_corpus(str(tmp_path / "corpus"), rows=3000, shards=4,
                          n_docs=100, with_ts=True)
    from ballet_ray.stages.core import Log1p

    art = str(tmp_path / "pipe.pkl")
    save_pipeline(
        FeatureEngineeringPipeline([Feature("n_tok", Log1p(), output="log_n_tok")]),
        art,
    )
    r = subprocess.run(
        [_sys.executable, "jobs/run.py", "--input", corpus,
         "--out", str(tmp_path / "bf"), "--partitions", "2", "--num-cpus", "4",
         "--pipeline", art],
        capture_output=True, text=True, cwd="/root/repo",
        env={**os.environ, "RAY_ADDRESS": "local"},
    )
    assert r.returncode == 0, r.stderr[-3000:]
    s = json.loads(r.stdout.strip().splitlines()[-1])
    assert s["rows_processed"] == 3000
    import pyarrow.parquet as pq
    import glob

    files = glob.glob(str(tmp_path / "bf" / "**" / "*.parquet"), recursive=True)
    assert files
    cols = pq.read_schema(files[0]).names
    assert "log_n_tok" in cols
