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
