"""Cardinality auto-gate for category encoders: a KMV probe at fit time
switches Ordinal/Count/Target fits from the O(cardinality) driver dict to
a fixed-size hashed-bucket array (with a loud warning) when the column's
distinct count exceeds MAX_DRIVER_CATEGORIES; small-cardinality columns
keep the exact dict path bit-for-bit."""

import warnings

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data as rd

from ballet_ray.feature import Feature
from ballet_ray.pipeline import FeatureEngineeringPipeline
from ballet_ray.stages.encoders import CountEncoder, OrdinalEncoder, TargetEncoder
from ballet_ray.state import fitstate
from ballet_ray.state.fitstate import HashedCategoryCounts, HashedGroupedStats


def _wide_table(n=30_000, seed=0):
    """~n*2/3 distinct categories: mostly singleton ids plus one planted
    heavy category 'hot' (count 600, target mean 5.0)."""
    rng = np.random.RandomState(seed)
    cats = np.array([f"id_{i}" for i in range(n - 600)], dtype=object)
    cat = np.concatenate([cats, np.array(["hot"] * 600, dtype=object)])
    y = np.where(cat == "hot", 5.0, rng.rand(n))
    order = rng.permutation(n)
    return pa.table({"cat": pa.array(cat[order]), "y": pa.array(y[order])})


@pytest.fixture
def low_gate(monkeypatch):
    monkeypatch.setattr(fitstate, "MAX_DRIVER_CATEGORIES", 1_000)
    monkeypatch.setattr(fitstate, "HASHED_SPACE", 1 << 16)


def test_gate_switches_to_hashed_and_warns(ray_session, low_gate):
    ds = rd.from_arrow(_wide_table()).repartition(4)
    enc_o, enc_c = OrdinalEncoder(), CountEncoder()
    enc_t = TargetEncoder(target_col="y")
    pipe = FeatureEngineeringPipeline(
        [Feature("cat", enc_o), Feature("cat", enc_c), Feature("cat", enc_t)]
    )
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        out = pipe.fit_transform(ds, keep=["cat", "y"]).to_pandas()
    gate_warnings = [x for x in w if "MAX_DRIVER_CATEGORIES" in str(x.message)]
    assert gate_warnings, "gate warning not raised"

    # driver state is the fixed-size array, NOT an O(cardinality) dict
    assert isinstance(enc_o.fitted_["cat"], HashedCategoryCounts)
    assert isinstance(enc_c.fitted_["cat"], HashedCategoryCounts)
    assert isinstance(enc_t.fitted_["maps"]["cat"], HashedGroupedStats)
    assert enc_c.fitted_["cat"].counts.nbytes == (1 << 16) * 8  # bounded
    assert enc_t.fitted_["maps"]["cat"].sums.nbytes == (1 << 16) * 8

    hot = out[out["cat"] == "hot"]
    # hashed count >= exact (collisions only add); at 20k cats in 65k
    # buckets a handful of singletons may share hot's bucket
    assert (hot["cat_count"] >= 600).all()
    assert (hot["cat_count"] <= 610).all()
    # hashed target mean of the hot bucket ~5.0 (collision dilution small)
    assert np.allclose(hot["cat_tmean"], 5.0, atol=0.1)
    # singleton categories: count ~1, mean ~ its own y
    one = out[out["cat"] == "id_17"]
    assert (one["cat_count"] <= 5).all()
    # codes are hash % space, within range, deterministic
    assert out["cat_code"].between(0, (1 << 16) - 1).all()


def test_gate_partition_invariant(ray_session, low_gate):
    t = _wide_table(n=20_000, seed=3)
    outs = []
    for parts in (2, 9):
        enc = CountEncoder()
        pipe = FeatureEngineeringPipeline([Feature("cat", enc)])
        df = (
            pipe.fit_transform(rd.from_arrow(t).repartition(parts), keep=["cat"])
            .to_pandas()
            .sort_values("cat")
            .reset_index(drop=True)
        )
        outs.append(df)
    pd.testing.assert_frame_equal(outs[0], outs[1])


def test_small_cardinality_path_unchanged(ray_session, low_gate):
    """Below the (lowered) gate the exact dict path must run: ordinal codes
    are lexicographic ranks — something the hashed path cannot produce."""
    n = 3_000
    rng = np.random.RandomState(1)
    cat = np.array(["a", "b", "c"], dtype=object)[rng.randint(0, 3, n)]
    t = pa.table({"cat": pa.array(cat), "y": pa.array(rng.rand(n))})
    enc = OrdinalEncoder()
    pipe = FeatureEngineeringPipeline([Feature("cat", enc)])
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        out = pipe.fit_transform(rd.from_arrow(t).repartition(3), keep=["cat"]).to_pandas()
    assert not [x for x in w if "MAX_DRIVER_CATEGORIES" in str(x.message)]
    assert isinstance(enc.fitted_["cat"], dict)
    got = dict(out.drop_duplicates("cat")[["cat", "cat_code"]].itertuples(index=False))
    assert got == {"a": 0, "b": 1, "c": 2}


def test_hashed_null_handling(ray_session, low_gate):
    n = 12_000
    cat = np.array([f"u{i}" for i in range(n)], dtype=object)
    cat[::7] = None
    y = np.arange(n, dtype=np.float64)
    t = pa.table({"cat": pa.array(cat), "y": pa.array(y)})
    enc_o, enc_c = OrdinalEncoder(), CountEncoder(unknown=-2.0)
    enc_t = TargetEncoder(target_col="y")
    pipe = FeatureEngineeringPipeline(
        [Feature("cat", enc_o), Feature("cat", enc_c), Feature("cat", enc_t)]
    )
    out = pipe.fit_transform(rd.from_arrow(t).repartition(4), keep=["cat", "y"]).to_pandas()
    nulls = out[out["cat"].isna()]
    assert (nulls["cat_code"] == -1).all()
    assert (nulls["cat_count"] == -2).all()
    gmean = y.mean()
    assert np.allclose(nulls["cat_tmean"], gmean, rtol=1e-6)
