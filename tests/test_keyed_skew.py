"""Skew path of the keyed co-partition pass: time-sliced hot entities with
cross-slice carries must produce byte-identical window features."""

import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from ballet_ray.stages.windows import (
    CumCount,
    FFill,
    Lag,
    MultiLag,
    RollingMean,
    Sessionize,
    apply_keyed,
)


def _skewed_frame(n=6000, n_keys=12, seed=5):
    rng = np.random.RandomState(seed)
    keys = np.array([f"k{i:02d}" for i in rng.randint(0, n_keys, n)])
    keys[: n // 2] = "hot"  # one entity owns half the rows
    t0 = pd.Timestamp("2021-01-01").value // 1000
    ts = np.sort(rng.randint(0, 30 * 86400_000_000, n))
    # unique ts per row (global sort; per-key therefore strictly increasing)
    ts = ts + np.arange(n)
    df = pd.DataFrame(
        {
            "k": keys,
            "ts": (t0 + ts).astype("datetime64[us]"),
            "v": rng.randn(n).round(3),
        }
    )
    # sprinkle nulls for ffill
    df.loc[rng.rand(n) < 0.3, "v"] = np.nan
    return df.sample(frac=1.0, random_state=seed).reset_index(drop=True)  # shuffle row order


def _oracle(df, gap_s=3600):
    o = df.sort_values(["k", "ts"]).reset_index(drop=True)
    g = o.groupby("k", sort=False)
    o["v_lag1"] = g["v"].shift(1)
    o["v_lag3"] = g["v"].shift(3)
    o["v_lead1"] = g["v"].shift(-1)
    o["v_rmean4"] = g["v"].rolling(4, min_periods=1).mean().reset_index(level=0, drop=True)
    o["v_ffill"] = g["v"].ffill()
    gap = g["ts"].diff() > pd.Timedelta(seconds=gap_s)
    o["session_id"] = gap.groupby(o["k"]).cumsum().astype(int)
    o["cum_count"] = g.cumcount()
    return o


@pytest.mark.parametrize("skew_threshold,slice_target", [(None, 0), (500, 300)])
def test_keyed_skew_matches_oracle(skew_threshold, slice_target):
    df = _skewed_frame()
    ds = rd.from_pandas(df).repartition(7)
    transforms = [
        (MultiLag([1, 3, -1], key="k", order_by="ts"), ["v"], ["v_lag1", "v_lag3", "v_lead1"]),
        (RollingMean(4, key="k", order_by="ts"), ["v"], ["v_rmean4"]),
        (FFill(key="k", order_by="ts"), ["v"], ["v_ffill"]),
        (Sessionize(3600, key="k", order_by="ts"), ["ts"], ["session_id"]),
        (CumCount(key="k", order_by="ts"), [], ["cum_count"]),
    ]
    kw = {} if skew_threshold is None else {
        "skew_threshold": skew_threshold,
        "slice_target": slice_target,
    }
    out = apply_keyed(ds, transforms, "k", "ts", num_buckets=8, **kw).to_pandas()
    got = out.sort_values(["k", "ts"]).reset_index(drop=True)
    exp = _oracle(df)
    for c in ["v_lag1", "v_lag3", "v_lead1", "v_rmean4", "v_ffill"]:
        assert np.allclose(got[c].to_numpy(), exp[c].to_numpy(), equal_nan=True), c
    for c in ["session_id", "cum_count"]:
        assert (got[c].to_numpy() == exp[c].to_numpy()).all(), c


def test_skew_actually_slices():
    """With a low threshold the hot entity must be split into several
    sub-partitions (indirectly observable via identical results + the
    summary pre-pass exercising)."""
    df = _skewed_frame(n=3000)
    ds = rd.from_pandas(df)
    from ballet_ray.stages.asof import _hot_key_plan

    plan = _hot_key_plan(ds, "k", "ts", 500, 300)
    assert "hot" in plan
    assert all(k == "hot" or df["k"].value_counts()[k] <= 500 for k in plan)
