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


def test_hot_key_plan_sampled_is_distributed(sf_dir):
    """The sampled hot-key pre-pass must find the hot entity WITHOUT
    collecting the row sample to the driver (per-batch partial counts +
    grouped reduce; only hot rows reach the driver)."""
    from ballet_ray.stages.asof import _hot_key_plan

    rng = np.random.RandomState(0)
    n = 60_000
    keys = np.where(rng.rand(n) < 0.5, "hot_doc", rng.randint(0, 500, n).astype(str))
    ts = pd.Timestamp("2024-01-01").value // 1000 + np.sort(rng.randint(0, 10**9, n))
    df = pd.DataFrame({"doc_id": keys, "event_ts": ts.astype("datetime64[us]"), "v": rng.randn(n)})
    ds = rd.from_pandas(df).repartition(8)
    plan = _hot_key_plan(ds, "doc_id", "event_ts", 10_000, 5_000, sample_frac=0.1)
    assert set(plan) == {"hot_doc"}
    t0, slice_us = plan["hot_doc"]
    assert slice_us > 0
    # full-pass plan agrees on the hot set
    plan_full = _hot_key_plan(ds, "doc_id", "event_ts", 10_000, 5_000)
    assert set(plan_full) == {"hot_doc"}


def _rtmean_oracle(df, range_s):
    """Trailing time-range mean [ts-R, ts] incl. peers, per key."""
    o = df.sort_values(["k", "ts"]).reset_index(drop=True)
    out = np.full(len(o), np.nan)
    for _, g in o.groupby("k", sort=False):
        ts = g["ts"].astype("int64").to_numpy()  # us
        v = g["v"].to_numpy()
        r = int(range_s * 1_000_000)
        for i, (t_i, idx) in enumerate(zip(ts, g.index)):
            m = (ts >= t_i - r) & (ts <= t_i)
            vv = v[m]
            vv = vv[~np.isnan(vv)]
            out[idx] = vv.mean() if len(vv) else np.nan
    o["v_rtmean"] = out
    return o


def test_sliced_cumsum_and_rolling_time_match_oracle():
    """CumSum (prior-sum carry) and RollingMeanTime (ttail carry) must be
    exact across hot-entity time-slice boundaries."""
    from ballet_ray.stages.windows import CumSum, RollingMeanTime

    df = _skewed_frame()
    ds = rd.from_pandas(df).repartition(7)
    transforms = [
        (CumSum(key="k", order_by="ts"), ["v"], ["v_cumsum"]),
        (RollingMeanTime(86400, "ts", key="k"), ["v"], ["v_rtmean"]),
    ]
    out = apply_keyed(
        ds, transforms, "k", "ts", num_buckets=8, skew_threshold=500, slice_target=300
    ).to_pandas()
    got = out.sort_values(["k", "ts"]).reset_index(drop=True)
    exp = _rtmean_oracle(df, 86400)
    exp["v_cumsum"] = (
        exp.groupby("k", sort=False)["v"].transform(lambda s: s.fillna(0.0).cumsum())
    )
    assert np.allclose(got["v_cumsum"].to_numpy(), exp["v_cumsum"].to_numpy(), equal_nan=True)
    assert np.allclose(got["v_rtmean"].to_numpy(), exp["v_rtmean"].to_numpy(), equal_nan=True)
    # sanity: unsliced run identical
    out2 = apply_keyed(
        rd.from_pandas(df).repartition(7), transforms, "k", "ts", num_buckets=8
    ).to_pandas().sort_values(["k", "ts"]).reset_index(drop=True)
    assert np.allclose(got["v_cumsum"].to_numpy(), out2["v_cumsum"].to_numpy(), equal_nan=True)
    assert np.allclose(got["v_rtmean"].to_numpy(), out2["v_rtmean"].to_numpy(), equal_nan=True)


def test_sliced_catboost_matches_oracle():
    """The ordered CatBoost scan over a hot category must carry its prefix
    (count, target sum) exactly across time-slice boundaries."""
    from ballet_ray.stages.encoders_ext import CatBoostEncoder

    df = _skewed_frame()
    rng = np.random.RandomState(8)
    df["y"] = rng.rand(len(df)).round(3)
    prior = float(df["y"].mean())
    t = CatBoostEncoder("k", "ts", a=1.0).keyed()
    t.fitted_ = {"y": prior}
    ds = rd.from_pandas(df).repartition(7)
    out = apply_keyed(
        ds, [(t, ["y"], ["y_cb"])], "k", "ts", num_buckets=8,
        skew_threshold=500, slice_target=300,
    ).to_pandas().sort_values(["k", "ts"]).reset_index(drop=True)
    o = df.sort_values(["k", "ts"]).reset_index(drop=True)
    g = o.groupby("k", sort=False)
    cnt_before = g.cumcount().to_numpy()
    sum_before = g["y"].transform(lambda s: s.fillna(0.0).cumsum().shift(1, fill_value=0.0)).to_numpy()
    expect = (sum_before + 1.0 * prior) / (cnt_before + 1.0)
    assert np.allclose(out["y_cb"].to_numpy(), expect)


def test_sliced_ewm_matches_whole():
    """EwmMean's affine slice carry must reproduce the unsliced recursion
    exactly across hot-entity time-slice boundaries."""
    from ballet_ray.stages.windows import EwmMean

    df = _skewed_frame()
    df["w"] = df["v"].fillna(0.0)  # kernel contract: null-free input
    for alpha in (0.1, 0.6):
        transforms = [(EwmMean(alpha, key="k", order_by="ts"), ["w"], ["w_ewm"])]
        sliced = apply_keyed(
            rd.from_pandas(df).repartition(7), transforms, "k", "ts",
            num_buckets=8, skew_threshold=500, slice_target=300,
        ).to_pandas().sort_values(["k", "ts"]).reset_index(drop=True)
        exp = (
            df.sort_values(["k", "ts"])
            .groupby("k", sort=False)["w"]
            .transform(lambda s: s.ewm(alpha=alpha, adjust=False).mean())
            .reset_index(drop=True)
        )
        assert np.allclose(sliced["w_ewm"].to_numpy(), exp.to_numpy(), atol=1e-8), alpha
        whole = apply_keyed(
            rd.from_pandas(df).repartition(7), transforms, "k", "ts", num_buckets=8
        ).to_pandas().sort_values(["k", "ts"]).reset_index(drop=True)
        assert np.allclose(sliced["w_ewm"].to_numpy(), whole["w_ewm"].to_numpy(), atol=1e-10)
