"""Multi-horizon point-in-time join (asof.asof_join_multi)."""

import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from ballet_ray.stages.asof import asof_join_multi


@pytest.fixture()
def frames():
    rng = np.random.RandomState(4)
    n_left, n_right = 400, 600
    base = pd.Timestamp("2026-01-10")
    left = pd.DataFrame({
        "eid": np.arange(n_left),
        "user": rng.randint(0, 12, n_left),
        "ts": base + pd.to_timedelta(rng.randint(0, 14 * 24 * 3600, n_left), unit="s"),
    })
    right = pd.DataFrame({
        "user": rng.randint(0, 12, n_right),
        "ts": base - pd.Timedelta("7d")
        + pd.to_timedelta(rng.randint(0, 20 * 24 * 3600, n_right), unit="s"),
        "bal": np.round(rng.randn(n_right), 3),
    })
    return left, right


def _reference(left, right, horizons):
    out = left[["eid"]].copy()
    r = right.sort_values(["ts", "user"]).reset_index(drop=True)
    for h in horizons:
        lab = str(h).replace(" ", "")
        shifted = left.assign(ts=left["ts"] - pd.Timedelta(h) if h != 0 else left["ts"])
        m = pd.merge_asof(
            shifted.sort_values("ts"), r, on="ts", by="user", direction="backward"
        ).sort_values("eid")
        out[f"bal_{lab}"] = m["bal"].to_numpy()
    return out


def test_matches_merge_asof_reference(frames):
    left, right = frames
    horizons = [0, "1d", "7d"]
    got = (
        asof_join_multi(
            rd.from_pandas(left).repartition(4),
            rd.from_pandas(right).repartition(3),
            on="ts", by="user", right_cols=["bal"],
            horizons=horizons, id_col="eid",
        )
        .to_pandas().sort_values("eid").reset_index(drop=True)
    )
    exp = _reference(left, right, horizons).reset_index(drop=True)
    assert list(got.columns) == ["eid", "bal_0", "bal_1d", "bal_7d"]
    assert len(got) == len(exp)
    for c in ("bal_0", "bal_1d", "bal_7d"):
        a, b = got[c].to_numpy(float), exp[c].to_numpy(float)
        both = ~(np.isnan(a) & np.isnan(b))
        np.testing.assert_allclose(a[both], b[both], atol=1e-12)


def test_hot_key_path(frames):
    left, right = frames
    # force one hot user + tiny skew threshold -> sliced path
    left.loc[: len(left) // 2, "user"] = 3
    right.loc[: len(right) // 2, "user"] = 3
    got = (
        asof_join_multi(
            rd.from_pandas(left).repartition(4),
            rd.from_pandas(right).repartition(3),
            on="ts", by="user", right_cols=["bal"],
            horizons=["1d"], id_col="eid",
            skew_threshold=50, slice_target=40,
        )
        .to_pandas().sort_values("eid").reset_index(drop=True)
    )
    exp = _reference(left, right, ["1d"]).reset_index(drop=True)
    a, b = got["bal_1d"].to_numpy(float), exp["bal_1d"].to_numpy(float)
    both = ~(np.isnan(a) & np.isnan(b))
    np.testing.assert_allclose(a[both], b[both], atol=1e-12)


def test_empty_horizons_raises(frames):
    left, right = frames
    with pytest.raises(ValueError, match="non-empty"):
        asof_join_multi(
            rd.from_pandas(left), rd.from_pandas(right),
            on="ts", by="user", right_cols=["bal"], horizons=[], id_col="eid",
        )
