"""Full tsfresh-style catalogue (hot + whole-group paths) and the
coarse-partition grouped_reduce helper."""

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

from ballet_ray.stages.aggregates import (
    _TS_FEATURES_FULL,
    _per_entity_stats,
    extract_ts_features,
)


def _entities():
    rng = np.random.RandomState(7)
    frames = []
    for i, sz in enumerate([5000, 300, 120, 7, 1, 2]):
        frames.append(
            pd.DataFrame(
                {"k": f"e{i}", "ts": np.arange(sz), "v": rng.randn(sz) * (i + 1) + i}
            )
        )
    return pd.concat(frames, ignore_index=True).sample(frac=1.0, random_state=3).reset_index(
        drop=True
    )


def test_kernel_formulas_against_numpy():
    rng = np.random.RandomState(1)
    x = rng.randn(500) * 3 + 1
    row = _per_entity_stats(x, _TS_FEATURES_FULL)
    assert np.isclose(row["skewness"], ((x - x.mean()) ** 3).mean() / x.std() ** 3)
    assert np.isclose(row["kurtosis"], ((x - x.mean()) ** 4).mean() / x.std() ** 4 - 3)
    assert np.isclose(row["linear_trend_slope"], np.polyfit(np.arange(len(x)), x, 1)[0])
    assert np.isclose(row["quantile_25"], np.quantile(x, 0.25))
    assert np.isclose(row["quantile_75"], np.quantile(x, 0.75))
    assert np.isclose(row["root_mean_square"], np.sqrt((x**2).mean()))
    assert np.isclose(row["cid_ce"], np.sqrt((np.diff(x) ** 2).sum()))
    assert np.isclose(row["mean_change"], (x[-1] - x[0]) / (len(x) - 1))
    assert row["number_crossings_mean"] == int(
        ((x[1:] > x.mean()) != (x[:-1] > x.mean())).sum()
    )
    assert np.isclose(
        row["ratio_beyond_2sigma"], (np.abs(x - x.mean()) > 2 * x.std()).mean()
    )


def test_full_catalogue_hot_and_cold_paths_match_kernel(ray_session):
    df = _entities()
    ds = rd.from_pandas(df).repartition(6)
    out = extract_ts_features(
        ds, key="k", order_by=["ts"], value_col="v",
        features=_TS_FEATURES_FULL, skew_threshold=1000, slice_target=600,
    )
    got = out.to_pandas().sort_values("k").reset_index(drop=True)
    rows = []
    for k, g in df.groupby("k"):
        x = g.sort_values("ts")["v"].to_numpy()
        row = {"k": k}
        for f, v in _per_entity_stats(x, _TS_FEATURES_FULL).items():
            row[f"v_{f}"] = v
        rows.append(row)
    exp = pd.DataFrame(rows).sort_values("k").reset_index(drop=True)
    for c in exp.columns:
        if c == "k":
            continue
        assert np.allclose(
            got[c].to_numpy(dtype=float),
            exp[c].to_numpy(dtype=float),
            rtol=1e-9, atol=1e-9, equal_nan=True,
        ), c


def test_all_nan_hot_entity_survives(ray_session):
    df = _entities()
    nanframe = pd.DataFrame({"k": "nanhot", "ts": np.arange(2000), "v": np.nan})
    ds = rd.from_pandas(pd.concat([df, nanframe], ignore_index=True)).repartition(4)
    got = (
        extract_ts_features(
            ds, key="k", order_by=["ts"], value_col="v",
            features=("n", "mean", "absolute_sum_of_changes", "count_above_mean"),
            skew_threshold=1000, slice_target=600,
        )
        .to_pandas()
        .set_index("k")
    )
    assert got.loc["nanhot", "v_n"] == 0
    assert np.isnan(got.loc["nanhot", "v_mean"])
    assert got.loc["nanhot", "v_absolute_sum_of_changes"] == 0.0
    assert got.loc["nanhot", "v_count_above_mean"] == 0


def test_grouped_reduce_matches_pandas(ray_session):
    from ballet_ray.functions.reduce import grouped_reduce

    rng = np.random.RandomState(0)
    n = 20_000
    df = pd.DataFrame(
        {
            "k": [f"id{j:05d}" for j in rng.randint(0, 5_000, n)],
            "a": rng.randint(0, 100, n).astype(np.int64),
            "b": rng.randn(n),
        }
    )
    ds = rd.from_pandas(df).repartition(7)
    got = (
        grouped_reduce(ds, "k", {"a": "sum", "b": "min"}, num_parts=8)
        .to_pandas()
        .sort_values("k")
        .reset_index(drop=True)
    )
    exp = df.groupby("k").agg({"a": "sum", "b": "min"}).reset_index()
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)


def test_grouped_reduce_pre_combine_and_multikey(ray_session):
    from ballet_ray.functions.reduce import grouped_reduce

    rng = np.random.RandomState(1)
    n = 10_000
    df = pd.DataFrame(
        {
            "k1": rng.randint(0, 50, n).astype(np.int64),
            "k2": [f"s{j}" for j in rng.randint(0, 40, n)],
            "x": rng.randn(n),
        }
    )
    ds = rd.from_pandas(df).repartition(5)
    got = (
        grouped_reduce(ds, ["k1", "k2"], {"x": "sum"}, num_parts=8, pre_combine=True)
        .to_pandas()
        .sort_values(["k1", "k2"])
        .reset_index(drop=True)
    )
    exp = df.groupby(["k1", "k2"]).agg({"x": "sum"}).reset_index().sort_values(
        ["k1", "k2"]
    ).reset_index(drop=True)
    assert np.allclose(got["x"], exp["x"])
    assert (got["k1"] == exp["k1"]).all() and (got["k2"] == exp["k2"]).all()

    import pytest

    with pytest.raises(ValueError):
        grouped_reduce(ds, "k1", {"x": "mean"}, pre_combine=True)
