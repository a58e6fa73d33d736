"""Skew-proofing of the per-entity generators: a planted hot entity (25%
of all rows) must be computed by the bounded scale passes, never as one
unbounded pandas group, and the results must match a pandas oracle."""

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd


def _hot_frame(n=20_000, hot_frac=0.25, n_cold=50, seed=11):
    rng = np.random.RandomState(seed)
    n_hot = int(n * hot_frac)
    keys = np.concatenate(
        [np.zeros(n_hot, dtype=np.int64), rng.randint(1, n_cold + 1, n - n_hot)]
    )
    df = pd.DataFrame(
        {
            "user_id": keys,
            "ts": rng.randint(0, 10_000_000, n).astype(np.int64),
            "event_id": np.arange(n, dtype=np.int64),
            # lognormal → skewed value distribution stresses the bucket
            # selection; exact duplicates stress degenerate ranges
            "value": np.where(rng.rand(n) < 0.1, 7.5, rng.lognormal(0, 2, n)),
        }
    )
    return df


def _pandas_ts_oracle(df):
    rows = []
    for k, g in df.groupby("user_id"):
        g = g.sort_values(["ts", "event_id"])
        x = g["value"].to_numpy(dtype=np.float64)
        x = x[~np.isnan(x)]
        n = len(x)
        rows.append(
            {
                "user_id": k,
                "value_mean": x.mean(),
                "value_std": x.std(),
                "value_min": x.min(),
                "value_max": x.max(),
                "value_median": float(np.median(x)),
                "value_abs_energy": float((x * x).sum()),
                "value_mean_abs_change": float(np.abs(np.diff(x)).mean()),
                "value_count_above_mean": int((x > x.mean()).sum()),
                "value_n": n,
            }
        )
    return pd.DataFrame(rows).sort_values("user_id").reset_index(drop=True)


def test_ts_features_hot_entity_matches_oracle():
    from ballet_ray.stages.aggregates import extract_ts_features

    df = _hot_frame()
    out = (
        extract_ts_features(
            rd.from_pandas(df).repartition(8),
            key="user_id",
            order_by=["ts", "event_id"],
            value_col="value",
            skew_threshold=2_000,  # hot entity (5k rows) exceeds it
            slice_target=1_000,
        )
        .to_pandas()
        .sort_values("user_id")
        .reset_index(drop=True)
    )
    oracle = _pandas_ts_oracle(df)
    assert len(out) == len(oracle)
    for c in oracle.columns:
        if c == "user_id":
            assert (out[c].to_numpy() == oracle[c].to_numpy()).all()
        else:
            assert np.allclose(
                out[c].to_numpy(dtype=np.float64),
                oracle[c].to_numpy(dtype=np.float64),
                rtol=1e-9, atol=1e-9, equal_nan=True,
            ), c


def test_ts_features_whole_group_guard():
    """The non-hot path structurally asserts its groups stay bounded: an
    entity above the threshold routed there must raise, proving per-task
    row counts are guarded, not assumed."""
    import pytest

    from ballet_ray.stages.aggregates import extract_ts_features

    df = _hot_frame(n=4000, hot_frac=0.5)
    # monkey-route: threshold below the hot entity's size but hot split
    # disabled by patching the count pass to find nothing
    import ballet_ray.stages.aggregates as agg

    orig = agg._grouped_count
    try:
        agg._grouped_count = lambda ds, key: rd.from_pandas(
            pd.DataFrame({key: [], "__cnt": []})
        )
        with pytest.raises(Exception):
            extract_ts_features(
                rd.from_pandas(df),
                key="user_id",
                order_by=["ts", "event_id"],
                value_col="value",
                skew_threshold=500,
            ).materialize()
    finally:
        agg._grouped_count = orig


def test_hot_median_exact_on_duplicates_and_skew():
    from ballet_ray.stages.aggregates import _hot_base_stats, _hot_median

    rng = np.random.RandomState(3)
    # heavy duplicates: >cap identical values around the median
    v1 = np.concatenate([rng.lognormal(0, 3, 5000), np.full(5000, 2.0)])
    v2 = rng.randn(7001) * 1e6
    df = pd.DataFrame(
        {
            "k": np.concatenate([np.zeros(len(v1), np.int64), np.ones(len(v2), np.int64)]),
            "v": np.concatenate([v1, v2]),
        }
    )
    ds = rd.from_pandas(df).repartition(6)
    base = _hot_base_stats(ds, "k", "v")
    med = _hot_median(ds, "k", "v", base, collect_cap=800, buckets=16)
    assert np.isclose(med[0], np.median(v1))
    assert np.isclose(med[1], np.median(v2))


def test_dfs_combiner_matches_pandas_with_nulls_and_hot_key():
    from ballet_ray.stages.aggregates import dfs_aggregate_features

    rng = np.random.RandomState(9)
    n = 12_000
    child = pd.DataFrame(
        {
            "pk": np.where(rng.rand(n) < 0.3, 1, rng.randint(2, 200, n)),
            "a": np.where(rng.rand(n) < 0.2, np.nan, rng.randn(n)),
        }
    )
    parent = pd.DataFrame({"pk": np.arange(0, 220, dtype=np.int64)})
    out = (
        dfs_aggregate_features(
            rd.from_pandas(parent),
            rd.from_pandas(child).repartition(7),
            parent_key="pk",
            value_cols=["a"],
            aggs=("count", "sum", "mean", "min", "max", "std"),
            fill_missing=None,
        )
        .to_pandas()
        .sort_values("pk")
        .reset_index(drop=True)
    )
    g = child.groupby("pk")["a"]
    expect = pd.DataFrame(
        {
            "pk": parent["pk"],
            "child_count": parent["pk"].map(child.groupby("pk").size()),
            "a_sum": parent["pk"].map(g.sum(min_count=1)),
            "a_mean": parent["pk"].map(g.mean()),
            "a_min": parent["pk"].map(g.min()),
            "a_max": parent["pk"].map(g.max()),
            "a_std": parent["pk"].map(g.std(ddof=0)),
        }
    ).sort_values("pk").reset_index(drop=True)
    for c in ["child_count", "a_sum", "a_mean", "a_min", "a_max", "a_std"]:
        assert np.allclose(
            out[c].to_numpy(dtype=np.float64),
            expect[c].to_numpy(dtype=np.float64),
            equal_nan=True,
        ), c
