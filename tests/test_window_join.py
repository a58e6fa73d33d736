"""Windowed join (left rows + right-side aggregates over [ts-w, ts)):
brute-force oracle, hot-entity skew path, null/empty-window semantics."""

import numpy as np
import pandas as pd
import ray.data as rd

from ballet_ray.stages.asof import window_join


def _mk(seed, n_left, n_right, keys, span_ms=7_200_000, null_frac=0.0, hot=None):
    rng = np.random.default_rng(seed)
    t0 = pd.Timestamp("2024-01-01")

    def draw(n):
        k = rng.choice(keys, n)
        if hot is not None:
            k = np.where(rng.random(n) < hot[1], hot[0], k)
        return k

    left = pd.DataFrame(
        {
            "id": np.arange(n_left),
            "k": draw(n_left),
            "ts": t0 + pd.to_timedelta(rng.integers(0, span_ms, n_left), unit="ms"),
        }
    )
    v = rng.normal(size=n_right)
    if null_frac:
        v = np.where(rng.random(n_right) < null_frac, np.nan, v)
    right = pd.DataFrame(
        {
            "k": draw(n_right),
            "ts": t0 + pd.to_timedelta(rng.integers(0, span_ms, n_right), unit="ms"),
            "v": v,
        }
    )
    return left, right


def _brute(left, right, window):
    recs = []
    for _, r in left.iterrows():
        sub = right[(right.k == r.k) & (right.ts >= r.ts - window) & (right.ts < r.ts)]
        v = sub.v.dropna()
        recs.append(
            {
                "id": r.id,
                "w_count": len(sub),
                "v_sum": v.sum() if len(v) else np.nan,
                "v_mean": v.mean() if len(v) else np.nan,
                "v_min": v.min() if len(v) else np.nan,
                "v_max": v.max() if len(v) else np.nan,
                "v_count_nonnull": len(v),
            }
        )
    return pd.DataFrame(recs)


ALL_AGGS = ("sum", "mean", "min", "max", "count_nonnull")


def _run(left, right, window="5min", **kw):
    out = window_join(
        rd.from_pandas(left).repartition(6),
        rd.from_pandas(right).repartition(5),
        on="ts",
        by="k",
        window=window,
        aggs={"v": ALL_AGGS},
        count_name="w_count",
        num_buckets=8,
        **kw,
    )
    return out.to_pandas().sort_values("id").reset_index(drop=True)


def _compare(out, exp):
    exp = exp.sort_values("id").reset_index(drop=True)
    assert (out.w_count.to_numpy() == exp.w_count.to_numpy()).all()
    assert (out.v_count_nonnull.to_numpy() == exp.v_count_nonnull.to_numpy()).all()
    for c in ["v_sum", "v_mean", "v_min", "v_max"]:
        a = out[c].to_numpy(dtype=float)
        b = exp[c].to_numpy(dtype=float)
        assert np.allclose(a, b, equal_nan=True, atol=1e-9), c


def test_window_join_matches_brute_force():
    left, right = _mk(3, 1500, 2500, [f"u{i}" for i in range(30)], null_frac=0.15)
    out = _run(left, right)
    _compare(out, _brute(left, right, pd.Timedelta("5min")))


def test_window_join_skew_path_matches_brute_force():
    left, right = _mk(5, 2500, 2500, [f"u{i}" for i in range(20)], hot=("HOT", 0.6))
    out = _run(left, right, window="10min", skew_threshold=400, slice_target=300)
    _compare(out, _brute(left, right, pd.Timedelta("10min")))


def test_window_join_strictly_before_no_leakage():
    # a right row at EXACTLY the left timestamp must not be included
    left = pd.DataFrame(
        {"id": [0], "k": ["a"], "ts": [pd.Timestamp("2024-01-01 10:00:00")]}
    )
    right = pd.DataFrame(
        {
            "k": ["a", "a", "a"],
            "ts": pd.to_datetime(
                ["2024-01-01 10:00:00", "2024-01-01 09:59:59", "2024-01-01 08:00:00"]
            ),
            "v": [100.0, 1.0, 50.0],
        }
    )
    out = _run(left, right, window="1h")
    assert out.w_count.iloc[0] == 1  # only 09:59:59 — not 10:00 (exact), not 08:00 (outside)
    assert out.v_sum.iloc[0] == 1.0


def test_window_join_empty_window_is_null():
    left = pd.DataFrame(
        {"id": [0, 1], "k": ["a", "b"], "ts": pd.to_datetime(["2024-01-02", "2024-01-02"])}
    )
    right = pd.DataFrame(
        {"k": ["a"], "ts": pd.to_datetime(["2024-01-01"]), "v": [5.0]}
    )
    out = _run(left, right, window="1h")
    assert (out.w_count == 0).all()
    assert out.v_sum.isna().all() and out.v_min.isna().all()
    assert (out.v_count_nonnull == 0).all()


def test_window_join_integer_value_column_roundtrip():
    # min/max cast back to the source integer type
    left = pd.DataFrame(
        {"id": [0], "k": ["a"], "ts": [pd.Timestamp("2024-01-01 01:00:00")]}
    )
    right = pd.DataFrame(
        {
            "k": ["a", "a"],
            "ts": pd.to_datetime(["2024-01-01 00:30:00", "2024-01-01 00:40:00"]),
            "v": np.array([7, 3], dtype=np.int64),
        }
    )
    out = window_join(
        rd.from_pandas(left),
        rd.from_pandas(right),
        on="ts",
        by="k",
        window="1h",
        aggs={"v": ("min", "max")},
    ).to_pandas()
    assert out.v_min.iloc[0] == 3 and out.v_max.iloc[0] == 7
