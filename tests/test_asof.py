"""As-of join correctness: pd.merge_asof oracle, leakage audit, skew path."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data as rd

from ballet_ray.stages.asof import asof_join, backfill


def _mk(seed=7, n_left=3000, n_right=1500, n_keys=40):
    rng = np.random.RandomState(seed)
    t0 = pd.Timestamp("2020-01-01")
    left = pd.DataFrame(
        {
            "k": [f"e{val:03d}" for val in rng.randint(0, n_keys, n_left)],
            "ts": t0 + pd.to_timedelta(rng.randint(0, 10_000_000, n_left), unit="s"),
            "payload": rng.randn(n_left),
        }
    )
    right = pd.DataFrame(
        {
            "k": [f"e{val:03d}" for val in rng.randint(0, n_keys, n_right)],
            "ts": t0 + pd.to_timedelta(rng.randint(0, 10_000_000, n_right), unit="s"),
            "val": rng.randn(n_right),
        }
    )
    # drop duplicate (k, ts) on the right so the match is deterministic
    right = right.drop_duplicates(subset=["k", "ts"]).reset_index(drop=True)
    return left, right


def _oracle(left, right, allow_exact=True):
    lo = left.sort_values("ts").reset_index(drop=True)
    ro = right.sort_values("ts").reset_index(drop=True)
    return pd.merge_asof(
        lo, ro, on="ts", by="k", direction="backward", allow_exact_matches=allow_exact
    )


def _run_and_compare(left, right, allow_exact=True, **kw):
    out = asof_join(
        rd.from_pandas(left).repartition(6),
        rd.from_pandas(right).repartition(5),
        on="ts",
        by="k",
        right_cols=["val"],
        allow_exact=allow_exact,
        **kw,
    ).to_pandas()
    exp = _oracle(left, right, allow_exact)
    got = out.sort_values(["k", "ts", "payload"]).reset_index(drop=True)
    exp = exp.sort_values(["k", "ts", "payload"]).reset_index(drop=True)
    assert len(got) == len(exp)
    assert np.allclose(got["val"].to_numpy(), exp["val"].to_numpy(), equal_nan=True)


def test_asof_backward_exact(ray_session=None):
    left, right = _mk()
    _run_and_compare(left, right, allow_exact=True)


def test_asof_backward_strict():
    left, right = _mk(seed=11)
    # force exact-timestamp collisions between left and right
    left.loc[:50, "ts"] = right.loc[:50, "ts"].values
    left.loc[:50, "k"] = right.loc[:50, "k"].values
    _run_and_compare(left, right, allow_exact=False)


def test_asof_no_leakage_audit():
    """Adversarial: future right values are wildly different; joined value
    must never come from ts' > ts."""
    t0 = pd.Timestamp("2020-01-01")
    left = pd.DataFrame(
        {"k": ["a"] * 5, "ts": t0 + pd.to_timedelta([10, 20, 30, 40, 50], "s"), "payload": 0.0}
    )
    right = pd.DataFrame(
        {
            "k": ["a"] * 4,
            "ts": t0 + pd.to_timedelta([5, 25, 45, 60], "s"),
            "val": [1.0, 2.0, 3.0, 1e9],  # 1e9 exists only in the future
        }
    )
    out = (
        asof_join(rd.from_pandas(left), rd.from_pandas(right), on="ts", by="k", right_cols=["val"])
        .to_pandas()
        .sort_values("ts")
    )
    assert out["val"].tolist() == [1.0, 1.0, 2.0, 2.0, 3.0]


def test_asof_skew_path_matches_oracle():
    """One hot key owning most rows, low threshold → time-sliced sub-
    partitions with carry rows; result must equal the plain oracle."""
    left, right = _mk(seed=13, n_left=4000, n_right=800, n_keys=5)
    left.loc[: len(left) // 2, "k"] = "hot"
    right.loc[: len(right) // 3, "k"] = "hot"
    right = right.drop_duplicates(subset=["k", "ts"]).reset_index(drop=True)
    _run_and_compare(left, right, allow_exact=True, skew_threshold=200, slice_target=100)


def test_asof_entity_with_no_right_rows():
    left, right = _mk(seed=17, n_keys=10)
    right = right[right["k"] != "e003"].reset_index(drop=True)
    _run_and_compare(left, right)


def test_backfill_grid():
    """Backfill = as-of of an entity×timestamp grid against features."""
    t0 = pd.Timestamp("2020-01-01")
    feats = pd.DataFrame(
        {
            "k": ["a", "a", "b"],
            "ts": t0 + pd.to_timedelta([0, 100, 50], "s"),
            "f1": [1.0, 2.0, 7.0],
        }
    )
    grid = pd.DataFrame(
        {
            "k": ["a", "a", "b", "b"],
            "ts": t0 + pd.to_timedelta([50, 150, 25, 75], "s"),
        }
    )
    out = (
        backfill(rd.from_pandas(grid), rd.from_pandas(feats), on="ts", by="k", feature_cols=["f1"])
        .to_pandas()
        .sort_values(["k", "ts"])
    )
    vals = out["f1"].tolist()
    assert vals[0] == 1.0 and vals[1] == 2.0 and np.isnan(vals[2]) and vals[3] == 7.0


def test_asof_skew_strict_mode():
    """Skew slicing with allow_exact=False: carry rows must still win on
    slice-boundary timestamp ties (side=2 tie ordering)."""
    left, right = _mk(seed=23, n_left=2500, n_right=600, n_keys=4)
    left.loc[: len(left) // 2, "k"] = "hot"
    right.loc[: len(right) // 3, "k"] = "hot"
    right = right.drop_duplicates(subset=["k", "ts"]).reset_index(drop=True)
    _run_and_compare(left, right, allow_exact=False, skew_threshold=200, slice_target=100)


def test_asof_audit_column_proves_no_leakage():
    """audit=True appends matched_source_ts; every row must satisfy
    matched_source_ts <= ts (zero temporal leakage, checkable per row)."""
    left, right = _mk(seed=29)
    out = asof_join(
        rd.from_pandas(left), rd.from_pandas(right), on="ts", by="k",
        right_cols=["val"], audit=True,
    ).to_pandas()
    m = out["matched_source_ts"].notna()
    assert m.any()
    assert (out.loc[m, "matched_source_ts"] <= out.loc[m, "ts"]).all()
