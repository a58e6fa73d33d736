"""Point-in-interval (validity-period) join."""

import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from ballet_ray.stages.asof import interval_join

TS = pd.Timestamp


def _brute(left, ivl, closed="left"):
    """Latest start <= ts; value if the end bound admits ts."""
    out = []
    for _, r in left.iterrows():
        cand = ivl[(ivl["user_id"] == r["user_id"]) & (ivl["start_ts"] <= r["event_ts"])]
        if len(cand):
            best = cand.sort_values("start_ts").iloc[-1]
            inside = (r["event_ts"] < best["end_ts"] if closed == "left"
                      else r["event_ts"] <= best["end_ts"])
            out.append(best["price"] if inside else None)
        else:
            out.append(None)
    return out


def _data(seed=0, n_left=400, n_users=8):
    rng = np.random.default_rng(seed)
    base = TS("2024-01-01")
    left = pd.DataFrame({
        "user_id": rng.integers(0, n_users, n_left),
        "event_ts": [base + pd.Timedelta(minutes=int(x))
                     for x in rng.integers(0, 5000, n_left)],
        "amount": rng.uniform(1, 100, n_left),
    })
    rows = []
    for u in range(n_users):
        t = 0
        while t < 5000:
            dur = int(rng.integers(100, 600))
            gap = int(rng.integers(0, 200))  # gaps -> unmatched events
            rows.append((u, base + pd.Timedelta(minutes=t),
                         base + pd.Timedelta(minutes=t + dur),
                         float(rng.uniform(5, 50))))
            t += dur + gap
    ivl = pd.DataFrame(rows, columns=["user_id", "start_ts", "end_ts", "price"])
    return left, ivl


@pytest.mark.parametrize("closed", ["left", "both"])
def test_matches_brute(ray_session, closed):
    left, ivl = _data()
    got = interval_join(
        rd.from_pandas(left).repartition(4), rd.from_pandas(ivl).repartition(3),
        on="event_ts", by="user_id", value_cols=["price"], closed=closed,
    ).to_pandas().sort_values(["user_id", "event_ts", "amount"]).reset_index(drop=True)
    ref = left.copy()
    ref["price"] = _brute(left, ivl, closed)
    ref = ref.sort_values(["user_id", "event_ts", "amount"]).reset_index(drop=True)
    assert len(got) == len(ref)
    pd.testing.assert_series_equal(got["price"], ref["price"].astype(float),
                                   check_names=False)


def test_boundaries(ray_session):
    base = TS("2024-01-01")
    left = pd.DataFrame({
        "user_id": [1, 1, 1, 1],
        "event_ts": [base, base + pd.Timedelta(minutes=59),
                     base + pd.Timedelta(minutes=60), base - pd.Timedelta(minutes=1)],
    })
    ivl = pd.DataFrame({
        "user_id": [1],
        "start_ts": [base],
        "end_ts": [base + pd.Timedelta(minutes=60)],
        "price": [7.0],
    })
    got = interval_join(rd.from_pandas(left), rd.from_pandas(ivl),
                        on="event_ts", by="user_id", value_cols=["price"]
                        ).to_pandas().sort_values("event_ts").reset_index(drop=True)
    # before-start and at-end excluded under [start, end); start included
    assert np.isnan(got.loc[0, "price"])          # ts < start
    assert got.loc[1, "price"] == 7.0             # ts == start
    assert got.loc[2, "price"] == 7.0             # inside
    assert np.isnan(got.loc[3, "price"])          # ts == end, closed='left'
    both = interval_join(rd.from_pandas(left), rd.from_pandas(ivl),
                         on="event_ts", by="user_id", value_cols=["price"],
                         closed="both").to_pandas().sort_values("event_ts").reset_index(drop=True)
    assert both.loc[3, "price"] == 7.0            # ts == end, closed='both'


def test_skew_path_parity(ray_session):
    left, ivl = _data(seed=3)
    # force the hot-entity slicing path and compare against the plain path
    a = interval_join(rd.from_pandas(left).repartition(4),
                      rd.from_pandas(ivl).repartition(2),
                      on="event_ts", by="user_id", value_cols=["price"]).to_pandas()
    b = interval_join(rd.from_pandas(left).repartition(4),
                      rd.from_pandas(ivl).repartition(2),
                      on="event_ts", by="user_id", value_cols=["price"],
                      skew_threshold=10, slice_target=50).to_pandas()
    key = ["user_id", "event_ts", "amount"]
    a = a.sort_values(key).reset_index(drop=True)
    b = b.sort_values(key).reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)


def test_validation(ray_session):
    left, ivl = _data(seed=5, n_left=10)
    with pytest.raises(ValueError):
        interval_join(rd.from_pandas(left), rd.from_pandas(ivl),
                      on="event_ts", by="user_id", value_cols=["price"],
                      closed="right")
