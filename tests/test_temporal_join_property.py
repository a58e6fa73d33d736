"""Property-based window_join / interval_join correctness: arbitrary tiny
streams with dense timestamp collisions vs brute nested-loop references,
normal AND forced-skew paths. The sibling of test_asof_property.py (whose
first run caught a real carry-tie bug in asof_join's skew path)."""

import numpy as np
import pandas as pd
import ray.data as rd
from hypothesis import given, settings
from hypothesis import strategies as st

from ballet_ray.stages.asof import interval_join, window_join


@st.composite
def event_streams(draw):
    keys = ["a", "b"]
    n_left = draw(st.integers(1, 15))
    n_right = draw(st.integers(0, 15))
    ts_dom = st.integers(0, 10)
    left = pd.DataFrame(
        {
            "k": draw(st.lists(st.sampled_from(keys), min_size=n_left, max_size=n_left)),
            "ts": draw(st.lists(ts_dom, min_size=n_left, max_size=n_left)),
        }
    )
    left["rid"] = np.arange(n_left, dtype=np.int64)
    right = pd.DataFrame(
        {
            "k": draw(st.lists(st.sampled_from(keys), min_size=n_right, max_size=n_right)),
            "ts": draw(st.lists(ts_dom, min_size=n_right, max_size=n_right)),
        }
    )
    right["v"] = np.arange(n_right, dtype=np.float64) + 1.0
    return left, right


@settings(max_examples=20, deadline=None, derandomize=True)
@given(event_streams(), st.integers(1, 6), st.booleans())
def test_window_join_matches_brute(data, window, force_skew):
    left, right = data
    kw = dict(on="ts", by="k", window=window, aggs={"v": ("sum", "mean", "min", "max")},
              num_buckets=4)
    if force_skew:
        kw.update(skew_threshold=1, slice_target=3)
    rds = (rd.from_pandas(right).repartition(2) if len(right)
           else rd.from_pandas(pd.DataFrame({"k": ["zz"], "ts": [-99], "v": [0.0]})))
    got = (
        window_join(rd.from_pandas(left).repartition(3), rds, **kw)
        .to_pandas().sort_values("rid").reset_index(drop=True)
    )
    for _, row in got.iterrows():
        m = right[(right.k == row.k) & (right.ts >= row.ts - window) & (right.ts < row.ts)]
        assert row.w_count == len(m), (row.rid, "count")
        if len(m):
            assert np.isclose(row.v_sum, m.v.sum())
            assert np.isclose(row.v_mean, m.v.mean())
            assert np.isclose(row.v_min, m.v.min())
            assert np.isclose(row.v_max, m.v.max())
        else:
            assert np.isnan(row.v_sum) and np.isnan(row.v_mean)
            assert np.isnan(row.v_min) and np.isnan(row.v_max)


@st.composite
def interval_streams(draw):
    keys = ["a", "b"]
    n_left = draw(st.integers(1, 15))
    n_iv = draw(st.integers(1, 6))
    ts_dom = st.integers(0, 12)
    left = pd.DataFrame(
        {
            "k": draw(st.lists(st.sampled_from(keys), min_size=n_left, max_size=n_left)),
            "ts": draw(st.lists(ts_dom, min_size=n_left, max_size=n_left)),
        }
    )
    left["rid"] = np.arange(n_left, dtype=np.int64)
    # NON-OVERLAPPING intervals per key (the operator's documented
    # contract): cut each key's timeline at sorted distinct points
    rows = []
    for k in keys:
        pts = sorted(set(draw(st.lists(ts_dom, min_size=2, max_size=n_iv + 1))))
        for s, e in zip(pts, pts[1:]):
            rows.append({"k": k, "start_ts": s, "end_ts": e, "price": float(s * 10 + e)})
    if not rows:  # all keys drew degenerate point sets — pin one interval
        rows.append({"k": "a", "start_ts": 0, "end_ts": 1, "price": 1.0})
    return left, pd.DataFrame(rows)


@settings(max_examples=20, deadline=None, derandomize=True)
@given(interval_streams(), st.sampled_from(["left", "both"]), st.booleans())
def test_interval_join_matches_brute(data, closed, force_skew):
    left, iv = data
    kw = dict(on="ts", by="k", value_cols=["price"], closed=closed, num_buckets=4)
    if force_skew:
        kw.update(skew_threshold=1, slice_target=3)
    got = (
        interval_join(rd.from_pandas(left).repartition(3),
                      rd.from_pandas(iv).repartition(2), **kw)
        .to_pandas().sort_values("rid").reset_index(drop=True)
    )
    for _, row in got.iterrows():
        cand = iv[(iv.k == row.k) & (iv.start_ts <= row.ts)]
        want = np.nan
        if len(cand):
            best = cand.sort_values(["start_ts"]).iloc[-1]
            inside = (row.ts < best.end_ts) if closed == "left" else (row.ts <= best.end_ts)
            if inside:
                want = best.price
        if np.isnan(want):
            assert pd.isna(row.price), (row.rid, row.k, row.ts)
        else:
            assert row.price == want, (row.rid, row.k, row.ts)
