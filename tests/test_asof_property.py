"""Property-based as-of join correctness: for ARBITRARY small event
streams (heavy timestamp ties, single keys, empty-ish sides, keys with no
right rows), asof_join must equal pd.merge_asof row-for-row, under both
allow_exact settings and under the skew path. The seeded oracle tests in
test_asof.py cover bulk shapes; hypothesis hunts the boundary shapes a
seed never draws."""

import numpy as np
import pandas as pd
import ray.data as rd
from hypothesis import given, settings
from hypothesis import strategies as st

from ballet_ray.stages.asof import asof_join


@st.composite
def streams(draw):
    keys = ["a", "b", "c"]
    n_left = draw(st.integers(1, 25))
    n_right = draw(st.integers(0, 25))
    # tiny ts domain → dense exact-timestamp collisions within and across
    # sides, the regime where allow_exact and tie-ordering bugs live
    ts_dom = st.integers(0, 12)
    left = pd.DataFrame(
        {
            "k": draw(st.lists(st.sampled_from(keys), min_size=n_left, max_size=n_left)),
            "ts": draw(st.lists(ts_dom, min_size=n_left, max_size=n_left)),
        }
    )
    left["payload"] = np.arange(n_left, dtype=np.int64)
    right = pd.DataFrame(
        {
            "k": draw(st.lists(st.sampled_from(keys), min_size=n_right, max_size=n_right)),
            "ts": draw(st.lists(ts_dom, min_size=n_right, max_size=n_right)),
        }
    )
    right["val"] = np.arange(n_right, dtype=np.float64) + 100.0
    # dedupe (k, ts) on the right so the match is well-defined
    right = right.drop_duplicates(subset=["k", "ts"]).reset_index(drop=True)
    return left, right


def _oracle(left, right, allow_exact):
    lo = left.sort_values("ts", kind="stable").reset_index(drop=True)
    if len(right) == 0:
        out = lo.copy()
        out["val"] = np.nan
        return out
    ro = right.sort_values("ts", kind="stable").reset_index(drop=True)
    return pd.merge_asof(
        lo, ro, on="ts", by="k", direction="backward",
        allow_exact_matches=allow_exact,
    )


@settings(max_examples=25, deadline=None, derandomize=True)
@given(streams(), st.booleans(), st.booleans())
def test_asof_join_matches_merge_asof(data, allow_exact, force_skew):
    left, right = data
    kw = dict(on="ts", by="k", right_cols=["val"], allow_exact=allow_exact,
              num_buckets=4)
    if force_skew:
        # threshold 1 pushes every key down the hot-slice carry path
        kw.update(skew_threshold=1, slice_target=4)
    got = asof_join(
        rd.from_pandas(left).repartition(3),
        rd.from_pandas(right).repartition(2) if len(right) else rd.from_pandas(
            pd.DataFrame({"k": ["zz"], "ts": [-999], "val": [np.nan]})),
        **kw,
    ).to_pandas()
    exp = _oracle(left, right, allow_exact)
    order = ["k", "ts", "payload"]
    got = got.sort_values(order).reset_index(drop=True)
    exp = exp.sort_values(order).reset_index(drop=True)
    assert len(got) == len(exp)
    assert got["payload"].tolist() == exp["payload"].tolist()
    assert np.allclose(
        got["val"].to_numpy(float), exp["val"].to_numpy(float), equal_nan=True
    )
