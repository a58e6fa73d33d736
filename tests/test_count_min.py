"""Count-Min sketch (sketches.CountMinSketch / count_min)."""

import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from ballet_ray.stages.sketches import CountMinSketch, count_min


def test_overestimate_only_and_exact_when_sparse():
    s = CountMinSketch(width=1024, depth=5)
    keys = np.array([f"k{i}" for i in range(50)], dtype=object)
    counts = np.arange(1, 51, dtype=float)
    s.update(keys, counts)
    est = s.query(keys)
    assert (est >= counts).all()          # CMS never underestimates
    # 50 keys in 1024 columns: collisions are unlikely in EVERY row
    assert (est == counts).all()
    assert s.query(np.array(["absent"], dtype=object))[0] <= s.total


def test_merge_equals_single_pass():
    a, b = CountMinSketch(width=512, depth=4), CountMinSketch(width=512, depth=4)
    both = CountMinSketch(width=512, depth=4)
    k1 = np.array(["x", "y", "z"], dtype=object)
    k2 = np.array(["y", "z", "w"], dtype=object)
    a.update(k1); b.update(k2); both.update(k1); both.update(k2)
    np.testing.assert_array_equal(a.merge(b).matrix, both.matrix)
    assert a.total == both.total


def test_geometry_mismatch_raises():
    with pytest.raises(ValueError, match="geometry"):
        CountMinSketch(width=512, depth=4).merge(CountMinSketch(width=256, depth=4))


def test_distributed_fit_matches_local():
    rng = np.random.RandomState(8)
    vals = rng.zipf(1.5, 20_000).astype(str)
    ds = rd.from_pandas(pd.DataFrame({"v": vals})).repartition(6)
    sk = count_min(ds, "v", width=4096, depth=5)
    local = CountMinSketch(width=4096, depth=5).update(vals)
    np.testing.assert_array_equal(sk.matrix, local.matrix)
    assert sk.total == pytest.approx(len(vals))
    # error bound: est - true <= eps * N with eps = e/width, union over keys
    truth = pd.Series(vals).value_counts()
    top = truth.index[:100].to_numpy(dtype=object)
    est = sk.query(top)
    assert (est >= truth[top].to_numpy()).all()
    assert (est - truth[top].to_numpy() <= np.e / 4096 * sk.total + 1e-9).all()


def test_weighted_fit():
    df = pd.DataFrame({"term": ["a", "b", "a"], "tf": [3, 5, 2]})
    sk = count_min(rd.from_pandas(df).repartition(2), "term", count_col="tf",
                   width=256, depth=4)
    est = sk.query(np.array(["a", "b"], dtype=object))
    assert est[0] >= 5 and est[1] >= 5
    assert sk.total == pytest.approx(10)
