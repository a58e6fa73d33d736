"""Round-3 operators: histogram-CART encoder/discretiser, GLMM shrinkage
encoding, depth-2 DFS."""

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

from ballet_ray.feature import Feature
from ballet_ray.pipeline import FeatureEngineeringPipeline


def _ref_hist_cart(cnt, s, ss, max_depth):
    """Independent brute-force reference: enumerate every boundary split,
    recurse greedily — must equal the production _grow_tree."""
    leaves = []

    def sse_of(c, sv, ssv):
        C, S, SS = c.sum(), sv.sum(), ssv.sum()
        return SS - S * S / C if C > 0 else 0.0

    def rec(lo, hi, depth):
        c, sv, ssv = cnt[lo:hi + 1], s[lo:hi + 1], ss[lo:hi + 1]
        best = None
        if depth < max_depth and hi > lo:
            for k in range(hi - lo):
                cl, cr = c[: k + 1].sum(), c[k + 1:].sum()
                if cl <= 0 or cr <= 0:
                    continue
                tot = sse_of(c[: k + 1], sv[: k + 1], ssv[: k + 1]) + sse_of(
                    c[k + 1:], sv[k + 1:], ssv[k + 1:]
                )
                if best is None or tot < best[1] - 1e-15:
                    best = (k, tot)
            parent = sse_of(c, sv, ssv)
            if best is not None and not (best[1] < parent - 1e-12 * max(abs(parent), 1.0)):
                best = None
        if best is None:
            tot = c.sum()
            leaves.append((hi, sv.sum() / tot if tot > 0 else np.nan))
            return
        rec(lo, lo + best[0], depth + 1)
        rec(lo + best[0] + 1, hi, depth + 1)

    rec(0, len(cnt) - 1, 0)
    leaves.sort()
    return np.array([u for u, _ in leaves]), np.array([m for _, m in leaves])


def test_grow_tree_matches_bruteforce():
    from ballet_ray.stages.trees import _grow_tree

    rng = np.random.RandomState(0)
    for trial in range(20):
        B = rng.randint(4, 40)
        cnt = rng.randint(0, 50, B).astype(float)
        y = rng.randn(B) * 3
        s = cnt * y
        ss = cnt * (y * y + np.abs(rng.randn(B)))
        depth = rng.randint(1, 4)
        gu, gm = _grow_tree(cnt, s, ss, depth)
        ru, rm = _ref_hist_cart(cnt, s, ss, depth)
        assert np.array_equal(gu, ru), trial
        assert np.allclose(gm, rm, equal_nan=True), trial


def test_discretiser_end_to_end_step_function():
    from ballet_ray.stages.trees import DecisionTreeDiscretiser

    rng = np.random.RandomState(1)
    n = 8000
    x = rng.uniform(0, 10, n)
    y = np.where(x < 3, 1.0, np.where(x < 7, 5.0, 9.0)) + 0.01 * rng.randn(n)
    df = pd.DataFrame({"x": x, "y": y})
    t = DecisionTreeDiscretiser(target_col="y", max_depth=2, bins=64)
    t.fit(rd.from_pandas(df).repartition(6), ["x"])
    out = t.transform_table(pa.table({"x": [1.0, 5.0, 9.0, np.nan]}), ["x"]).column("x_tree").to_numpy(zero_copy_only=False)
    assert abs(out[0] - 1.0) < 0.1
    assert abs(out[1] - 5.0) < 0.1
    assert abs(out[2] - 9.0) < 0.1
    assert np.isnan(out[3])
    # depth-2 tree on a 3-step function recovers exactly 3-4 leaves
    assert 3 <= len(t.fitted_["x"]["means"]) <= 4


def test_dtree_encoder_isolates_categories_and_groups_at_low_depth():
    from ballet_ray.stages.trees import DecisionTreeEncoder

    rng = np.random.RandomState(2)
    cats = np.array(["a", "b", "c", "d", "e"])[rng.randint(0, 5, 5000)]
    means = {"a": 1.0, "b": 2.0, "c": 4.0, "d": 8.0, "e": 16.0}
    y = pd.Series(cats).map(means).to_numpy() + 0.01 * rng.randn(5000)
    df = pd.DataFrame({"cat": cats, "y": y})
    pipe = FeatureEngineeringPipeline(
        [Feature("cat", DecisionTreeEncoder(target_col="y", max_depth=4), output="enc")]
    )
    out = pipe.fit_transform(rd.from_pandas(df).repartition(5)).to_pandas()
    got = out.groupby("cat")["enc"].first()
    emp = df.groupby("cat")["y"].mean()
    # depth 4 >= n_cats - 1 guarantees greedy isolation -> category means
    assert np.allclose(got, emp)
    # depth 1 groups them into exactly 2 leaves, contiguous in mean order
    t1 = DecisionTreeEncoder(target_col="y", max_depth=1)
    t1.fit_table(pa.Table.from_pandas(df, preserve_index=False), ["cat"])
    enc1 = t1.fitted_["cat"]["enc"]
    assert len(set(np.round(list(enc1.values()), 9))) == 2
    # unknown category -> grand mean
    tt = t1.transform_table(pa.table({"cat": ["zzz"]}), ["cat"])
    assert np.isclose(tt.column("cat_dtree").to_numpy()[0], df["y"].mean())


def test_glmm_shrinkage_properties():
    from ballet_ray.stages.encoders_ext import GLMMEncoder

    rng = np.random.RandomState(3)
    # big category at mean 10, small category at mean 0, noise sd 2
    cats = np.array(["big"] * 2000 + ["small"] * 8)
    y = np.concatenate([10 + 2 * rng.randn(2000), 0 + 2 * rng.randn(8)])
    df = pd.DataFrame({"cat": cats, "y": y})
    t = GLMMEncoder(target_col="y")
    t.fit_table(pa.Table.from_pandas(df, preserve_index=False), ["cat"])
    st = t.fitted_["cat"]
    mu = st["mu"]
    enc_big, enc_small = st["enc"]["big"], st["enc"]["small"]
    m_big, m_small = df[df.cat == "big"].y.mean(), df[df.cat == "small"].y.mean()
    # both shrink TOWARD the grand mean, small shrinks relatively more
    assert abs(enc_big - m_big) < abs(m_big - mu)
    assert abs(enc_small - m_small) < abs(m_small - mu)
    rel_big = abs(enc_big - m_big) / max(abs(m_big - mu), 1e-9)
    rel_small = abs(enc_small - m_small) / max(abs(m_small - mu), 1e-9)
    assert rel_small > rel_big
    # formula parity with a direct computation
    n = df.groupby("cat")["y"].count().astype(float)
    m = df.groupby("cat")["y"].mean()
    ssw = ((df["y"] - df["cat"].map(m)) ** 2).sum()
    N, k = n.sum(), len(n)
    mu_ref = (n * m).sum() / N
    sigma2 = ssw / (N - k)
    ssb = (n * (m - mu_ref) ** 2).sum()
    c_n = (N - (n * n).sum() / N) / (k - 1)
    tau2 = max(0.0, (ssb - (k - 1) * sigma2) / c_n)
    ref = mu_ref + (m - mu_ref) * (tau2 / (tau2 + sigma2 / n))
    assert np.isclose(enc_big, ref["big"]) and np.isclose(enc_small, ref["small"])


def test_dfs_two_hop_matches_pandas():
    from ballet_ray.stages.aggregates import dfs_two_hop

    rng = np.random.RandomState(4)
    gp = pd.DataFrame({"g": np.arange(30)})
    par = pd.DataFrame({"p": np.arange(200), "g": rng.randint(0, 30, 200)})
    ch = pd.DataFrame({"p": rng.randint(0, 190, 3000), "v": rng.randn(3000)})
    out = (
        dfs_two_hop(
            rd.from_pandas(gp), rd.from_pandas(par), rd.from_pandas(ch).repartition(5),
            gp_key="g", parent_gp_key="g", parent_key="p", child_parent_key="p",
            value_cols=["v"], child_aggs=("count", "sum"), parent_aggs=("count", "sum", "mean"),
            fill_missing=0.0,
        )
        .to_pandas()
        .sort_values("g")
        .reset_index(drop=True)
    )
    l1 = par.copy()
    cg = ch.groupby("p")
    l1["child_count"] = l1["p"].map(cg.size()).fillna(0)
    l1["v_sum"] = l1["p"].map(cg["v"].sum()).fillna(0.0)
    l2 = l1.groupby("g").agg(
        child_count=("p", "size"),
        child_count_sum=("child_count", "sum"),
        child_count_mean=("child_count", "mean"),
        v_sum_sum=("v_sum", "sum"),
        v_sum_mean=("v_sum", "mean"),
    )
    exp = gp.join(l2, on="g").fillna(0.0).sort_values("g").reset_index(drop=True)
    for c in ["child_count", "child_count_sum", "child_count_mean", "v_sum_sum", "v_sum_mean"]:
        assert np.allclose(out[c].to_numpy(dtype=float), exp[c].to_numpy(dtype=float)), c
