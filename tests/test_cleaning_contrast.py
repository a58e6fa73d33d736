"""feature_engine cleaning ops + contrast encoders + sparse projection."""

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

from ballet_ray import Feature, FeatureEngineeringPipeline
from ballet_ray.stages.cleaning import (
    ArbitraryNumberImputer,
    DropMissingData,
    EndTailImputer,
    MathematicalCombination,
    OutlierTrimmer,
    RareLabelEncoder,
    apply_filter,
)
from ballet_ray.stages.encoders_ext import (
    BackwardDifferenceEncoder,
    HelmertEncoder,
    PolynomialEncoder,
    SparseRandomProjection,
    SumEncoder,
    _contrast_matrix,
)


def test_outlier_trimmer_filters_tails(sf_dir):
    ds = rd.read_parquet(f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_totalprice"])
    n = ds.count()
    trimmed = apply_filter(ds, OutlierTrimmer(0.05, 0.95), ["o_totalprice"])
    pdf = trimmed.to_pandas()
    assert 0.85 * n <= len(pdf) <= 0.95 * n
    raw = pd.read_parquet(f"{sf_dir}/orders.parquet")
    lo, hi = raw["o_totalprice"].quantile([0.05, 0.95])
    # all surviving rows are within the fitted bounds (quantile impl may
    # differ in interpolation by a hair)
    assert pdf["o_totalprice"].min() >= lo - 1e-6
    assert pdf["o_totalprice"].max() <= hi + 1e-6


def test_drop_missing_data():
    df = pd.DataFrame({"a": [1.0, np.nan, 3.0, None], "b": list("wxyz")})
    out = apply_filter(rd.from_pandas(df), DropMissingData(), ["a"]).to_pandas()
    assert out["b"].tolist() == ["w", "y"]


def test_endtail_and_arbitrary_imputers():
    x = np.array([1.0, 2.0, 3.0, np.nan, 5.0])
    t = pa.table({"x": x})
    imp = EndTailImputer("gaussian", fold=3.0)
    imp.fit_table(t, ["x"])
    got = imp.transform_table(t, ["x"]).column("x_imp").to_numpy()
    valid = x[~np.isnan(x)]
    assert np.isclose(got[3], valid.mean() + 3 * valid.std())
    arb = ArbitraryNumberImputer(-1.0).transform_table(t, ["x"]).column("x_imp").to_numpy()
    assert arb[3] == -1.0 and arb[0] == 1.0


def test_rare_label_encoder(sf_dir):
    df = pd.DataFrame({"c": ["a"] * 50 + ["b"] * 45 + ["z"] * 3 + ["q"] * 2})
    pipe = FeatureEngineeringPipeline([Feature("c", RareLabelEncoder(tol=0.05), output="c_rare")])
    out = pipe.fit_transform(rd.from_pandas(df)).to_pandas()
    assert set(out.loc[out["c"].isin(["z", "q"]), "c_rare"]) == {"Rare"}
    assert set(out.loc[out["c"] == "a", "c_rare"]) == {"a"}


def test_mathematical_combination():
    t = pa.table({"a": [1.0, 2.0], "b": [3.0, 6.0]})
    out = MathematicalCombination(["sum", "mean", "max"]).transform_table(t, ["a", "b"])
    assert np.allclose(out.column("combo_sum").to_numpy(), [4.0, 8.0])
    assert np.allclose(out.column("combo_mean").to_numpy(), [2.0, 4.0])
    assert np.allclose(out.column("combo_max").to_numpy(), [3.0, 6.0])


def test_contrast_matrices_match_patsy_conventions():
    # sum coding, k=3
    assert np.allclose(_contrast_matrix(3, "sum"), [[1, 0], [0, 1], [-1, -1]])
    # helmert, k=4 (patsy): successive level vs mean of previous
    h = _contrast_matrix(4, "helmert")
    assert np.allclose(h[:, 0], [-1, 1, 0, 0])
    assert np.allclose(h[:, 1], [-1, -1, 2, 0])
    assert np.allclose(h[:, 2], [-1, -1, -1, 3])
    # backward difference, k=3
    bd = _contrast_matrix(3, "backward_difference")
    assert np.allclose(bd[:, 0], [-2 / 3, 1 / 3, 1 / 3])
    assert np.allclose(bd[:, 1], [-1 / 3, -1 / 3, 2 / 3])
    # polynomial contrasts are orthonormal
    p = _contrast_matrix(5, "polynomial")
    assert np.allclose(p.T @ p, np.eye(4), atol=1e-10)


def test_contrast_encoders_pipeline(sf_dir):
    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "lang"])
    pipe = FeatureEngineeringPipeline(
        [
            Feature("lang", SumEncoder()),
            Feature("lang", HelmertEncoder()),
            Feature("lang", BackwardDifferenceEncoder()),
            Feature("lang", PolynomialEncoder()),
        ]
    )
    pdf = pipe.fit_transform(ds).to_pandas()
    langs = sorted(pdf["lang"].unique())
    k = len(langs)
    # k-1 columns per scheme, rows of the same category identical
    for scheme in ("sum", "helmert", "backward_difference", "polynomial"):
        cols = [c for c in pdf.columns if c.startswith(f"lang_{scheme}")]
        assert len(cols) == k - 1
        per_cat = pdf.groupby("lang")[cols].nunique()
        assert (per_cat == 1).all().all()
    # sum coding: first category = e0, last category = all -1
    first = pdf[pdf["lang"] == langs[0]].iloc[0]
    last = pdf[pdf["lang"] == langs[-1]].iloc[0]
    assert first["lang_sum0"] == 1.0 and last["lang_sum0"] == -1.0


def test_sparse_random_projection():
    t = pa.table({"a": [1.0, 0.0], "b": [0.0, 1.0], "c": [1.0, 1.0], "d": [2.0, 0.0]})
    p = SparseRandomProjection(n_components=2, seed=5)
    o1 = p.transform_table(t, ["a", "b", "c", "d"])
    o2 = SparseRandomProjection(n_components=2, seed=5).transform_table(t, ["a", "b", "c", "d"])
    assert o1.column_names == ["sproj_0", "sproj_1"]
    assert np.allclose(o1.column("sproj_0").to_numpy(), o2.column("sproj_0").to_numpy())
    m = p._matrix(1000)
    density = (m != 0).mean()
    assert 0.25 < density < 0.42  # ~1/3 nonzero


def test_categorical_imputer_mode_and_fixed():
    from ballet_ray.stages.cleaning import CategoricalImputer

    df = pd.DataFrame({"c": ["a", "b", "a", None, "a", None]})
    pipe = FeatureEngineeringPipeline([Feature("c", CategoricalImputer(), output="c_imp")])
    out = pipe.fit_transform(rd.from_pandas(df)).to_pandas()
    assert out["c_imp"].tolist() == ["a", "b", "a", "a", "a", "a"]
    fixed = CategoricalImputer(fill_value="missing")
    t = pa.table({"c": ["x", None]})
    got = fixed.transform_table(t, ["c"]).column("c_imp").to_pylist()
    assert got == ["x", "missing"]


def test_random_sample_imputer_deterministic():
    from ballet_ray.stages.cleaning import RandomSampleImputer

    rng = np.random.RandomState(1)
    x = rng.randn(500)
    x[::7] = np.nan
    df = pd.DataFrame({"v": x})
    pipe = FeatureEngineeringPipeline([Feature("v", RandomSampleImputer(seed=3), output="v_imp")])
    a = pipe.fit_transform(rd.from_pandas(df)).to_pandas()["v_imp"].to_numpy()
    pipe2 = FeatureEngineeringPipeline([Feature("v", RandomSampleImputer(seed=3), output="v_imp")])
    b = pipe2.fit_transform(rd.from_pandas(df)).to_pandas()["v_imp"].to_numpy()
    assert not np.isnan(a).any()
    assert np.allclose(a, b)  # deterministic across runs
    observed = set(np.round(x[~np.isnan(x)], 9))
    filled = a[np.isnan(x)]
    assert all(np.round(v, 9) in observed for v in filled)  # draws from train values


def test_capper_and_combine_with_reference():
    from ballet_ray.stages.cleaning import ArbitraryOutlierCapper, CombineWithReference

    t = pa.table({"x": [-5.0, 0.0, 10.0], "ref": [2.0, 4.0, 5.0]})
    capped = ArbitraryOutlierCapper(max_value=5.0, min_value=-1.0).transform_table(t, ["x"])
    assert capped.column("x_cap").to_pylist() == [-1.0, 0.0, 5.0]
    comb = CombineWithReference(["ref"], ops=["sub", "div"]).transform_table(t, ["x"])
    assert comb.column("x_sub_ref").to_pylist() == [-7.0, -4.0, 5.0]
    assert np.allclose(comb.column("x_div_ref").to_numpy(), [-2.5, 0.0, 2.0])


def test_pratio_encoder(sf_dir):
    from ballet_ray.stages.encoders_ext import PRatioEncoder

    ds = rd.read_parquet(f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_orderpriority", "o_totalprice"])

    def label(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return t.append_column(
            "y", pc.cast(pc.greater(t.column("o_totalprice"), 150000.0), pa.float64())
        )

    ds = ds.map_batches(label, batch_format="pyarrow")
    pipe = FeatureEngineeringPipeline([Feature("o_orderpriority", PRatioEncoder(target_col="y"), output="pr")])
    out = pipe.fit_transform(ds).to_pandas()
    g = out.groupby("o_orderpriority")["y"].mean()
    expect = out["o_orderpriority"].map((g + 1e-6) / (1 - g + 1e-6))
    assert np.allclose(out["pr"], expect)


def test_knn_imputer_donor_pool():
    from ballet_ray.stages.cleaning import KNNImputer

    # donors: two clear clusters; missing values must be filled from the
    # row's own cluster
    donors = pd.DataFrame(
        {
            "a": [0.0, 0.1, 0.2, 10.0, 10.1, 10.2],
            "b": [0.0, 0.1, 0.2, 10.0, 10.1, 10.2],
        }
    )
    probe = pd.DataFrame({"a": [0.05, 9.9, 5.0], "b": [np.nan, np.nan, 5.0]})
    df = pd.concat([donors, probe], ignore_index=True)
    pipe = FeatureEngineeringPipeline(
        [Feature(["a", "b"], KNNImputer(n_neighbors=3), output=["a_imp", "b_imp"])]
    )
    out = pipe.fit_transform(rd.from_pandas(df)).to_pandas()
    got = out.iloc[len(donors):]
    # near-zero row imputes from the low cluster, near-ten from the high
    assert got["b_imp"].iloc[0] < 1.0
    assert got["b_imp"].iloc[1] > 9.0
    # complete rows pass through untouched
    assert np.isclose(got["b_imp"].iloc[2], 5.0)
    assert np.allclose(out["a_imp"], df["a"])


def test_iterative_imputer_recovers_linear_structure():
    from ballet_ray.stages.cleaning import IterativeImputer

    rng = np.random.RandomState(4)
    n = 2_000
    a = rng.randn(n)
    b = 2.0 * a + 1.0 + 0.01 * rng.randn(n)  # near-deterministic relation
    miss = rng.rand(n) < 0.2
    b_obs = b.copy()
    b_obs[miss] = np.nan
    df = pd.DataFrame({"a": a, "b": b_obs})
    pipe = FeatureEngineeringPipeline(
        [Feature(["a", "b"], IterativeImputer(max_iter=3), output=["a_imp", "b_imp"])]
    )
    out = pipe.fit_transform(rd.from_pandas(df).repartition(4)).to_pandas()
    got = out["b_imp"].to_numpy()
    # imputed values recover b = 2a + 1 far better than the column mean
    err_model = np.abs(got[miss] - b[miss]).mean()
    err_mean = np.abs(np.nanmean(b_obs) - b[miss]).mean()
    assert err_model < 0.15 * err_mean
    # observed values untouched
    assert np.allclose(got[~miss], b[~miss])


def test_reservoir_sample_spans_blocks_and_is_partition_invariant():
    # block-sorted distribution shift: a limit()-prefix sample would see
    # only the low half; the content-hash reservoir must span all blocks
    from ballet_ray.stages.cleaning import _reservoir_sample

    lo = pd.DataFrame({"v": np.linspace(0.0, 1.0, 4000)})
    hi = pd.DataFrame({"v": np.linspace(100.0, 101.0, 4000)})
    df = pd.concat([lo, hi], ignore_index=True)
    tbl = _reservoir_sample(rd.from_pandas(df).repartition(8), ["v"], 512, seed=7)
    vals = tbl.column("v").to_numpy()
    assert len(vals) == 512
    frac_hi = float((vals > 50).mean())
    assert 0.35 < frac_hi < 0.65  # ~uniform across the shifted halves
    # identical winners under a different partitioning
    tbl2 = _reservoir_sample(rd.from_pandas(df).repartition(3), ["v"], 512, seed=7)
    assert np.array_equal(np.sort(vals), np.sort(tbl2.column("v").to_numpy()))


def test_knn_imputer_donors_span_blocks():
    from ballet_ray.stages.cleaning import KNNImputer

    # the first blocks hold only the low cluster — prefix sampling would
    # leave the high-cluster probe without in-cluster donors
    r0, r1 = np.random.RandomState(0), np.random.RandomState(1)
    lo = pd.DataFrame({"a": r0.normal(0, 0.1, 3000)})
    lo["b"] = lo["a"]
    hi = pd.DataFrame({"a": r1.normal(10, 0.1, 3000)})
    hi["b"] = hi["a"]
    df = pd.concat([lo, hi], ignore_index=True)
    imp = KNNImputer(n_neighbors=3, donors=256)
    imp.fit(rd.from_pandas(df).repartition(8), ["a", "b"])
    donors = imp.fitted_["donors"]
    assert (donors[:, 0] < 5).any() and (donors[:, 0] > 5).any()
    out = imp.transform_table(pa.table({"a": [9.9], "b": [np.nan]}), ["a", "b"])
    assert out.column("b_imp").to_numpy()[0] > 9.0


def test_random_sample_imputer_partition_invariant():
    from ballet_ray.stages.cleaning import RandomSampleImputer

    rng = np.random.RandomState(2)
    x = rng.randn(1000)
    x[::5] = np.nan
    df = pd.DataFrame({"rid": np.arange(1000), "v": x})
    imp = RandomSampleImputer(seed=3, seed_cols=["rid"])
    imp.fit(rd.from_pandas(df[["v"]]), ["v"])
    whole = imp.transform_table(
        pa.Table.from_pandas(df, preserve_index=False), ["v"]
    ).column("v_imp").to_numpy()
    # same rows split across different batch boundaries -> identical fills
    for split in (2, 5):
        parts = np.array_split(df, split)
        got = np.concatenate(
            [
                imp.transform_table(
                    pa.Table.from_pandas(p.reset_index(drop=True), preserve_index=False), ["v"]
                ).column("v_imp").to_numpy()
                for p in parts
            ]
        )
        assert np.allclose(whole, got)
    # full-entropy draws: distinct missing rows get distinct fills
    miss_fills = whole[np.isnan(x)]
    assert len(np.unique(np.round(miss_fills, 9))) > 10
