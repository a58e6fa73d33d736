"""Reference golden-output parity tests (fixtures ported per FIXTURES.md §B;
expected values hand-computed from documented reference semantics)."""

import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from ballet_ray.feature import Feature
from ballet_ray.pipeline import FeatureEngineeringPipeline
from ballet_ray.stages.core import ValueReplacer
from ballet_ray.stages.encoders import (
    BoxCoxTransform,
    ComputedValueTransform,
    KBinsDiscretizer,
    MaxAbsScaler,
    OneHotEncoder,
    RobustScaler,
    SimpleImputer,
)
from ballet_ray.stages.windows import Lag, MultiLag
from ballet_ray.transformer import (
    ChainTransform,
    RobustFunctionTransform,
    UnsuccessfulInputConversionError,
    desugar_transformer,
)


def test_single_lagger_golden():
    """Reference SingleLagger golden frame (tests/eng/test_ts.py:19-37):
    lag-1 of width by city ordered by year → [NaN,1,2,NaN,NaN,5,6] in
    (city, year) sorted order."""
    df = pd.DataFrame(
        {
            "city": ["BOS", "BOS", "BOS", "LA", "NYC", "NYC", "NYC"],
            "year": [2001, 2002, 2003, 2001, 2001, 2002, 2003],
            "width": [1.0, 2.0, 3.0, 4.0, 5.0, 6.0, 7.0],
        }
    )
    out = (
        FeatureEngineeringPipeline([Feature("width", Lag(1, key="city", order_by="year"))])
        .fit_transform(rd.from_pandas(df))
        .to_pandas()
        .sort_values(["city", "year"])
    )
    assert np.allclose(
        out["width_lag1"].to_numpy(), [np.nan, 1, 2, np.nan, np.nan, 5, 6], equal_nan=True
    )


def test_multi_lagger_union():
    """make_multi_lagger = horizontal concat of laggers (ballet/eng/ts.py:25-41)."""
    df = pd.DataFrame({"k": ["a"] * 4, "t": [1, 2, 3, 4], "v": [1.0, 2.0, 3.0, 4.0]})
    out = (
        FeatureEngineeringPipeline([Feature("v", MultiLag([1, 2], key="k", order_by="t"))])
        .fit_transform(rd.from_pandas(df))
        .to_pandas()
        .sort_values("t")
    )
    assert np.allclose(out["v_lag1"], [np.nan, 1, 2, 3], equal_nan=True)
    assert np.allclose(out["v_lag2"], [np.nan, np.nan, 1, 2], equal_nan=True)


def test_value_replacer_golden():
    """Reference golden (tests/eng/test_misc.py:10-16): 0 → -99."""
    df = pd.DataFrame({"x": [0.0, 0.0, 0.0, 0.0, 1.0, 3.0, 7.0, 11.0, -7.0]})
    out = (
        FeatureEngineeringPipeline([Feature("x", ValueReplacer(0.0, -99.0), output="r")])
        .fit_transform(rd.from_pandas(df))
        .to_pandas()
    )
    assert out["r"].tolist() == [-99, -99, -99, -99, 1, 3, 7, 11, -7]


def test_boxcox_skewed_vs_unskewed():
    """Reference BoxCox (tests/eng/test_misc.py:19-68): with threshold 0.0,
    a skewed column gets log1p; for threshold large, passthrough."""
    skewed = pd.DataFrame({"x": [0.0, 0.0, 0.0, 0.0, 1.0]})
    ds = rd.from_pandas(skewed)
    t = BoxCoxTransform(threshold=0.0)
    out = FeatureEngineeringPipeline([Feature("x", t, output="bc")]).fit_transform(ds).to_pandas()
    assert np.allclose(sorted(out["bc"]), sorted(np.log1p(skewed["x"])))
    t2 = BoxCoxTransform(threshold=10.0)
    out2 = FeatureEngineeringPipeline([Feature("x", t2, output="bc")]).fit_transform(ds).to_pandas()
    assert np.allclose(sorted(out2["bc"]), sorted(skewed["x"]))


def test_computed_value_transform():
    """Reference ComputedValueTransformer (ballet/eng/misc.py:130-156): fit
    computes the statistic on train, transform emits it as a constant."""
    train = rd.from_pandas(pd.DataFrame({"x": [1.0, 2.0, 3.0]}))
    test = rd.from_pandas(pd.DataFrame({"x": [100.0, 200.0]}))
    pipe = FeatureEngineeringPipeline([Feature("x", ComputedValueTransform("mean"), output="m")])
    pipe.fit(train)
    out = pipe.transform(test).to_pandas()
    assert out["m"].tolist() == [2.0, 2.0]  # train mean, not test mean


def test_robust_function_transform_probing():
    """Conversion probing (reference DelegatingRobustTransformer,
    ballet/transformer.py:113-210): a UDF that only accepts a pandas Series
    still works; a UDF that always fails raises the dedicated error."""

    def series_only(x):
        if not isinstance(x, pd.Series):
            raise TypeError("want a Series")
        return x * 2

    df = pd.DataFrame({"x": [1.0, 2.0]})
    out = (
        FeatureEngineeringPipeline([Feature("x", series_only, output="d")])
        .fit_transform(rd.from_pandas(df))
        .to_pandas()
    )
    assert sorted(out["d"]) == [2.0, 4.0]

    t = RobustFunctionTransform(lambda x: (_ for _ in ()).throw(RuntimeError("nope")))
    import pyarrow as pa

    with pytest.raises(UnsuccessfulInputConversionError):
        t.transform_table(pa.table({"x": [1.0]}), ["x"])


def test_desugaring_rules():
    """None → Identity; callable → robust fn; list → chain
    (ballet/transformer.py:290-309)."""
    from ballet_ray.stages.core import IdentityTransform

    assert isinstance(desugar_transformer(None), IdentityTransform)
    assert isinstance(desugar_transformer(np.log1p), RobustFunctionTransform)
    chain = desugar_transformer([np.log1p, None])
    assert isinstance(chain, ChainTransform) and len(chain.steps) == 2


def test_chain_with_fitted_step():
    """log1p then standardize: the fitted step must fit on the LOG-scale
    values (sequential chain fit, reference TransformerPipeline)."""
    from ballet_ray.stages.encoders import StandardScaler

    df = pd.DataFrame({"x": np.abs(np.random.RandomState(0).randn(200)) * 10})
    ds = rd.from_pandas(df)
    pipe = FeatureEngineeringPipeline(
        [Feature("x", [np.log1p, StandardScaler()], output="z")]
    )
    out = pipe.fit_transform(ds).to_pandas()
    lx = np.log1p(df["x"].to_numpy())
    expected = (lx - lx.mean()) / lx.std()
    assert np.allclose(sorted(out["z"]), sorted(expected), atol=1e-9)


def test_more_encoders_against_numpy():
    rng = np.random.RandomState(3)
    df = pd.DataFrame({"x": rng.randn(500) * 5 + 2, "c": rng.choice(["a", "b", "c"], 500)})
    ds = rd.from_pandas(df)

    out = (
        FeatureEngineeringPipeline(
            [
                Feature("x", MaxAbsScaler(), output="ma"),
                Feature("x", RobustScaler(), output="rs"),
                Feature("c", OneHotEncoder(), name="oh"),
            ]
        )
        .fit_transform(ds)
        .to_pandas()
        .sort_values("x")
    )
    x = out["x"].to_numpy()
    assert np.allclose(out["ma"], x / np.abs(df["x"]).max())
    q1, med, q3 = np.quantile(df["x"], [0.25, 0.5, 0.75])
    assert np.allclose(out["rs"], (x - med) / (q3 - q1), atol=1e-6)
    oh_cols = [c for c in out.columns if c.startswith("oh_")]
    assert len(oh_cols) == 3
    assert (out[oh_cols].sum(axis=1) == 1).all()


def test_simple_imputer_median_most_frequent():
    df = pd.DataFrame(
        {"x": [1.0, 2.0, np.nan, 4.0, 100.0], "c": ["a", "b", "a", None, "a"]}
    )
    ds = rd.from_pandas(df)
    out = (
        FeatureEngineeringPipeline(
            [
                Feature("x", SimpleImputer("median"), output="xm"),
                Feature("c", SimpleImputer("most_frequent"), output="cm"),
            ]
        )
        .fit_transform(ds)
        .to_pandas()
    )
    assert out["xm"].tolist() == [1.0, 2.0, 3.0, 4.0, 100.0]
    assert out["cm"].tolist() == ["a", "b", "a", "a", "a"]


def test_kbins_uniform():
    df = pd.DataFrame({"x": np.linspace(0, 10, 100)})
    out = (
        FeatureEngineeringPipeline(
            [Feature("x", KBinsDiscretizer(n_bins=5, strategy="uniform"), output="b")]
        )
        .fit_transform(rd.from_pandas(df))
        .to_pandas()
    )
    assert set(out["b"]) == {0, 1, 2, 3, 4}


def test_callable_column_selector():
    """Callable input selectors (ballet/feature.py:26-31)."""
    df = pd.DataFrame({"num_a": [1.0], "num_b": [2.0], "txt": ["x"]})
    f = Feature(lambda schema: [n for n in schema.names if n.startswith("num")], None)
    out = FeatureEngineeringPipeline([f]).fit_transform(rd.from_pandas(df)).to_pandas()
    assert "num_a" in out.columns and "num_b" in out.columns


def test_engineer_features_result(corpus_dir):
    from ballet_ray.pipelines.engineer import engineer_features
    from ballet_ray.stages.core import Log1p, TokenCount

    ds = rd.read_parquet(corpus_dir)
    res = engineer_features(
        [Feature("tokens", TokenCount(), output="tc"), Feature("n_tok", Log1p())], ds
    )
    assert set(res.feature_columns) == {"tc", "log1p_n_tok"}
    assert res.X.count() == ds.count()
    assert res.pipeline is not None and len(res.features) == 2


def test_table_registry(tmp_path, corpus_dir):
    import shutil

    from ballet_ray.sources.registry import TableRegistry, load_table

    cfg = {
        "tables": [
            {"name": "corpus", "path": corpus_dir, "format": "parquet"},
        ]
    }
    reg = TableRegistry("/", cfg)
    assert reg.names() == ["corpus"]
    assert reg.load("corpus").count() == rd.read_parquet(corpus_dir).count()
    # csv reader
    p = tmp_path / "t.csv"
    pd.DataFrame({"a": [1, 2], "b": ["x", "y"]}).to_csv(p, index=False)
    assert load_table(str(p)).count() == 2
    with pytest.raises(KeyError):
        reg.load("nope")
    # materialize-backed cache (reference 10-min load_data memoize,
    # ballet/project.py:288-301): same MaterializedDataset handle back
    # within the TTL, blocks pinned in the object store
    m1 = reg.load("corpus", materialize=True)
    m2 = reg.load("corpus", materialize=True)
    assert m1 is m2
    from ray.data.dataset import MaterializedDataset

    assert isinstance(m1, MaterializedDataset)
    # lazy and materialized entries cache independently
    assert reg.load("corpus") is not m1
    # TTL=0 disables caching
    reg0 = TableRegistry("/", cfg, cache_ttl=0)
    assert reg0.load("corpus") is not reg0.load("corpus")


def test_nested_feature_as_transformer():
    """A Feature used as another Feature's transformer reads its OWN input
    (reference nested-feature evidence, tests/test_pipeline.py:23-40)."""
    inner = Feature("b", np.log1p, output="log_b")
    outer = Feature("a", inner, output="nested_out")
    df = pd.DataFrame({"a": [0.0, 0.0], "b": [1.0, np.e - 1]})
    out = (
        FeatureEngineeringPipeline([outer])
        .fit_transform(rd.from_pandas(df))
        .to_pandas()
        .sort_values("b")
    )
    # the nested feature ignored column 'a' and transformed 'b'
    assert np.allclose(out["nested_out"], np.log1p(df.sort_values("b")["b"]))
