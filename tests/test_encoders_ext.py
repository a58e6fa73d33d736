"""Extended encoder families: numpy/pandas parity + distributed-fit checks."""

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

from ballet_ray import Feature, FeatureEngineeringPipeline
from ballet_ray.stages.encoders_ext import (
    BaseNEncoder,
    BinaryEncoder,
    FourierFeatures,
    GaussianRandomProjection,
    HashingEncoder,
    JamesSteinEncoder,
    LeaveOneOutEncoder,
    MEstimateEncoder,
    Normalizer,
    PolynomialFeatures,
    PowerTransformer,
    QuantileTransformer,
    WOEEncoder,
)


def _orders(sf_dir):
    return rd.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_orderpriority", "o_totalprice"]
    )


def test_hashing_encoder_one_hot():
    t = pa.table({"cat": ["a", "b", "a", "c"]})
    out = HashingEncoder(n_components=4).transform_table(t, ["cat"])
    m = np.column_stack([out.column(i).to_numpy() for i in range(4)])
    assert (m.sum(axis=1) == 1).all()
    assert (m[0] == m[2]).all()  # same category, same bucket


def test_basen_binary_roundtrip(sf_dir):
    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "lang"])
    pipe = FeatureEngineeringPipeline([Feature("lang", BinaryEncoder())])
    pdf = pipe.fit_transform(ds).to_pandas()
    langs = sorted(pdf["lang"].unique())
    code_of = {v: i + 1 for i, v in enumerate(langs)}
    bits = [c for c in pdf.columns if c.startswith("lang_b")]
    recon = np.zeros(len(pdf), dtype=int)
    for j, c in enumerate(bits):
        recon = recon * 2 + pdf[c].to_numpy()
    assert (recon == pdf["lang"].map(code_of).to_numpy()).all()
    # base-3 digit count
    enc = BaseNEncoder(base=3)
    enc.fit_table(pa.table({"c": [f"v{i}" for i in range(9)]}), ["c"])
    assert enc.fitted_["c"][1] == 3  # ceil(log3(10)) = 3


def test_woe_matches_formula(sf_dir):
    ds = _orders(sf_dir)

    def label(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return t.append_column(
            "is_big", pc.cast(pc.greater(t.column("o_totalprice"), 150000.0), pa.float64())
        )

    ds = ds.map_batches(label, batch_format="pyarrow")
    pipe = FeatureEngineeringPipeline(
        [Feature("o_orderpriority", WOEEncoder(target_col="is_big"), output="woe")]
    )
    pdf = pipe.fit_transform(ds).to_pandas()
    df = pdf[["o_orderpriority", "is_big"]]
    pos_tot, n_tot = df["is_big"].sum(), len(df)
    neg_tot = n_tot - pos_tot
    g = df.groupby("o_orderpriority")["is_big"].agg(["sum", "count"])
    woe = np.log(
        ((g["sum"] + 0.5) / (pos_tot + 1.0)) / ((g["count"] - g["sum"] + 0.5) / (neg_tot + 1.0))
    )
    expect = pdf["o_orderpriority"].map(woe)
    assert np.allclose(pdf["woe"], expect)


def test_mestimate_jamesstein_loo(sf_dir):
    ds = _orders(sf_dir)
    pipe = FeatureEngineeringPipeline(
        [
            Feature("o_orderpriority", MEstimateEncoder(target_col="o_totalprice", m=2.0), output="mest"),
            Feature("o_orderpriority", JamesSteinEncoder(target_col="o_totalprice"), output="js"),
            Feature("o_orderpriority", LeaveOneOutEncoder(target_col="o_totalprice"), output="loo"),
        ]
    )
    pdf = pipe.fit_transform(ds).to_pandas()
    g = pdf.groupby("o_orderpriority")["o_totalprice"]
    gm = pdf["o_totalprice"].mean()
    # m-estimate
    stats = g.agg(["sum", "count"])
    exp_m = pdf["o_orderpriority"].map((stats["sum"] + 2.0 * gm) / (stats["count"] + 2.0))
    assert np.allclose(pdf["mest"], exp_m)
    # james-stein shrinkage lies between the category mean and the global mean
    cat_mean = pdf["o_orderpriority"].map(g.mean())
    lo = np.minimum(cat_mean, gm)
    hi = np.maximum(cat_mean, gm)
    assert ((pdf["js"] >= lo - 1e-9) & (pdf["js"] <= hi + 1e-9)).all()
    # leave-one-out: (sum - own) / (count - 1)
    s = pdf["o_orderpriority"].map(stats["sum"])
    n = pdf["o_orderpriority"].map(stats["count"])
    exp_loo = (s - pdf["o_totalprice"]) / (n - 1)
    assert np.allclose(pdf["loo"], exp_loo)


def test_normalizer_and_poly():
    t = pa.table({"a": [3.0, 0.0, 1.0], "b": [4.0, 0.0, 1.0]})
    out = Normalizer("l2").transform_table(t, ["a", "b"])
    assert np.allclose(out.column("a_norm").to_numpy(), [0.6, 0.0, 1 / np.sqrt(2)])
    out = Normalizer("l1").transform_table(t, ["a", "b"])
    assert np.allclose(out.column("a_norm").to_numpy(), [3 / 7, 0.0, 0.5])
    poly = PolynomialFeatures()
    out = poly.transform_table(t, ["a", "b"])
    assert out.column_names == ["a", "b", "a_x_a", "a_x_b", "b_x_b"]
    assert np.allclose(out.column("a_x_b").to_numpy(), [12.0, 0.0, 1.0])
    only = PolynomialFeatures(interaction_only=True, include_inputs=False)
    assert only.output_names(["a", "b"]) == ["a_x_b"]


def test_quantile_transformer_uniform_and_normal(sf_dir):
    ds = _orders(sf_dir)
    pipe = FeatureEngineeringPipeline(
        [
            Feature("o_totalprice", QuantileTransformer(n_quantiles=21), output="qu"),
            Feature(
                "o_totalprice",
                QuantileTransformer(n_quantiles=21, output_distribution="normal"),
                output="qn",
            ),
        ]
    )
    pdf = pipe.fit_transform(ds).to_pandas()
    q = pdf["qu"].to_numpy()
    assert (q >= 0).all() and (q <= 1).all()
    # roughly uniform: each decile holds roughly 10% of rows
    hist, _ = np.histogram(q, bins=10, range=(0, 1))
    assert hist.min() > 0.03 * len(q)
    # normal output is the probit of the uniform output
    order = np.argsort(pdf["o_totalprice"].to_numpy())
    qn = pdf["qn"].to_numpy()
    assert (np.diff(qn[order]) >= -1e-9).all()  # monotone
    assert abs(np.median(qn)) < 0.2


def test_probit_accuracy():
    from ballet_ray.stages.encoders_ext import _probit

    # known quantiles of the standard normal
    assert np.allclose(
        _probit(np.array([0.5, 0.975, 0.025, 0.84134474])),
        [0.0, 1.959964, -1.959964, 1.0],
        atol=1e-5,
    )


def test_power_transformer_reduces_skew(sf_dir):
    rng = np.random.RandomState(3)
    x = np.exp(rng.randn(4000))  # heavily right-skewed log-normal
    ds = rd.from_pandas(pd.DataFrame({"x": x}))
    pipe = FeatureEngineeringPipeline([Feature("x", PowerTransformer(), output="xt")])
    pdf = pipe.fit_transform(ds).to_pandas()
    xt = pdf["xt"].to_numpy()

    def skew(v):
        d = v - v.mean()
        return (d**3).mean() / (d**2).mean() ** 1.5

    assert abs(skew(xt)) < 0.15 * abs(skew(x))
    assert abs(xt.mean()) < 1e-6 and abs(xt.std() - 1) < 1e-6  # standardized
    # right-skewed data wants a contracting transform (λ < 1); note YJ
    # operates on x+1, so the log-normal optimum is NOT at exactly 0
    enc = pipe.features[0].transformer
    assert enc.fitted_["x"]["lambda"] < 0.5


def test_yeo_johnson_closed_forms():
    from ballet_ray.state.fitstate import yeo_johnson

    x = np.array([-2.0, -0.5, 0.0, 0.5, 2.0])
    # lambda = 1 is identity
    assert np.allclose(yeo_johnson(x[:, None], np.array([1.0]))[:, 0], x)
    # lambda = 0: log1p on the positive side
    y0 = yeo_johnson(x[:, None], np.array([0.0]))[:, 0]
    assert np.allclose(y0[x >= 0], np.log1p(x[x >= 0]))
    # lambda = 2: -log1p(-x) on the negative side
    y2 = yeo_johnson(x[:, None], np.array([2.0]))[:, 0]
    assert np.allclose(y2[x < 0], -np.log1p(-x[x < 0]))


def test_fourier_and_projection():
    ts = pd.date_range("2024-01-01", periods=8, freq="3h")
    t = pa.table({"ts": pa.array(ts.values.astype("datetime64[us]"))})
    out = FourierFeatures(86400.0, num_terms=2).transform_table(t, ["ts"])
    s1 = out.column("ts_sin1").to_numpy()
    c1 = out.column("ts_cos1").to_numpy()
    assert np.allclose(s1**2 + c1**2, 1.0)
    assert np.allclose(s1[0], 0.0, atol=1e-9) and np.allclose(c1[0], 1.0)

    t2 = pa.table({"a": [1.0, 2.0], "b": [0.0, 1.0], "c": [2.0, 2.0]})
    proj = GaussianRandomProjection(n_components=2, seed=9)
    p1 = proj.transform_table(t2, ["a", "b", "c"])
    p2 = GaussianRandomProjection(n_components=2, seed=9).transform_table(t2, ["a", "b", "c"])
    assert p1.column_names == ["proj_0", "proj_1"]
    assert np.allclose(p1.column("proj_0").to_numpy(), p2.column("proj_0").to_numpy())


def test_difference_matches_pandas(sf_dir):
    from ballet_ray.stages.windows import Difference, apply_keyed

    ds = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["event_id", "ts", "user_id", "value"])
    out = apply_keyed(
        ds,
        [(Difference(1, key="user_id", order_by=["ts", "event_id"]), ["value"], ["value_diff1"])],
        "user_id",
        ["ts", "event_id"],
    ).to_pandas()
    pdf = pd.read_parquet(f"{sf_dir}/events.parquet").sort_values(["user_id", "ts", "event_id"])
    expect = pdf.groupby("user_id")["value"].diff(1)
    got = out.set_index("event_id").loc[pdf["event_id"], "value_diff1"].to_numpy()
    assert np.allclose(got, expect.to_numpy(), equal_nan=True)


def test_catboost_ordered_encoding_matches_pandas(sf_dir):
    from ballet_ray.stages.encoders_ext import CatBoostEncoder

    ds = rd.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_orderpriority", "o_totalprice"]
    )
    enc = CatBoostEncoder("o_orderpriority", "o_orderkey", a=1.0)
    pipe = FeatureEngineeringPipeline([Feature("o_totalprice", enc.keyed(), output="cb")])
    got = pipe.fit_transform(ds).to_pandas().sort_values("o_orderkey").reset_index(drop=True)

    pdf = pd.read_parquet(f"{sf_dir}/orders.parquet").sort_values(
        ["o_orderpriority", "o_orderkey"]
    )
    prior = pdf["o_totalprice"].mean()
    g = pdf.groupby("o_orderpriority")["o_totalprice"]
    sum_before = g.cumsum() - pdf["o_totalprice"]
    cnt_before = g.cumcount()
    pdf["cb"] = (sum_before + prior) / (cnt_before + 1.0)
    expect = pdf.sort_values("o_orderkey").reset_index(drop=True)
    assert np.allclose(got["cb"], expect["cb"])
    # leakage-free: the first row of each category is exactly the prior
    firsts = pdf.groupby("o_orderpriority").head(1)
    assert np.allclose(firsts["cb"], prior)


def test_cumsum_and_skits_aliases(sf_dir):
    from ballet_ray.stages.windows import (
        CumSum,
        apply_keyed,
        make_autoregressive,
        make_horizon,
        make_seasonal_lagger,
        make_trend,
    )

    ds = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["event_id", "ts", "user_id", "value"])
    ar = make_autoregressive(2, "user_id", ["ts", "event_id"])
    hz = make_horizon(2, "user_id", ["ts", "event_id"])
    out = apply_keyed(
        ds,
        [
            (CumSum(key="user_id", order_by=["ts", "event_id"]), ["value"], ["value_cumsum"]),
            (ar, ["value"], ar.output_names(["value"])),
            (hz, ["value"], hz.output_names(["value"])),
            (make_trend("user_id", ["ts", "event_id"]), [], ["trend"]),
        ],
        "user_id",
        ["ts", "event_id"],
    ).to_pandas()
    pdf = pd.read_parquet(f"{sf_dir}/events.parquet").sort_values(["user_id", "ts", "event_id"])
    g = pdf.groupby("user_id")["value"]
    aligned = out.set_index("event_id").loc[pdf["event_id"]]
    assert np.allclose(aligned["value_cumsum"].to_numpy(), g.cumsum().to_numpy())
    assert np.allclose(
        aligned["value_lag2"].to_numpy(), g.shift(2).to_numpy(), equal_nan=True
    )
    assert np.allclose(
        aligned["value_lead2"].to_numpy(), g.shift(-2).to_numpy(), equal_nan=True
    )
    assert (aligned["trend"].to_numpy() == g.cumcount().to_numpy()).all()
    assert make_seasonal_lagger(7, "u").k == 7
