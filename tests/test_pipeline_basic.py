"""End-to-end pipeline tests over the synthetic token corpus, verified
against a pandas shadow oracle (the reference itself is not importable
here — see SURVEY.md §0)."""

import numpy as np
import pandas as pd
import pyarrow.compute as pc
import pytest
import ray.data as rd

from ballet_ray import Feature, FeatureEngineeringPipeline
from ballet_ray.stages.core import Log1p, TokenCount
from ballet_ray.stages.encoders import StandardScaler
from ballet_ray.stages.windows import Lag, RollingMean, Sessionize


def _read(corpus_dir):
    return rd.read_parquet(corpus_dir)


def test_token_count_matches_n_tok(corpus_dir):
    ds = _read(corpus_dir)
    pipe = FeatureEngineeringPipeline(
        [Feature("tokens", TokenCount(), output="token_count")]
    )
    out = pipe.fit_transform(ds).to_pandas()
    assert (out["token_count"] == out["n_tok"]).all()
    assert len(out) == ds.count()


def test_token_array_passthrough_equality(corpus_dir):
    """North-rule per-row invariant: tokens survive the pipeline bit-exact."""
    ds = _read(corpus_dir)
    pipe = FeatureEngineeringPipeline([Feature("n_tok", Log1p())])
    out = pipe.fit_transform(ds)
    got = out.sort("doc_id").to_pandas()
    src = ds.sort("doc_id").to_pandas()
    # same multiset of rows; align by (doc_id, event_ts)
    got = got.sort_values(["doc_id", "event_ts"]).reset_index(drop=True)
    src = src.sort_values(["doc_id", "event_ts"]).reset_index(drop=True)
    for a, b in zip(got["tokens"], src["tokens"]):
        assert np.array_equal(np.asarray(a), np.asarray(b))
    assert np.allclose(got["log1p_n_tok"], np.log1p(src["n_tok"]))


def test_standard_scaler_per_fit_semantics(corpus_dir):
    ds = _read(corpus_dir)
    pipe = FeatureEngineeringPipeline([Feature("n_tok", StandardScaler())])
    out = pipe.fit_transform(ds).to_pandas()
    x = out["n_tok"].to_numpy(dtype=float)
    expected = (x - x.mean()) / x.std()  # ddof=0
    assert np.allclose(out["n_tok_z"], expected, atol=1e-9)


def test_lag_rolling_session_against_pandas(corpus_dir):
    ds = _read(corpus_dir)
    pipe = FeatureEngineeringPipeline(
        [
            Feature("n_tok", Lag(1, key="doc_id", order_by="event_ts")),
            Feature("n_tok", RollingMean(3, key="doc_id", order_by="event_ts")),
            Feature("event_ts", Sessionize(3600, key="doc_id", order_by="event_ts")),
        ]
    )
    out = pipe.fit_transform(ds).to_pandas()
    out = out.sort_values(["doc_id", "event_ts"]).reset_index(drop=True)

    src = ds.to_pandas().sort_values(["doc_id", "event_ts"]).reset_index(drop=True)
    g = src.groupby("doc_id", sort=False)
    exp_lag = g["n_tok"].shift(1)
    exp_rm = g["n_tok"].rolling(3, min_periods=1).mean().reset_index(level=0, drop=True)
    gap = g["event_ts"].diff() > pd.Timedelta(seconds=3600)
    exp_sess = gap.groupby(src["doc_id"]).cumsum()

    assert np.allclose(out["n_tok_lag1"], exp_lag, equal_nan=True)
    assert np.allclose(out["n_tok_rmean3"], exp_rm)
    assert (out["session_id"].to_numpy() == exp_sess.to_numpy()).all()


def test_multiple_blocks_group_integrity(corpus_dir):
    """Entities span input shards; the keyed pass must still see each entity
    whole (cross-block boundary bug guard, SURVEY.md §7.4)."""
    ds = _read(corpus_dir).repartition(8)
    pipe = FeatureEngineeringPipeline(
        [Feature("n_tok", Lag(1, key="doc_id", order_by="event_ts"))]
    )
    out = pipe.fit_transform(ds).to_pandas()
    # per entity: number of null lags must be exactly 1 (the first row)
    nulls = out.groupby("doc_id")["n_tok_lag1"].apply(lambda s: s.isna().sum())
    assert (nulls == 1).all()


def test_fused_feature_reads_prior_output(corpus_dir):
    """A later batch feature can consume an earlier feature's output column
    inside the single fused map_batches stage."""
    ds = _read(corpus_dir)
    pipe = FeatureEngineeringPipeline(
        [
            Feature("tokens", TokenCount(), output="tc"),
            Feature("tc", Log1p(), output="log_tc"),
        ]
    )
    out = pipe.fit_transform(ds).to_pandas()
    assert np.allclose(out["log_tc"], np.log1p(out["tc"]))


def test_empty_pipeline_null_feature(corpus_dir):
    ds = _read(corpus_dir)
    pipe = FeatureEngineeringPipeline([])
    out = pipe.fit_transform(ds)
    assert out.count() == ds.count()


def test_feature_singleton_pipeline_api(corpus_dir):
    """Reference parity: Feature.fit/transform delegate to a one-feature
    pipeline (ballet/feature.py:85-135)."""
    import ray.data as rd

    from ballet_ray.stages.core import Log1p

    f = Feature("n_tok", Log1p(), output="l")
    ds = rd.read_parquet(corpus_dir)
    out = f.fit_transform(ds).to_pandas()
    assert np.allclose(out["l"], np.log1p(out["n_tok"]))
    p = f.as_feature_engineering_pipeline()
    assert len(p.features) == 1


def test_pipeline_save_load_fitted(tmp_path, sf_dir):
    """Fit once, save, load in-place, transform NEW data without refitting —
    the reference's pickle-a-fitted-pipeline workflow."""
    from ballet_ray.stages.encoders import MinMaxScaler

    ds = rd.read_parquet(f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_totalprice"])
    pipe = FeatureEngineeringPipeline([Feature("o_totalprice", MinMaxScaler(), output="mm")])
    pipe.fit(ds)
    path = pipe.save(str(tmp_path / "pipe.pkl"))

    loaded = FeatureEngineeringPipeline.load(path)
    a = pipe.transform(ds).to_pandas().sort_values("o_orderkey").reset_index(drop=True)
    b = loaded.transform(ds).to_pandas().sort_values("o_orderkey").reset_index(drop=True)
    assert np.allclose(a["mm"], b["mm"])  # same fitted min/max, no refit


def test_eng_namespace_reference_parity(sf_dir):
    """Every name in the reference's ballet.eng __all__ imports from
    ballet_ray.eng and works inside a pipeline."""
    import ballet_ray.eng as eng

    ref_all = {
        "BaseTransformer", "BoxCoxTransformer", "ColumnSelector",
        "ComputedValueTransformer", "ConditionalTransformer",
        "GroupedFunctionTransformer", "GroupwiseTransformer",
        "IdentityTransformer", "LagImputer", "NamedFramer", "NoFitMixin",
        "NullFiller", "NullIndicator", "NullTransformer",
        "SimpleFunctionTransformer", "SingleLagger", "SubsetTransformer",
        "ValueReplacer", "make_multi_lagger",
    }
    assert ref_all == set(eng.__all__)
    for name in ref_all:
        assert getattr(eng, name) is not None
    ds = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["event_id", "ts", "user_id", "value"])
    pipe = FeatureEngineeringPipeline(
        [
            Feature("value", eng.IdentityTransformer(), output="v_id"),
            Feature("value", eng.SingleLagger(1, key="user_id", order_by=["ts", "event_id"])),
            Feature("value", eng.make_multi_lagger([2, 3], "user_id", ["ts", "event_id"])),
        ]
    )
    out = pipe.fit_transform(ds).to_pandas()
    assert {"v_id", "value_lag1", "value_lag2", "value_lag3"} <= set(out.columns)
    assert eng.NoFitMixin().fit(None) is not None


def test_token_stats_kernel_matches_per_row_reference():
    """TokenStats' fused cumsum/LUT kernel vs a brute per-row computation,
    including empty rows, a constant row (entropy 0), and sliced tables."""
    import math

    import pyarrow as pa

    from ballet_ray.stages.core import TokenStats

    rng = np.random.default_rng(11)
    rows = [list(map(int, rng.integers(0, 50_257, rng.integers(0, 40)))) for _ in range(300)]
    rows[0] = []
    rows[7] = [50_256] * 90  # one repeated token -> entropy exactly 0
    t = pa.table({"tokens": pa.array(rows, type=pa.list_(pa.int32()))})

    for tab in (t, t.slice(3, 150)):  # sliced: non-zero offset start
        out = TokenStats().transform_table(tab, ["tokens"])
        toks = tab.column("tokens").to_pylist()
        for i, row in enumerate(toks):
            L = max(len(row), 1)
            assert out.column("mean_token")[i].as_py() == pytest.approx(sum(row) / L)
            assert out.column("rare_frac")[i].as_py() == pytest.approx(
                sum(1 for x in row if x >= 45_000) / L
            )
            counts = {}
            for x in row:
                counts[x % 64] = counts.get(x % 64, 0) + 1
            ent = -sum((c / L) * math.log(c / L) for c in counts.values())
            assert out.column("token_entropy")[i].as_py() == pytest.approx(ent, abs=1e-12)
    assert TokenStats().transform_table(t, ["tokens"]).column("token_entropy")[7].as_py() == 0.0
