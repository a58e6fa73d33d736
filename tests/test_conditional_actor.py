import numpy as np
import pandas as pd
import ray.data as rd

from ballet_ray.feature import Feature
from ballet_ray.pipeline import FeatureEngineeringPipeline
from ballet_ray.stages.conditional import ConditionalTransform, NamedFramer, SubsetTransform
from ballet_ray.stages.core import Log1p
from ballet_ray.stages.encoders import StandardScaler


def test_conditional_transform_routes_columns():
    """Columns whose mean exceeds 10 get log1p; others pass through
    (reference ConditionalTransformer routing, ballet/eng/base.py:257-326)."""
    df = pd.DataFrame({"big": [100.0, 200.0, 300.0], "small": [1.0, 2.0, 3.0]})
    t = ConditionalTransform(lambda s: s["mean"] > 10, np.log1p)
    out = (
        FeatureEngineeringPipeline([Feature(["big", "small"], t)])
        .fit_transform(rd.from_pandas(df))
        .to_pandas()
        .sort_values("small")
    )
    assert np.allclose(out["big"], np.log1p(df["big"]))
    assert np.allclose(out["small"], df["small"])


def test_subset_transform_passthrough():
    """Inner transform applied to subset; complement passes through
    (reference SubsetTransformer, tests/eng/test_base.py:312-341)."""
    df = pd.DataFrame({"a": [1.0, 2.0], "b": [3.0, 4.0]})
    t = SubsetTransform("a", StandardScaler())
    pipe = FeatureEngineeringPipeline([Feature(["a", "b"], t)])
    out = pipe.fit_transform(rd.from_pandas(df)).to_pandas().sort_values("b")
    assert np.allclose(out["b"], df["b"])  # untouched
    assert np.allclose(sorted(out["a_z"]), [-1.0, 1.0])


def test_named_framer():
    df = pd.DataFrame({"x": [1.0, 2.0]})
    out = (
        FeatureEngineeringPipeline([Feature("x", NamedFramer("renamed"))])
        .fit_transform(rd.from_pandas(df))
        .to_pandas()
    )
    assert "renamed" in out.columns


def test_actor_pool_fused_stage_equivalence(corpus_dir):
    """Actor-pool execution must produce identical results to task mode."""
    import ray.data as rd

    ds = rd.read_parquet(corpus_dir)
    feats = lambda: [  # noqa: E731
        Feature("n_tok", Log1p(), output="l"),
        Feature("n_tok", StandardScaler(), output="z"),
    ]
    task_out = (
        FeatureEngineeringPipeline(feats()).fit_transform(ds).to_pandas().sort_values(["doc_id", "event_ts"])
    )
    actor_out = (
        FeatureEngineeringPipeline(feats(), actor_concurrency=2, batch_size=512)
        .fit_transform(ds)
        .to_pandas()
        .sort_values(["doc_id", "event_ts"])
    )
    assert np.allclose(task_out["l"].to_numpy(), actor_out["l"].to_numpy())
    assert np.allclose(task_out["z"].to_numpy(), actor_out["z"].to_numpy())
