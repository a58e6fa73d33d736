"""MLBlocks adapter surface (ballet_ray/mlprimitives) — reference
ballet/mlprimitives: primitive annotations resolve to live callables and
the primitives run end-to-end."""

import textwrap

import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from ballet_ray.mlprimitives import (
    PIPELINES_PATH,
    PRIMITIVES_PATH,
    DropMissingTargets,
    drop_missing_targets,
    load_pipeline,
    load_primitive,
    make_encode_target,
    make_engineer_features,
)

FEATURE_MOD = """
    from ballet_ray import Feature
    import numpy as np
    feature = Feature("x1", lambda col: np.asarray(col) * 2.0, output="x1_twice")
"""


@pytest.fixture()
def contrib_dir(tmp_path):
    d = tmp_path / "contrib"
    d.mkdir()
    (d / "user_m.py").write_text(textwrap.dedent(FEATURE_MOD))
    return str(d)


def test_annotations_resolve():
    for name in (
        "ballet_ray.engineer_features",
        "ballet_ray.encode_target",
        "ballet_ray.drop_missing_targets",
    ):
        spec = load_primitive(name)
        assert spec["name"] == name
        assert callable(spec["_callable"])
    for p in ("ballet_ray_rf_regressor", "ballet_ray_rf_classifier"):
        pipe = load_pipeline(p)
        assert pipe["primitives"][0] == "ballet_ray.engineer_features"
    assert PRIMITIVES_PATH[0].is_dir() and PIPELINES_PATH[0].is_dir()


def test_engineer_features_primitive(contrib_dir):
    pipe = make_engineer_features(contrib=contrib_dir)
    ds = rd.from_items([{"x1": float(i)} for i in range(8)])
    out = pipe.fit_transform(ds).to_pandas().sort_values("x1")
    assert list(out["x1_twice"]) == [2.0 * i for i in range(8)]


def test_engineer_features_from_config_file(contrib_dir, tmp_path):
    cfg = tmp_path / "cfg.py"
    cfg.write_text(f"CONFIG = {{'contrib': {contrib_dir!r}}}\n")
    pipe = make_engineer_features(config=cfg)
    out = pipe.fit_transform(rd.from_items([{"x1": 3.0}])).to_pandas()
    assert out["x1_twice"].iloc[0] == 6.0


def test_encode_target_primitive():
    enc = make_encode_target(encoder_features=[])
    y = rd.from_items([{"y": float(i)} for i in range(4)])
    assert list(enc.fit_transform(y).to_pandas()["y"]) == [0.0, 1.0, 2.0, 3.0]


def test_drop_missing_targets_arrays():
    X = pd.DataFrame({"a": [1.0, 2.0, 3.0, 4.0]})
    y = np.array([1.0, np.nan, 3.0, np.nan])
    prim = DropMissingTargets()
    prim.fit(X, y)
    X2, y2 = prim.transform(X, y)
    assert list(X2["a"]) == [1.0, 3.0] and list(y2) == [1.0, 3.0]
    # numpy-matrix form
    Xm = X.to_numpy()
    X3, y3 = prim.transform(Xm, y)
    assert X3.shape == (2, 1)


def test_drop_missing_targets_dataset():
    ds = rd.from_items(
        [{"a": 1, "y": 1.0}, {"a": 2, "y": float("nan")}, {"a": 3, "y": None}, {"a": 4, "y": 4.0}]
    ).repartition(2)
    out = drop_missing_targets(ds, "y").to_pandas().sort_values("a")
    assert list(out["a"]) == [1, 4]
