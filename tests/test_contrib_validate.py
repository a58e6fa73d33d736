"""Plugin feature discovery + config-driven validate() (reference
ballet/contrib.py walk semantics and ballet/validation/main.py stages)."""

import textwrap

import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from ballet_ray.contrib import collect_contrib_features
from ballet_ray.exc import FeatureRejected, InvalidFeatureApi, InvalidProjectStructure
from ballet_ray.validation.main import validate
from ballet_ray.validation.spec import instantiate, load_spec


def _scaffold(tmp_path, modules: dict) -> str:
    d = tmp_path / "contrib"
    d.mkdir()
    for name, body in modules.items():
        (d / f"{name}.py").write_text(textwrap.dedent(body))
    return str(d)


GOOD_A = """
    from ballet_ray import Feature
    from ballet_ray.stages.core import IdentityTransform
    feature = Feature("x1", IdentityTransform(), output="x1_id")
"""
GOOD_B = """
    from ballet_ray import Feature
    import numpy as np
    feature = Feature("x2", lambda col: np.asarray(col) * 2.0, output="x2_twice")
"""
NOISE = """
    from ballet_ray import Feature
    feature = Feature("noise", None, output="noise_copy")
"""
AMBIGUOUS = """
    from ballet_ray import Feature
    f1 = Feature("x1", None, output="a")
    f2 = Feature("x2", None, output="b")
"""
BROKEN = """
    raise RuntimeError("this contrib module is broken")
"""


def _dataset(n=600, seed=7):
    rng = np.random.RandomState(seed)
    x1 = rng.randn(n)
    x2 = rng.randn(n)
    noise = rng.randn(n)
    y = 3.0 * x1 + 0.5 * x2
    return rd.from_pandas(pd.DataFrame({"x1": x1, "x2": x2, "noise": noise, "y": y}))


def test_collect_walks_dir_and_skips_bad_modules(tmp_path):
    path = _scaffold(
        tmp_path, {"user_a": GOOD_A, "user_b": GOOD_B, "multi": AMBIGUOUS, "broken": BROKEN}
    )
    feats = collect_contrib_features(path)
    # exactly one Feature per module; ambiguous and broken modules skipped
    assert len(feats) == 2
    assert all(f.source is not None for f in feats)
    outs = sorted(o for f in feats for o in (f.output or []))
    assert outs == ["x1_id", "x2_twice"]


def test_collect_package_module(tmp_path):
    import importlib.util
    import sys

    path = _scaffold(tmp_path, {"only": GOOD_A, "__init__": ""})
    sys.path.insert(0, str(tmp_path))
    try:
        import contrib  # noqa: F401 — the scaffolded package

        feats = collect_contrib_features("contrib")
        assert len(feats) == 1 and feats[0].source == "contrib.only"
    finally:
        sys.path.remove(str(tmp_path))
        sys.modules.pop("contrib", None)
        sys.modules.pop("contrib.only", None)


def test_load_spec_and_compound_from_specs():
    cls, params = load_spec(
        {"name": "ballet_ray.validation.accepters.VarianceThresholdAccepter",
         "params": {"threshold": 0.01}}
    )
    acc = cls(**params)
    assert acc.threshold == 0.01
    from ballet_ray.validation.accepters import CompoundAccepter, call_judge

    comp = CompoundAccepter(
        [
            "ballet_ray.validation.accepters.AlwaysAccepter",
            {"name": "ballet_ray.validation.accepters.VarianceThresholdAccepter",
             "params": {"threshold": 0.0001}},
        ],
        agg="all",
    )
    rng = np.random.RandomState(0)
    z = rng.randn(200, 1)
    assert call_judge(comp, candidate=z, accepted={}, y=rng.randn(200))
    # a zero-variance candidate fails the compound through the variance member
    assert not call_judge(comp, candidate=np.zeros((200, 1)), accepted={}, y=rng.randn(200))


def test_validate_end_to_end(tmp_path):
    path = _scaffold(tmp_path, {"user_a": GOOD_A, "user_b": GOOD_B})
    ds = _dataset()
    config = {
        "contrib": path,
        "data": {"dataset": ds, "target": "y"},
        "validation": {
            "feature_accepter": "ballet_ray.validation.accepters.GFSSFAccepter",
            "feature_pruner": "ballet_ray.validation.accepters.NoOpPruner",
        },
        "sample_rows": 600,
    }
    report = validate(config)
    assert len(report["collected"]) == 2
    assert report["accepted"] is True
    assert report["redundant"] == []
    # every feature passed every API check
    assert all(len(v) == 15 for v in report["feature_api"].values())


def test_validate_rejects_noise_feature(tmp_path):
    path = _scaffold(tmp_path, {"user_a": GOOD_A, "user_noise": NOISE})
    ds = _dataset()
    config = {
        "contrib": path,
        "data": {"dataset": ds, "target": "y"},
        "proposed": "_ballet_ray_contrib_user_noise",
        "validation": {
            "feature_accepter": {
                "name": "ballet_ray.validation.accepters.GFSSFAccepter",
                "params": {"lmbda_1": 0.25, "lmbda_2": 0.25},
            },
            "feature_pruner": "ballet_ray.validation.accepters.NoOpPruner",
        },
        "sample_rows": 600,
    }
    with pytest.raises(FeatureRejected):
        validate(config)


def test_validate_structure_and_api_failures(tmp_path):
    empty = tmp_path / "empty_contrib"
    empty.mkdir()
    ds = _dataset()
    base = {
        "data": {"dataset": ds, "target": "y"},
        "validation": {
            "feature_accepter": "ballet_ray.validation.accepters.AlwaysAccepter",
            "feature_pruner": "ballet_ray.validation.accepters.NoOpPruner",
        },
    }
    with pytest.raises(InvalidProjectStructure):
        validate({**base, "contrib": str(empty)})

    bad_api = """
        from ballet_ray import Feature
        import numpy as np
        # drops rows -> fails the dimension checks
        feature = Feature("x1", lambda col: np.asarray(col)[:-1], output="bad")
    """
    path = _scaffold(tmp_path, {"user_bad": bad_api})
    with pytest.raises(InvalidFeatureApi):
        validate({**base, "contrib": path})


def test_validate_with_target_encoder(tmp_path):
    """config.data.target_encoder (a spec or instance with fit/transform)
    encodes y before the acceptance kernels — reference encoder parity."""
    path = _scaffold(tmp_path, {"user_a": GOOD_A})
    ds = _dataset()

    class Standardize:
        def fit(self, y):
            self.m, self.s = float(np.mean(y)), float(np.std(y)) or 1.0
            return self

        def transform(self, y):
            return (np.asarray(y, dtype=float) - self.m) / self.s

    config = {
        "contrib": path,
        "data": {"dataset": ds, "target": "y", "target_encoder": Standardize()},
        "validation": {
            "feature_accepter": "ballet_ray.validation.accepters.GFSSFAccepter",
            "feature_pruner": "ballet_ray.validation.accepters.NoOpPruner",
        },
        "sample_rows": 600,
    }
    report = validate(config)
    assert report["accepted"] is True  # x1 still informative after scaling y


def test_cli_validate_end_to_end(tmp_path):
    """`python -m ballet_ray validate <config.py> -A` on a fixture project
    (reference `ballet validate`, ballet/cli.py:80-116)."""
    import json
    import subprocess
    import sys as _sys

    contrib_dir = _scaffold(tmp_path, {"user_a": GOOD_A, "user_b": GOOD_B})
    data_path = tmp_path / "data.parquet"
    rng = np.random.RandomState(7)
    x1 = rng.randn(600)
    x2 = rng.randn(600)
    pd.DataFrame({"x1": x1, "x2": x2, "y": 3.0 * x1 + 0.5 * x2}).to_parquet(data_path)
    cfg = tmp_path / "config.py"
    cfg.write_text(
        textwrap.dedent(
            f"""
            def get_config():
                return {{
                    "contrib": {str(contrib_dir)!r},
                    "data": {{"path": {str(data_path)!r}, "target": "y"}},
                    "sample_rows": 512,
                }}
            """
        )
    )
    r = subprocess.run(
        [_sys.executable, "-m", "ballet_ray", "validate", str(cfg), "-A"],
        capture_output=True, text=True, cwd="/root/repo",
        env={**__import__("os").environ, "RAY_ADDRESS": "local",
             "BALLET_RAY_NUM_CPUS": "4"},
    )
    assert r.returncode == 0, r.stderr[-2000:]
    out = json.loads(r.stdout.strip().splitlines()[-1])
    assert out["ok"] is True
    got = sorted(out["report"]["collected"])
    assert len(got) == 2
    assert got[0].endswith("user_a") and got[1].endswith("user_b")

    # a failing stage exits 1 with the exception name in the JSON
    cfg_bad = tmp_path / "config_bad.py"
    empty = tmp_path / "empty_contrib"
    empty.mkdir()
    cfg_bad.write_text(
        textwrap.dedent(
            f"""
            CONFIG = {{
                "contrib": {str(empty)!r},
                "data": {{"path": {str(data_path)!r}, "target": "y"}},
            }}
            """
        )
    )
    r2 = subprocess.run(
        [_sys.executable, "-m", "ballet_ray", "validate", str(cfg_bad), "-A"],
        capture_output=True, text=True, cwd="/root/repo",
        env={**__import__("os").environ, "RAY_ADDRESS": "local",
             "BALLET_RAY_NUM_CPUS": "4"},
    )
    assert r2.returncode == 1, r2.stderr[-2000:]
    out2 = json.loads(r2.stdout.strip().splitlines()[-1])
    assert out2["ok"] is False and out2["error"] == "InvalidProjectStructure"
