"""ballet.yml project facade (reference ballet/project.py:174-210 +
templates/.../ballet.yml): YAML → TableRegistry + validate() config,
parent-directory ascent, reference validator-path mapping, and the
`python -m ballet_ray validate <project>` end-to-end path."""

import json
import os
import subprocess
import sys
import textwrap

import numpy as np
import pandas as pd
import pytest

from ballet_ray.project import ConfigurationError, Project, _map_validator_spec

YML = """\
version: 0.19.5
project:
  project_name: Fixture Project
  project_slug: fixture_project
  package_slug: fixture_package
problem:
  problem_type: regression
  problem_type_details:
    scorer: r2
contrib:
  module_name: fixture_package.features.contrib
  module_path: contrib
validation:
  project_structure_validator: ballet.validation.project_structure.validator.ProjectStructureValidator
  feature_api_validator: ballet.validation.feature_api.validator.FeatureApiValidator
  feature_accepter: ballet.validation.feature_acceptance.validator.GFSSFAccepter
  feature_pruner: ballet.validation.feature_pruning.validator.GFSSFPruner
  split: train
data:
  splits:
    train: data/train
  entities_table_name: entities
  targets_table_name: targets
  tables:
    - name: entities
      path: entities.csv
      pd_read_kwargs:
        index_col: 0
    - name: targets
      path: targets.csv
"""

FEATURE = """
    from ballet_ray import Feature
    from ballet_ray.stages.core import IdentityTransform
    feature = Feature("x1", IdentityTransform(), output="x1_id")
"""


def _scaffold(tmp_path, n=400, seed=11):
    proj = tmp_path / "proj"
    (proj / "contrib").mkdir(parents=True)
    (proj / "contrib" / "user_a.py").write_text(textwrap.dedent(FEATURE))
    (proj / "ballet.yml").write_text(YML)
    rng = np.random.RandomState(seed)
    x1, x2 = rng.randn(n), rng.randn(n)
    y = 2.5 * x1 + 0.1 * rng.randn(n)
    # reference layout: tables live under each split dir (data/train/...);
    # a root copy exercises the split-less registry too
    (proj / "data" / "train").mkdir(parents=True)
    for base in (proj, proj / "data" / "train"):
        pd.DataFrame({"x1": x1, "x2": x2}).to_csv(base / "entities.csv", index=False)
        pd.DataFrame({"y": y}).to_csv(base / "targets.csv", index=False)
    return proj


def test_load_and_dotted_access(tmp_path):
    proj = Project.from_path(_scaffold(tmp_path))
    assert proj.name == "Fixture Project"
    assert proj.version == "0.19.5"
    assert proj.get("data.entities_table_name") == "entities"
    assert proj.get("problem.problem_type_details.scorer") == "r2"
    assert proj.get("nope.missing", 42) == 42


def test_ascend_from_subdirectory(tmp_path):
    base = _scaffold(tmp_path)
    sub = base / "contrib"
    assert Project.from_path(sub, ascend=True).name == "Fixture Project"
    with pytest.raises(ConfigurationError):
        Project.from_path(sub, ascend=False)


def test_registry_tables(ray_session, tmp_path):
    proj = Project.from_path(_scaffold(tmp_path))
    reg = proj.registry()
    assert set(reg.names()) == {"entities", "targets"}
    ent = reg.load("entities")
    assert set(ent.schema().names) == {"x1", "x2"}
    assert ent.count() == 400


def test_validator_spec_mapping():
    assert (
        _map_validator_spec("ballet.validation.feature_acceptance.validator.GFSSFAccepter")
        == "ballet_ray.validation.accepters.GFSSFAccepter"
    )
    assert (
        _map_validator_spec({"name": "x.y.VarianceThresholdAccepter", "params": {"threshold": 0.1}})
        == {"name": "ballet_ray.validation.accepters.VarianceThresholdAccepter",
            "params": {"threshold": 0.1}}
    )
    # unknown names pass through verbatim (ballet_ray specs keep working)
    assert _map_validator_spec("my.custom.Accepter") == "my.custom.Accepter"


def test_validate_config_and_run(ray_session, tmp_path):
    from ballet_ray.validation.main import validate

    proj = Project.from_path(_scaffold(tmp_path))
    cfg = proj.validate_config()
    assert cfg["data"]["target"] == "y"
    assert cfg["contrib"].endswith("contrib")
    assert cfg["validation"]["feature_accepter"].startswith("ballet_ray.")
    ds = cfg["data"]["dataset"]
    assert set(ds.schema().names) == {"x1", "x2", "y"}  # zip-aligned target
    report = validate(cfg)
    assert report["accepted"] is True


@pytest.mark.slow
def test_cli_validate_yaml_project(tmp_path):
    proj = _scaffold(tmp_path)
    r = subprocess.run(
        [sys.executable, "-m", "ballet_ray", "validate", str(proj), "-A"],
        capture_output=True, text=True, cwd="/root/repo",
        env={**os.environ, "RAY_ADDRESS": "local", "BALLET_RAY_NUM_CPUS": "4"},
    )
    assert r.returncode == 0, r.stderr[-2000:]
    out = json.loads(r.stdout.strip().splitlines()[-1])
    assert out["ok"] is True
    assert out["report"]["accepted"] is True

    # config error path: empty dir -> exit 2
    empty = tmp_path / "empty"
    empty.mkdir()
    r2 = subprocess.run(
        [sys.executable, "-m", "ballet_ray", "validate", str(empty / "ballet.yml")],
        capture_output=True, text=True, cwd="/root/repo",
        env={**os.environ, "RAY_ADDRESS": "local", "BALLET_RAY_NUM_CPUS": "4"},
    )
    assert r2.returncode == 2
