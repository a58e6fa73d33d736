"""``ballet.yml`` project-config facade.

Reference surface: ``ballet/project.py:174-210`` (``Project.from_path`` /
``from_cwd`` with parent-directory ascent stopping at a filesystem mount)
and the project template's ``ballet.yml`` shape
(``templates/project_template/.../ballet.yml``: ``project``, ``problem``,
``contrib``, ``validation``, ``data`` sections). The reference loads it
through Dynaconf and wires git/GitHub automation; that machinery is out of
scope (SURVEY §2.6) — this module parses the same YAML shape with stdlib
``yaml.safe_load`` into this engine's two config surfaces:

- :class:`~ballet_ray.sources.registry.TableRegistry` from ``data.tables``
  / ``data.splits`` (paths resolve relative to the project directory;
  ``pd_read_kwargs`` from reference projects are accepted and ignored —
  Ray's readers take header-ful csv/parquet/json as-is);
- the config dict ``ballet_ray.validation.main.validate`` documents, with
  ``contrib.module_path`` resolved to a directory for feature collection
  and the reference's validator class paths mapped onto this engine's
  implementations by class name (``ballet.validation.feature_acceptance.
  validator.GFSSFAccepter`` → ``ballet_ray.validation.accepters.
  GFSSFAccepter``; unrecognized names pass through verbatim so
  ``ballet_ray.*`` specs keep working).

``python -m ballet_ray validate`` accepts a ``ballet.yml`` path or a
project directory and routes through this loader.
"""

from __future__ import annotations

import os
import pathlib

from ballet_ray.exc import BalletRayError

DEFAULT_CONFIG_NAME = "ballet.yml"


class ConfigurationError(BalletRayError):
    """ballet.yml missing or unparseable (reference ballet.exc name)."""


def load_config_in_dir(path) -> dict:
    """Parse ``<path>/ballet.yml`` (or ``path`` itself when it is a file).

    Raises ConfigurationError when the file does not exist or does not
    parse to a mapping."""
    import yaml

    p = pathlib.Path(path)
    f = p if p.is_file() else p / DEFAULT_CONFIG_NAME
    if not f.is_file():
        raise ConfigurationError(f"no {DEFAULT_CONFIG_NAME} at {p}")
    try:
        cfg = yaml.safe_load(f.read_text())
    except yaml.YAMLError as e:
        raise ConfigurationError(f"{f}: {e}") from e
    if not isinstance(cfg, dict):
        raise ConfigurationError(f"{f}: expected a mapping, got {type(cfg).__name__}")
    return cfg


def _is_mount(p: pathlib.Path) -> bool:
    try:
        return p.is_mount()
    except OSError:
        return True


# reference validator dotted paths → this engine's implementations,
# resolved by CLASS NAME (the reference module layout does not exist here)
_KNOWN_VALIDATOR_CLASSES = (
    "GFSSFAccepter",
    "GFSSFPruner",
    "VarianceThresholdAccepter",
    "MutualInformationAccepter",
    "CompoundAccepter",
    "AlwaysAccepter",
    "NeverAccepter",
    "RandomAccepter",
)


def _map_validator_spec(spec):
    """Map a reference validator spec onto ballet_ray.validation.accepters
    when the class name is known; otherwise return the spec unchanged."""
    if isinstance(spec, dict):
        name = spec.get("name", "")
        mapped = _map_validator_spec(name)
        if mapped != name:
            return {**spec, "name": mapped}
        return spec
    if isinstance(spec, str):
        cls = spec.rsplit(".", 1)[-1]
        if cls in _KNOWN_VALIDATOR_CLASSES:
            return f"ballet_ray.validation.accepters.{cls}"
    return spec


class Project:
    """A loaded ballet.yml project: raw config + table registry +
    validate() wiring."""

    def __init__(self, path, config: dict):
        self.path = pathlib.Path(path)
        self.config = config

    # -- construction ----------------------------------------------------
    @classmethod
    def from_path(cls, path, ascend: bool = False) -> "Project":
        """Load the project whose ``ballet.yml`` lives at/under ``path``;
        with ``ascend=True`` search parent directories, stopping at a
        filesystem boundary (reference from_path semantics)."""
        p = pathlib.Path(path)
        base = p.parent if p.is_file() else p
        try:
            return cls(base, load_config_in_dir(p))
        except ConfigurationError:
            if ascend:
                parent = base.parent
                if parent != base and parent.exists() and not _is_mount(base):
                    return cls.from_path(parent, ascend=True)
            raise

    @classmethod
    def from_cwd(cls) -> "Project":
        return cls.from_path(pathlib.Path.cwd(), ascend=True)

    # -- config access ---------------------------------------------------
    def get(self, dotted: str, default=None):
        """``project.get('data.entities_table_name')`` — the reference's
        Dynaconf-style dotted access over the plain dict."""
        cur = self.config
        for part in dotted.split("."):
            if not isinstance(cur, dict) or part not in cur:
                return default
            cur = cur[part]
        return cur

    @property
    def name(self):
        return self.get("project.project_name")

    @property
    def version(self):
        return self.config.get("version")

    # -- data ------------------------------------------------------------
    def registry(self, **kw):
        """TableRegistry over ``data.tables`` / ``data.splits`` with paths
        relative to the project directory."""
        from ballet_ray.sources.registry import TableRegistry

        data = dict(self.config.get("data", {}) or {})
        tables = []
        for t in data.get("tables", []) or []:
            t = dict(t)
            t.pop("pd_read_kwargs", None)  # reference pandas knob; readers
            tables.append(t)               # take header-ful files as-is
        cfg = {"tables": tables, "splits": data.get("splits", {}) or {}}
        return TableRegistry(str(self.path), cfg, **kw)

    def load_data(self, split: str | None = None):
        """(dataset, target) the way the reference's load_data resolves
        them: the entities table (under ``data.splits[split]`` when a split
        is named) zipped row-wise with the targets table, target = the
        targets table's single column. When the entities table already
        carries the target column (single-table projects), it is used
        directly."""
        reg = self.registry()
        entities_name = self.get("data.entities_table_name", "entities")
        targets_name = self.get("data.targets_table_name", "targets")
        if split is not None:
            base = pathlib.Path(self.get(f"data.splits.{split}") or "")
            if not str(base):
                raise ConfigurationError(f"unknown split {split!r}")
            reg = Project(self.path / base, self.config).registry()
        entities = reg.load(entities_name)
        target_col = self.get("data.target_column")
        if target_col:
            return entities, target_col
        if targets_name not in reg.names():
            raise ConfigurationError(
                f"targets table {targets_name!r} not in data.tables and no "
                f"data.target_column given"
            )
        targets = reg.load(targets_name)
        tcols = list(targets.schema().names)
        if len(tcols) != 1:
            raise ConfigurationError(
                f"targets table must have exactly one column, got {tcols}"
            )
        # zip aligns row order — the Ray analog of the reference's
        # index-aligned entities/targets frames
        return entities.zip(targets), tcols[0]

    # -- validation ------------------------------------------------------
    def validate_config(self, split: str | None = None) -> dict:
        """The dict ``ballet_ray.validation.main.validate`` takes."""
        if split is None:
            split = self.get("validation.split")
            if split is not None and not self.get(f"data.splits.{split}"):
                split = None  # template default 'train' without a split dir
        ds, target = self.load_data(split)
        contrib = self.get("contrib.module_path")
        if contrib:  # directory of feature modules, relative to the project
            contrib = str(self.path / contrib)
        else:  # dotted module name importable from sys.path
            contrib = self.get("contrib.module_name")
        vconf = dict(self.config.get("validation", {}) or {})
        validation = {}
        for key in ("feature_accepter", "feature_pruner"):
            if key in vconf and vconf[key]:
                validation[key] = _map_validator_spec(vconf[key])
        cfg = {
            "contrib": contrib,
            "data": {"dataset": ds, "target": target},
            "validation": validation,
        }
        enc = self.get("data.target_encoder")
        if enc:
            cfg["data"]["target_encoder"] = enc
        sample_rows = self.get("validation.sample_rows")
        if sample_rows:
            cfg["sample_rows"] = int(sample_rows)
        return cfg
