"""MLBlocks/mlprimitives adapter surface — reference
``ballet/mlprimitives/__init__.py:42-88`` and the JSON annotations under
``ballet/mlprimitives/primitives/``.

The reference exposes its project as three MLBlocks primitives
(``ballet.engineer_features``, ``ballet.encode_target``,
``ballet.drop_missing_targets``) plus two stock pipelines (RF
regressor/classifier). This engine mirrors that surface over its own
project model (a config dict / config file / contrib directory instead of
a git project): JSON annotations live beside this module and
:func:`load_primitive` / :func:`load_pipeline` resolve them without
requiring the ``mlblocks`` package (absent in this env); when MLBlocks IS
installed, ``PRIMITIVES_PATH`` / ``PIPELINES_PATH`` plug into its
``MLBlock`` discovery exactly like the reference's.
"""

from __future__ import annotations

import importlib
import json
import pathlib
from copy import deepcopy

import numpy as np

PRIMITIVES_PATH = [pathlib.Path(__file__).with_name("primitives").resolve()]
PIPELINES_PATH = [pathlib.Path(__file__).with_name("pipelines").resolve()]


def _features_from(contrib=None, config=None):
    """Collect the project's features: from a contrib package/dir, or from
    a config dict / config file in the shape the validate CLI loads."""
    from ballet_ray.contrib import collect_contrib_features

    if contrib is not None:
        return collect_contrib_features(contrib)
    if config is not None:
        if isinstance(config, (str, pathlib.Path)):
            from ballet_ray.__main__ import _load_config

            config = _load_config(str(config))
        return collect_contrib_features(config["contrib"])
    raise ValueError("pass contrib= (package/dir) or config= (dict or config file)")


def make_engineer_features(contrib=None, config=None):
    """The ``ballet_ray.engineer_features`` primitive: a deep copy of the
    project's feature-engineering pipeline (reference
    ``make_engineer_features``, ballet/mlprimitives/__init__.py:42-55)."""
    from ballet_ray.pipeline import FeatureEngineeringPipeline

    return deepcopy(FeatureEngineeringPipeline(_features_from(contrib, config)))


def make_encode_target(contrib=None, config=None, encoder_features=None):
    """The ``ballet_ray.encode_target`` primitive: the project's target
    encoder pipeline (reference ``make_encode_target``,
    ballet/mlprimitives/__init__.py:58-70). ``encoder_features`` overrides
    the collected set (the common case: the target encoder is configured,
    not contributed)."""
    from ballet_ray.pipeline import EncoderPipeline

    if encoder_features is None:
        encoder_features = [] if (contrib is None and config is None) else _features_from(contrib, config)
    return deepcopy(EncoderPipeline(encoder_features))


class DropMissingTargets:
    """Drop rows of (X, y) where y is missing (reference
    ``DropMissingTargets``, ballet/mlprimitives/__init__.py:73-88) — the
    array/frame form MLBlocks feeds."""

    def fit(self, X, y, **kw):
        y = np.asarray(y, dtype=float)
        self.inds_ = ~np.isnan(y)

    def transform(self, X, y=None):
        if y is None:
            return X, y
        if hasattr(X, "loc"):
            return X.loc(axis=0)[self.inds_], y[self.inds_]
        return X[self.inds_, :], np.asarray(y)[self.inds_]


def drop_missing_targets(ds, y_col: str):
    """Dataset-native form: filter out rows whose target is null/NaN —
    one shuffle-free vectorized pass."""
    import pyarrow as pa
    import pyarrow.compute as pc

    def keep(t: pa.Table) -> pa.Table:
        col = t.column(y_col)
        ok = pc.is_valid(col)
        if pa.types.is_floating(col.type):
            ok = pc.and_(ok, pc.invert(pc.is_nan(col)))
        return t.filter(ok)

    return ds.map_batches(keep, batch_format="pyarrow")


def load_primitive(name: str) -> dict:
    """Parse a primitive annotation and resolve its ``primitive`` entry to
    the live callable (returned under the ``"_callable"`` key)."""
    path = PRIMITIVES_PATH[0] / f"{name}.json"
    spec = json.loads(path.read_text())
    mod, attr = spec["primitive"].rsplit(".", 1)
    spec["_callable"] = getattr(importlib.import_module(mod), attr)
    return spec


def load_pipeline(name: str) -> dict:
    return json.loads((PIPELINES_PATH[0] / f"{name}.json").read_text())
