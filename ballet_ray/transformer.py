"""Transform protocol + robust UDF adapter.

Reference semantics being reproduced (NOT ported — the reference is
single-process pandas):

- transformer steps expose ``fit(X, y=None)`` / ``transform(X)``
  (structural check: ballet/transformer.py:273-287);
- ``DelegatingRobustTransformer`` (ballet/transformer.py:95-210) retries a
  user callable under several input conversions and memoizes the first
  success. Our :class:`RobustFunctionTransform` does the same per-batch:
  it probes (numpy-1d | numpy-2d | pandas-Series | pandas-DataFrame |
  arrow-table) on the first batch and caches the winning approach.

Transforms here are *batch-level*: ``transform_table(tbl, cols)`` receives a
zero-copy Arrow batch and returns a table of output columns with the same
row count. Fitted state must be small and picklable — it is closed over by
the ``map_batches`` function and shipped to workers once per stage.
"""

from __future__ import annotations

from typing import Callable

import numpy as np
import pandas as pd
import pyarrow as pa


class UnsuccessfulInputConversionError(RuntimeError):
    """No input-conversion approach allowed the wrapped callable to succeed."""


class Transform:
    """Base transform. Stateless unless ``requires_fit``.

    Fit contract (distributed): either declare aggregate requests via
    ``agg_requests``/``bind_fit_results`` (batched into one Dataset pass by
    the pipeline's FitPlanner) or override ``fit(ds, cols)`` for transforms
    whose fit is itself a shuffle (per-group fits, quantiles over groups).
    """

    requires_fit: bool = False

    # -- distributed fit ---------------------------------------------------
    def agg_requests(self, cols: list[str]):
        return []

    def bind_fit_results(self, cols: list[str], results: dict) -> None:
        pass

    def fit(self, ds, cols: list[str]):
        if self.requires_fit:
            from ballet_ray.state.fitstate import FitPlanner

            planner = FitPlanner()
            planner.add(self, cols)
            planner.run(ds)
        return self

    # -- transform ---------------------------------------------------------
    def transform_table(self, table: pa.Table, cols: list[str]) -> pa.Table:
        raise NotImplementedError

    def output_names(self, cols: list[str]) -> list[str]:
        """Default: one output per input column."""
        return list(cols)

    # -- sklearn-style conveniences (used by feature-API checks) -----------
    def fit_transform(self, ds, cols: list[str]):
        self.fit(ds, cols)
        from ballet_ray.pipeline import transform_dataset_single

        return transform_dataset_single(ds, self, cols)


def _numeric_matrix(table: pa.Table, cols: list[str]) -> np.ndarray:
    """cols → float64 2-D matrix (n, len(cols))."""
    arrs = [table.column(c).to_numpy(zero_copy_only=False).astype(np.float64) for c in cols]
    return np.column_stack(arrs) if arrs else np.empty((table.num_rows, 0))


def _to_output_table(result, names: list[str], num_rows: int) -> pa.Table:
    """Coerce a UDF result (arrow/pandas/numpy/list) into an output table."""
    if isinstance(result, pa.Table):
        if names and list(result.column_names) != names and len(result.column_names) == len(names):
            result = result.rename_columns(names)
        return result
    if isinstance(result, (pa.ChunkedArray, pa.Array)):
        return pa.table({names[0]: result})
    if isinstance(result, pd.DataFrame):
        out = pa.Table.from_pandas(result, preserve_index=False)
        if names and len(out.column_names) == len(names):
            out = out.rename_columns(names)
        return out
    if isinstance(result, pd.Series):
        return pa.table({names[0]: pa.Array.from_pandas(result)})
    arr = np.asarray(result)
    if arr.ndim == 1:
        if len(arr) != num_rows:
            raise ValueError(f"UDF returned {len(arr)} rows, expected {num_rows}")
        return pa.table({names[0]: pa.array(arr)})
    if arr.ndim == 2:
        if arr.shape[0] != num_rows:
            raise ValueError(f"UDF returned {arr.shape[0]} rows, expected {num_rows}")
        if len(names) != arr.shape[1]:
            names = [f"{names[0]}_{j}" for j in range(arr.shape[1])]
        return pa.table({n: pa.array(arr[:, j]) for j, n in enumerate(names)})
    raise TypeError(f"cannot coerce UDF output of type {type(result)}")


#: conversion approaches probed by RobustFunctionTransform, in order.
_APPROACHES = ("arrow", "numpy1d", "series", "dataframe", "numpy2d")


def _convert_input(table: pa.Table, cols: list[str], approach: str):
    if approach == "arrow":
        return table.select(cols)
    if approach == "numpy1d":
        if len(cols) != 1:
            raise ValueError("numpy1d needs exactly one column")
        return table.column(cols[0]).to_numpy(zero_copy_only=False)
    if approach == "series":
        if len(cols) != 1:
            raise ValueError("series needs exactly one column")
        return table.column(cols[0]).to_pandas()
    if approach == "dataframe":
        return table.select(cols).to_pandas()
    if approach == "numpy2d":
        return _numeric_matrix(table, cols)
    raise ValueError(approach)


class RobustFunctionTransform(Transform):
    """Wrap a bare callable, probing input conversions like the reference's
    DelegatingRobustTransformer (ballet/transformer.py:113-210): first batch
    tries each approach in order, first success is memoized and replayed.
    """

    def __init__(self, func: Callable, name: str | None = None, **kwargs):
        self.func = func
        self.kwargs = kwargs
        self.name = name or getattr(func, "__name__", "func")
        self._approach: str | None = None

    def transform_table(self, table: pa.Table, cols: list[str]) -> pa.Table:
        names = self.output_names(cols)
        if self._approach is not None:
            x = _convert_input(table, cols, self._approach)
            return _to_output_table(self.func(x, **self.kwargs), names, table.num_rows)
        errors = []
        for approach in _APPROACHES:
            try:
                x = _convert_input(table, cols, approach)
                out = _to_output_table(self.func(x, **self.kwargs), names, table.num_rows)
            except Exception as e:  # noqa: BLE001 — probing by design
                errors.append(f"{approach}: {type(e).__name__}: {e}")
                continue
            self._approach = approach
            return out
        raise UnsuccessfulInputConversionError(
            f"no input conversion worked for {self.name}: " + "; ".join(errors)
        )

    def output_names(self, cols: list[str]) -> list[str]:
        return [f"{self.name}_{c}" for c in cols] if len(cols) > 1 else [self.name]


class ChainTransform(Transform):
    """Sequential composition (reference TransformerPipeline,
    ballet/transformer.py:25-50): output columns of step i feed step i+1."""

    def __init__(self, steps: list[Transform]):
        self.steps = steps

    @property
    def requires_fit(self) -> bool:  # type: ignore[override]
        return any(s.requires_fit for s in self.steps)

    def fit(self, ds, cols: list[str]):
        cur_cols = list(cols)
        cur_ds = ds
        for i, step in enumerate(self.steps):
            if step.requires_fit:
                step.fit(cur_ds, cur_cols)
            out_cols = step.output_names(cur_cols)
            if i < len(self.steps) - 1:
                from ballet_ray.pipeline import transform_dataset_single

                cur_ds = transform_dataset_single(cur_ds, step, cur_cols)
                cur_cols = out_cols
        return self

    def transform_table(self, table: pa.Table, cols: list[str]) -> pa.Table:
        cur, cur_cols = table, list(cols)
        for step in self.steps:
            cur = step.transform_table(cur, cur_cols)
            cur_cols = list(cur.column_names)
        return cur

    def output_names(self, cols: list[str]) -> list[str]:
        cur = list(cols)
        for step in self.steps:
            cur = step.output_names(cur)
        return cur


def validate_transform_api(t) -> None:
    """Structural check mirroring the reference's _validate_transformer_api
    (ballet/transformer.py:273-287): must have fit / transform_table."""
    for attr in ("fit", "transform_table"):
        if not callable(getattr(t, attr, None)):
            raise TypeError(f"{t!r} does not implement {attr}()")


class NestedFeatureTransform(Transform):
    """A Feature used as a transformer step inside another Feature
    (reference nested-feature support, evidence tests/test_pipeline.py:23-40,
    tests/test_transformer.py:147-158): the nested feature reads its OWN
    declared input columns, ignoring the outer feature's."""

    def __init__(self, feature):
        if callable(feature.input) and not isinstance(feature.input, (str, list, tuple)):
            raise TypeError("nested features need explicit input columns")
        self.feature = feature
        self._cols = [feature.input] if isinstance(feature.input, str) else list(feature.input)

    @property
    def requires_fit(self):  # type: ignore[override]
        return self.feature.transformer.requires_fit

    def agg_requests(self, cols):
        return self.feature.transformer.agg_requests(self._cols)

    def bind_fit_results(self, cols, results):
        self.feature.transformer.bind_fit_results(self._cols, results)

    def fit(self, ds, cols):
        if self.requires_fit:
            self.feature.transformer.fit(ds, self._cols)
        return self

    def transform_table(self, table: pa.Table, cols: list[str]) -> pa.Table:
        return self.feature.transform_table(table)

    def output_names(self, cols):
        inferred = self.feature.transformer.output_names(self._cols)
        if self.feature.output is not None and len(self.feature.output) == len(inferred):
            return list(self.feature.output)
        return inferred


def desugar_transformer(t) -> Transform:
    """Reference desugaring rules (ballet/transformer.py:290-309):
    None → Identity; bare callable → robust function transform;
    list/tuple of steps → chain; a Feature → nested-feature step;
    Transform passes through."""
    from ballet_ray.feature import Feature
    from ballet_ray.stages.core import IdentityTransform

    if t is None:
        return IdentityTransform()
    if isinstance(t, Transform):
        return t
    if isinstance(t, Feature):
        return NestedFeatureTransform(t)
    if isinstance(t, (list, tuple)):
        return ChainTransform([desugar_transformer(s) for s in t])
    if callable(t):
        return RobustFunctionTransform(t)
    raise TypeError(f"cannot interpret transformer: {t!r}")


def get_transformer_primitives(transformer) -> list[str]:
    """Class names of the primitives underlying a transformer (reference
    ballet/transformer.py:312-327): a chain reports each step's primitive;
    a wrapped callable reports the callable's name; a nested feature
    reports its inner transformer's primitives."""
    t = desugar_transformer(transformer)
    if isinstance(t, ChainTransform):
        return [p for s in t.steps for p in get_transformer_primitives(s)]
    if isinstance(t, NestedFeatureTransform):
        return get_transformer_primitives(t.feature.transformer)
    if isinstance(t, RobustFunctionTransform):
        return [t.name]
    return [type(t).__name__]
