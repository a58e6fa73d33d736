"""ConditionalTransform / SubsetTransform / NamedFramer — the remaining
reference ``ballet.eng`` base operators (SURVEY.md §2.2).

- ConditionalTransform (reference ConditionalTransformer,
  ballet/eng/base.py:257-326): at fit, evaluate a per-column boolean
  condition from distributed statistics; at transform, apply ``satisfy`` to
  satisfied columns and ``unsatisfy`` (default identity) to the rest.
  BoxCoxTransform in encoders.py is its |skew|>t specialization.
- SubsetTransform (reference SubsetTransformer, ballet/eng/base.py:329-361):
  apply an inner transform to named columns, pass every other column
  through unchanged.
- NamedFramer (reference ballet/eng/misc.py:78-116): coerce a 1-column
  output to a given name — subsumed by Feature(output=...), provided for
  API parity.
"""

from __future__ import annotations

from typing import Callable

import numpy as np
import pyarrow as pa

from ballet_ray.stages.encoders import FittedTransform, _col_f64
from ballet_ray.transformer import Transform, desugar_transformer


class ConditionalTransform(FittedTransform):
    """condition: callable({count,mean,std0,std1,min,max}) -> bool, per column.

    Satisfied columns go through ``satisfy`` (a vectorized fn or Transform),
    the rest through ``unsatisfy`` (default: identity).
    """

    def __init__(
        self,
        condition: Callable[[dict], bool],
        satisfy: Callable[[np.ndarray], np.ndarray],
        unsatisfy: Callable[[np.ndarray], np.ndarray] | None = None,
    ):
        self.condition = condition
        self.satisfy = satisfy
        self.unsatisfy = unsatisfy
        self.fitted_ = None

    def agg_requests(self, cols):
        return [("moments", c) for c in cols]

    def bind_fit_results(self, cols, results):
        self.fitted_ = {c: bool(self.condition(results[("moments", c)])) for c in cols}

    def fit_table(self, table, cols):
        self.fitted_ = {}
        for c in cols:
            x = _col_f64(table, c)
            x = x[~np.isnan(x)]
            stats = {
                "count": len(x),
                "mean": float(np.mean(x)) if len(x) else 0.0,
                "std0": float(np.std(x)) if len(x) else 0.0,
                "std1": float(np.std(x, ddof=1)) if len(x) > 1 else 0.0,
                "min": float(np.min(x)) if len(x) else 0.0,
                "max": float(np.max(x)) if len(x) else 0.0,
            }
            self.fitted_[c] = bool(self.condition(stats))

    def transform_table(self, table, cols):
        self._check_fitted()
        out = {}
        for c in cols:
            x = _col_f64(table, c)
            if self.fitted_[c]:
                out[c] = pa.array(self.satisfy(x))
            else:
                out[c] = pa.array(self.unsatisfy(x) if self.unsatisfy else x)
        return pa.table(out)


class SubsetTransform(Transform):
    """Apply ``transformer`` to ``subset`` columns; pass the complement of
    the feature's input through unchanged (reference SubsetTransformer
    semantics, tests/eng/test_base.py:312-341)."""

    def __init__(self, subset: list[str] | str, transformer):
        self.subset = [subset] if isinstance(subset, str) else list(subset)
        self.transformer = desugar_transformer(transformer)

    @property
    def requires_fit(self):  # type: ignore[override]
        return self.transformer.requires_fit

    def agg_requests(self, cols):
        return self.transformer.agg_requests(self.subset)

    def bind_fit_results(self, cols, results):
        self.transformer.bind_fit_results(self.subset, results)

    def fit(self, ds, cols):
        if self.transformer.requires_fit:
            self.transformer.fit(ds, self.subset)
        return self

    def transform_table(self, table, cols):
        res = self.transformer.transform_table(table, self.subset)
        inner_names = self.transformer.output_names(self.subset)
        if list(res.column_names) != inner_names and len(res.column_names) == len(inner_names):
            res = res.rename_columns(inner_names)
        out = {}
        for c in cols:
            if c not in self.subset:
                out[c] = table.column(c)
        for n in res.column_names:
            out[n] = res.column(n)
        return pa.table(out)

    def output_names(self, cols):
        passthrough = [c for c in cols if c not in self.subset]
        return passthrough + self.transformer.output_names(self.subset)


class NamedFramer(Transform):
    """Name a single-column output (reference NamedFramer; with our API the
    Feature(output=...) alias already does this — kept for parity)."""

    def __init__(self, name: str):
        self.name = name

    def transform_table(self, table, cols):
        if len(cols) != 1:
            raise ValueError("NamedFramer takes exactly one column")
        return pa.table({self.name: table.column(cols[0])})

    def output_names(self, cols):
        return [self.name]
