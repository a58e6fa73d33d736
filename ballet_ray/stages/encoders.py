"""Fitted (stateful) encoders — distributed fit pass, stateless transform.

Reference shape: sklearn-style fit/transform steps re-exported by
ballet/eng/external/sklearn.py and category_encoders.py; the semantics
re-derived here from their public contracts (no sklearn available):

- StandardScaler: z = (x - mean) / std, population std (ddof=0); columns
  with zero variance scale by 1 (sklearn's documented behavior).
- MinMaxScaler: (x - min) / (max - min), zero-range → 0.
- MaxAbsScaler: x / max(|x|).
- RobustScaler: (x - median) / IQR.
- SimpleImputer: fill nulls with fitted mean/median/most_frequent/constant.
- OrdinalEncoder: categories sorted lexicographically → 0..k-1; unknown →
  error or a designated code.
- OneHotEncoder: one int8 column per fitted category.
- CountEncoder / FrequencyEncoder: category → train-count (fraction).
- TargetEncoder: category → mean(target) on train, unseen → global mean.
- KBinsDiscretizer: quantile or uniform bin edges; digitize at transform.
- Winsorizer: clip at fitted quantiles.
- BoxCoxTransform: reference BoxCoxTransformer (ballet/eng/misc.py:33-55) —
  fit computes skewness; skewed columns get log1p (= boxcox1p(x, λ=0)),
  others pass through. ComputedValueTransform mirrors
  ballet/eng/misc.py:130-156.

Fit statistics come from the FitPlanner's batched Dataset pass
(state/fitstate.py); fitted state is a small dict the transform closure
carries to workers.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from ballet_ray.state.fitstate import skewness_from_moments
from ballet_ray.transformer import Transform


class FittedTransform(Transform):
    requires_fit = True

    def _check_fitted(self):
        if not getattr(self, "fitted_", None):
            raise RuntimeError(f"{type(self).__name__} used before fit")

    # local (in-memory) fit used by GroupwiseTransform's per-group fits
    def fit_table(self, table: pa.Table, cols: list[str]) -> None:
        raise NotImplementedError


def _col_f64(table: pa.Table, c: str) -> np.ndarray:
    return table.column(c).to_numpy(zero_copy_only=False).astype(np.float64)


class StandardScaler(FittedTransform):
    def __init__(self, with_mean: bool = True, with_std: bool = True):
        self.with_mean = with_mean
        self.with_std = with_std
        self.fitted_: dict | None = None

    def agg_requests(self, cols):
        return [("moments", c) for c in cols]

    def bind_fit_results(self, cols, results):
        self.fitted_ = {c: results[("moments", c)] for c in cols}

    def fit_table(self, table, cols):
        self.fitted_ = {}
        for c in cols:
            x = _col_f64(table, c)
            x = x[~np.isnan(x)]
            self.fitted_[c] = {"mean": float(np.mean(x)) if len(x) else 0.0,
                               "std0": float(np.std(x)) if len(x) else 0.0}

    def transform_table(self, table, cols):
        self._check_fitted()
        out = {}
        for c in cols:
            x = _col_f64(table, c)
            st = self.fitted_[c]
            if self.with_mean:
                x = x - st["mean"]
            if self.with_std:
                scale = st["std0"] if st["std0"] not in (0.0, None) else 1.0
                x = x / scale
            out[f"{c}_z"] = pa.array(x)
        return pa.table(out)

    def output_names(self, cols):
        return [f"{c}_z" for c in cols]


class MinMaxScaler(FittedTransform):
    def __init__(self):
        self.fitted_ = None

    def agg_requests(self, cols):
        return [("moments", c) for c in cols]

    def bind_fit_results(self, cols, results):
        self.fitted_ = {c: results[("moments", c)] for c in cols}

    def fit_table(self, table, cols):
        self.fitted_ = {}
        for c in cols:
            x = _col_f64(table, c)
            x = x[~np.isnan(x)]
            self.fitted_[c] = {"min": float(np.min(x)), "max": float(np.max(x))} if len(x) else {"min": 0.0, "max": 0.0}

    def transform_table(self, table, cols):
        self._check_fitted()
        out = {}
        for c in cols:
            st = self.fitted_[c]
            rng = (st["max"] - st["min"]) or 1.0
            out[f"{c}_mm"] = pa.array((_col_f64(table, c) - st["min"]) / rng)
        return pa.table(out)

    def output_names(self, cols):
        return [f"{c}_mm" for c in cols]


class MaxAbsScaler(FittedTransform):
    def __init__(self):
        self.fitted_ = None

    def agg_requests(self, cols):
        return [("absmax", c) for c in cols]

    def bind_fit_results(self, cols, results):
        self.fitted_ = {c: results[("absmax", c)]["absmax"] for c in cols}

    def transform_table(self, table, cols):
        self._check_fitted()
        out = {}
        for c in cols:
            scale = self.fitted_[c] or 1.0
            out[f"{c}_ma"] = pa.array(_col_f64(table, c) / scale)
        return pa.table(out)

    def output_names(self, cols):
        return [f"{c}_ma" for c in cols]


class RobustScaler(FittedTransform):
    def __init__(self):
        self.fitted_ = None

    def agg_requests(self, cols):
        return [("quantile", c, (0.25, 0.5, 0.75)) for c in cols]

    def bind_fit_results(self, cols, results):
        self.fitted_ = {c: results[("quantile", c, (0.25, 0.5, 0.75))] for c in cols}

    def transform_table(self, table, cols):
        self._check_fitted()
        out = {}
        for c in cols:
            q1, med, q3 = self.fitted_[c]
            iqr = (q3 - q1) or 1.0
            out[f"{c}_rs"] = pa.array((_col_f64(table, c) - med) / iqr)
        return pa.table(out)

    def output_names(self, cols):
        return [f"{c}_rs" for c in cols]


class SimpleImputer(FittedTransform):
    """strategy ∈ {mean, median, most_frequent, constant}."""

    def __init__(self, strategy: str = "mean", fill_value=None):
        if strategy not in ("mean", "median", "most_frequent", "constant"):
            raise ValueError(strategy)
        self.strategy = strategy
        self.fill_value = fill_value
        self.fitted_ = None

    @property
    def requires_fit(self):  # type: ignore[override]
        return self.strategy != "constant"

    def agg_requests(self, cols):
        if self.strategy == "mean":
            return [("moments", c) for c in cols]
        if self.strategy == "median":
            return [("quantile", c, (0.5,)) for c in cols]
        if self.strategy == "most_frequent":
            return [("cats", c) for c in cols]
        return []

    def bind_fit_results(self, cols, results):
        self.fitted_ = {}
        for c in cols:
            if self.strategy == "mean":
                self.fitted_[c] = results[("moments", c)]["mean"]
            elif self.strategy == "median":
                self.fitted_[c] = results[("quantile", c, (0.5,))][0]
            elif self.strategy == "most_frequent":
                # nulls are what we're imputing — never a candidate value
                counts = {k: v for k, v in results[("cats", c)].items() if k is not None}
                # deterministic tie-break: highest count, then smallest value
                self.fitted_[c] = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))[0][0]

    def fit_table(self, table, cols):
        self.fitted_ = {}
        for c in cols:
            x = table.column(c).to_numpy(zero_copy_only=False)
            if self.strategy == "mean":
                xf = x.astype(np.float64)
                self.fitted_[c] = float(np.nanmean(xf)) if np.any(~np.isnan(xf)) else 0.0
            elif self.strategy == "median":
                self.fitted_[c] = float(np.nanmedian(x.astype(np.float64)))
            elif self.strategy == "most_frequent":
                vals, counts = np.unique(x[~(x == None)], return_counts=True)  # noqa: E711
                order = np.lexsort((vals, -counts))
                self.fitted_[c] = vals[order[0]]

    def transform_table(self, table, cols):
        out = {}
        for c in cols:
            col = table.column(c)
            fill = self.fill_value if self.strategy == "constant" else self.fitted_[c]
            if pa.types.is_floating(col.type):
                # NaN → null so fill_null also covers NaN (null condition
                # yields null output, which fill_null then fills anyway)
                col = pc.if_else(pc.is_nan(col), pa.scalar(None, col.type), col)
            out[c] = pc.fill_null(col, pa.scalar(fill, type=col.type))
        return pa.table(out)


class OrdinalEncoder(FittedTransform):
    """Categories sorted lexicographically → 0..k-1 codes.

    handle_unknown: 'error' | 'use_encoded_value' (→ unknown_value).
    """

    def __init__(self, handle_unknown: str = "use_encoded_value", unknown_value: int = -1):
        self.handle_unknown = handle_unknown
        self.unknown_value = unknown_value
        self.fitted_ = None

    def agg_requests(self, cols):
        return [("cats", c) for c in cols]

    def bind_fit_results(self, cols, results):
        from ballet_ray.state.fitstate import HashedCategoryCounts

        self.fitted_ = {}
        for c in cols:
            r = results[("cats", c)]
            if isinstance(r, HashedCategoryCounts):  # cardinality auto-gate
                self.fitted_[c] = r
            else:
                self.fitted_[c] = {
                    v: i for i, v in enumerate(sorted(k for k in r if k is not None))
                }

    def fit_table(self, table, cols):
        self.fitted_ = {}
        for c in cols:
            vals = sorted(set(table.column(c).to_pylist()) - {None})
            self.fitted_[c] = {v: i for i, v in enumerate(vals)}

    def transform_table(self, table, cols):
        from ballet_ray.state.fitstate import HashedCategoryCounts

        self._check_fitted()
        out = {}
        for c in cols:
            mapping = self.fitted_[c]
            vals = table.column(c).to_numpy(zero_copy_only=False)
            if isinstance(mapping, HashedCategoryCounts):
                # hashed mode (auto-gated unbounded cardinality): code =
                # hash % space; unknowns indistinguishable, nulls -> unknown
                codes = mapping.codes(vals)
                nulls = pd.isna(vals)
                codes[nulls] = self.unknown_value
                out[f"{c}_code"] = pa.array(codes)
                continue
            # hash-map lookup vectorized in C (pd.Series.map), not a Python
            # generator per row
            codes = (
                pd.Series(vals).map(mapping).fillna(self.unknown_value).to_numpy(dtype=np.int64)
            )
            if self.handle_unknown == "error" and (codes == self.unknown_value).any():
                unseen = {v for v in vals if v not in mapping}
                raise ValueError(f"unknown categories in {c}: {sorted(unseen)[:5]}")
            out[f"{c}_code"] = pa.array(codes)
        return pa.table(out)

    def output_names(self, cols):
        return [f"{c}_code" for c in cols]


class OneHotEncoder(FittedTransform):
    def __init__(self, max_categories: int = 64):
        self.max_categories = max_categories
        self.fitted_ = None

    def agg_requests(self, cols):
        return [("cats", c) for c in cols]

    def bind_fit_results(self, cols, results):
        self.fitted_ = {}
        for c in cols:
            cats = sorted(k for k in results[("cats", c)] if k is not None)
            if len(cats) > self.max_categories:
                raise ValueError(f"{c}: {len(cats)} categories > max {self.max_categories}")
            self.fitted_[c] = cats

    def fit_table(self, table, cols):
        self.fitted_ = {c: sorted(set(table.column(c).to_pylist()) - {None}) for c in cols}

    def transform_table(self, table, cols):
        self._check_fitted()
        out = {}
        for c in cols:
            col = table.column(c)
            for cat in self.fitted_[c]:
                out[f"{c}__{cat}"] = pc.cast(pc.equal(col, cat), pa.int8())
        return pa.table(out)

    def output_names(self, cols):
        self._check_fitted()
        return [f"{c}__{cat}" for c in cols for cat in self.fitted_[c]]


class CountEncoder(FittedTransform):
    """category → its train-set count (category_encoders.CountEncoder parity,
    reference re-export ballet/eng/external/category_encoders.py)."""

    def __init__(self, normalize: bool = False, unknown: float = 0.0):
        self.normalize = normalize
        self.unknown = unknown
        self.fitted_ = None

    def agg_requests(self, cols):
        return [("cats", c) for c in cols]

    def bind_fit_results(self, cols, results):
        from ballet_ray.state.fitstate import HashedCategoryCounts

        self.fitted_ = {}
        for c in cols:
            r = results[("cats", c)]
            if isinstance(r, HashedCategoryCounts):  # cardinality auto-gate
                self.fitted_[c] = r
                continue
            counts = dict(r)
            if self.normalize:
                total = sum(counts.values()) or 1
                counts = {k: v / total for k, v in counts.items()}
            self.fitted_[c] = counts

    def fit_table(self, table, cols):
        self.fitted_ = {}
        for c in cols:
            vals, counts = np.unique(table.column(c).to_numpy(zero_copy_only=False), return_counts=True)
            d = dict(zip(vals.tolist(), counts.tolist()))
            if self.normalize:
                total = sum(d.values()) or 1
                d = {k: v / total for k, v in d.items()}
            self.fitted_[c] = d

    def transform_table(self, table, cols):
        from ballet_ray.state.fitstate import HashedCategoryCounts

        self._check_fitted()
        out = {}
        for c in cols:
            m = self.fitted_[c]
            vals = table.column(c).to_numpy(zero_copy_only=False)
            if isinstance(m, HashedCategoryCounts):
                # hashed mode: bucket counts (collisions overestimate the
                # rare tail); nulls -> unknown; normalize over total rows
                enc = m.lookup(vals).astype(np.float64)
                if self.normalize:
                    enc = enc / max(float(m.counts.sum()), 1.0)
                enc[pd.isna(vals)] = self.unknown
                if not self.normalize:
                    enc = enc.astype(np.int64)
                out[f"{c}_count"] = pa.array(enc)
                continue
            enc = pd.Series(vals).map(m).fillna(self.unknown).to_numpy(dtype=np.float64)
            if not self.normalize:
                enc = enc.astype(np.int64)
            out[f"{c}_count"] = pa.array(enc)
        return pa.table(out)

    def output_names(self, cols):
        return [f"{c}_count" for c in cols]


class TargetEncoder(FittedTransform):
    """category → mean(target) over train; unseen → global target mean.

    cols = [category_col]; the target column is a constructor param so the
    fit pass can request grouped moments of target by category.
    """

    def __init__(self, target_col: str):
        self.target_col = target_col
        self.fitted_ = None

    def agg_requests(self, cols):
        return [("grouped_moments", self.target_col, c) for c in cols] + [
            ("moments", self.target_col)
        ]

    def bind_fit_results(self, cols, results):
        from ballet_ray.state.fitstate import HashedGroupedStats

        maps = {}
        for c in cols:
            r = results[("grouped_moments", self.target_col, c)]
            if isinstance(r, HashedGroupedStats):  # cardinality auto-gate
                maps[c] = r
            else:
                maps[c] = {g: st["mean"] for g, st in r.items()}
        self.fitted_ = {
            "global": results[("moments", self.target_col)]["mean"],
            "maps": maps,
        }

    def transform_table(self, table, cols):
        from ballet_ray.state.fitstate import HashedGroupedStats

        self._check_fitted()
        out = {}
        g = self.fitted_["global"]
        for c in cols:
            m = self.fitted_["maps"][c]
            vals = table.column(c).to_numpy(zero_copy_only=False)
            if isinstance(m, HashedGroupedStats):
                # hashed mode: per-bucket target means (collisions blend the
                # rare tail); empty buckets and nulls -> global mean
                enc = m.lookup_mean(vals, g)
                enc[pd.isna(vals)] = g
                out[f"{c}_tmean"] = pa.array(enc)
                continue
            out[f"{c}_tmean"] = pa.array(
                pd.Series(vals).map(m).fillna(g).to_numpy(dtype=np.float64)
            )
        return pa.table(out)

    def output_names(self, cols):
        return [f"{c}_tmean" for c in cols]


class KBinsDiscretizer(FittedTransform):
    """strategy ∈ {quantile, uniform}; ordinal codes via searchsorted on the
    fitted edges (right-exclusive except the last bin)."""

    def __init__(self, n_bins: int = 5, strategy: str = "quantile"):
        self.n_bins = n_bins
        self.strategy = strategy
        self.fitted_ = None

    def agg_requests(self, cols):
        if self.strategy == "quantile":
            qs = tuple(np.linspace(0, 1, self.n_bins + 1)[1:-1].tolist())
            return [("quantile", c, qs) for c in cols]
        return [("moments", c) for c in cols]

    def bind_fit_results(self, cols, results):
        self.fitted_ = {}
        for c in cols:
            if self.strategy == "quantile":
                qs = tuple(np.linspace(0, 1, self.n_bins + 1)[1:-1].tolist())
                self.fitted_[c] = np.asarray(results[("quantile", c, qs)], dtype=np.float64)
            else:
                st = results[("moments", c)]
                self.fitted_[c] = np.linspace(st["min"], st["max"], self.n_bins + 1)[1:-1]

    def fit_table(self, table, cols):
        self.fitted_ = {}
        for c in cols:
            x = _col_f64(table, c)
            x = x[~np.isnan(x)]
            if self.strategy == "quantile":
                self.fitted_[c] = np.quantile(x, np.linspace(0, 1, self.n_bins + 1)[1:-1])
            else:
                self.fitted_[c] = np.linspace(x.min(), x.max(), self.n_bins + 1)[1:-1]

    def transform_table(self, table, cols):
        self._check_fitted()
        out = {}
        for c in cols:
            edges = np.asarray(self.fitted_[c], dtype=np.float64)
            out[f"{c}_bin"] = pa.array(np.searchsorted(edges, _col_f64(table, c), side="right").astype(np.int64))
        return pa.table(out)

    def output_names(self, cols):
        return [f"{c}_bin" for c in cols]


class Winsorizer(FittedTransform):
    """Clip at fitted (lo, hi) quantiles (feature_engine Winsorizer parity,
    reference re-export ballet/eng/external/feature_engine.py)."""

    def __init__(self, lo: float = 0.01, hi: float = 0.99):
        self.lo = lo
        self.hi = hi
        self.fitted_ = None

    def agg_requests(self, cols):
        return [("quantile", c, (self.lo, self.hi)) for c in cols]

    def bind_fit_results(self, cols, results):
        self.fitted_ = {c: results[("quantile", c, (self.lo, self.hi))] for c in cols}

    def transform_table(self, table, cols):
        self._check_fitted()
        out = {}
        for c in cols:
            lo, hi = self.fitted_[c]
            out[f"{c}_w"] = pa.array(np.clip(_col_f64(table, c), lo, hi))
        return pa.table(out)

    def output_names(self, cols):
        return [f"{c}_w" for c in cols]


class BoxCoxTransform(FittedTransform):
    """Reference BoxCoxTransformer (ballet/eng/misc.py:33-55): at fit, apply
    log1p (boxcox1p λ=0) to columns whose |skewness| > threshold; others pass
    through unchanged. The skewness comes from a distributed central-moment
    pass (ConditionalTransformer fit semantics, ballet/eng/base.py:257-326)."""

    def __init__(self, threshold: float = 0.75):
        self.threshold = threshold
        self.fitted_ = None

    def agg_requests(self, cols):
        return [("moments3", c) for c in cols]

    def bind_fit_results(self, cols, results):
        self.fitted_ = {}
        for c in cols:
            st = results[("moments3", c)]
            skew = skewness_from_moments(st["count"], st["m2"], st["m3"])
            self.fitted_[c] = abs(skew) > self.threshold

    def fit_table(self, table, cols):
        self.fitted_ = {}
        for c in cols:
            x = _col_f64(table, c)
            x = x[~np.isnan(x)]
            if len(x) == 0:
                self.fitted_[c] = False
                continue
            d = x - x.mean()
            skew = skewness_from_moments(len(x), float(np.sum(d**2)), float(np.sum(d**3)))
            self.fitted_[c] = abs(skew) > self.threshold

    def transform_table(self, table, cols):
        self._check_fitted()
        out = {}
        for c in cols:
            x = _col_f64(table, c)
            out[c] = pa.array(np.log1p(x) if self.fitted_[c] else x)
        return pa.table(out)


class ComputedValueTransform(FittedTransform):
    """Reference ComputedValueTransformer (ballet/eng/misc.py:130-156): fit
    computes a scalar statistic on train, transform emits it as a constant
    column. Supported stats: mean, min, max, count."""

    def __init__(self, stat: str = "mean"):
        if stat not in ("mean", "min", "max", "count"):
            raise ValueError(stat)
        self.stat = stat
        self.fitted_ = None

    def agg_requests(self, cols):
        return [("moments", c) for c in cols]

    def bind_fit_results(self, cols, results):
        self.fitted_ = {c: results[("moments", c)][self.stat if self.stat != "count" else "count"] for c in cols}

    def transform_table(self, table, cols):
        self._check_fitted()
        n = table.num_rows
        return pa.table(
            {f"{c}_{self.stat}": pa.array(np.full(n, float(self.fitted_[c]))) for c in cols}
        )

    def output_names(self, cols):
        return [f"{c}_{self.stat}" for c in cols]
