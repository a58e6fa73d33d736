"""Extended encoder families — the remainder of the reference's re-export
surface (ballet/eng/external/category_encoders.py:1-54,
.../sklearn.py:1-46, .../skits.py:1-33), implemented natively for Ray:

- category_encoders family: Hashing, Binary, BaseN, WOE, JamesStein,
  MEstimate, LeaveOneOut — fitted via the batched FitPlanner aggregate
  pass (grouped moments / category sets), transforms as vectorized
  ``map_batches`` lookups.
- sklearn family: Normalizer, PolynomialFeatures, QuantileTransformer,
  PowerTransformer (Yeo-Johnson with distributed single-pass λ-grid
  selection), GaussianRandomProjection.
- skits family: FourierFeatures (seasonal sin/cos terms); Difference and
  the autoregressive/seasonal lags live in stages/windows.py.

All transforms follow the engine's Transform contract: fit statistics are
declared as aggregate requests (ONE distributed pass for all features),
the fitted state is small plain-python, and transforms are numpy/Arrow
kernels with no per-row Python.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from ballet_ray.functions.partition import stable_hash_array
from ballet_ray.stages.encoders import FittedTransform, _col_f64
from ballet_ray.state.fitstate import yeo_johnson, yj_loglik_from_grid
from ballet_ray.transformer import Transform

# ---------------------------------------------------------------------------
# category_encoders family
# ---------------------------------------------------------------------------


class HashingEncoder(Transform):
    """Stateless feature hashing (category_encoders.HashingEncoder):
    category → stable hash → one-hot over n_components buckets. No fit
    pass and no category dictionary — the right encoder when the
    cardinality is unbounded at corpus scale."""

    def __init__(self, n_components: int = 8):
        self.n_components = n_components

    def transform_table(self, table: pa.Table, cols: list[str]) -> pa.Table:
        out = {}
        for c in cols:
            vals = table.column(c).to_numpy(zero_copy_only=False)
            idx = (stable_hash_array(vals) % np.uint64(self.n_components)).astype(np.int64)
            eye = np.zeros((len(vals), self.n_components), dtype=np.int8)
            eye[np.arange(len(vals)), idx] = 1
            for j in range(self.n_components):
                out[f"{c}_h{j}"] = pa.array(eye[:, j])
        return pa.table(out)

    def output_names(self, cols):
        return [f"{c}_h{j}" for c in cols for j in range(self.n_components)]


class BaseNEncoder(FittedTransform):
    """Ordinal code (1-based, sorted categories) → base-N digit columns
    (category_encoders.BaseNEncoder; BinaryEncoder is base=2). Unknown
    categories encode as all-zero digits (code 0)."""

    def __init__(self, base: int = 2):
        if base < 2:
            raise ValueError("base must be >= 2")
        self.base = base
        self.fitted_ = None

    def agg_requests(self, cols):
        return [("cats", c) for c in cols]

    def bind_fit_results(self, cols, results):
        self.fitted_ = {}
        for c in cols:
            cats = sorted(k for k in results[("cats", c)] if k is not None)
            n_digits = max(1, int(np.ceil(np.log(len(cats) + 1) / np.log(self.base))))
            self.fitted_[c] = ({v: i + 1 for i, v in enumerate(cats)}, n_digits)

    def fit_table(self, table, cols):
        self.fitted_ = {}
        for c in cols:
            cats = sorted(set(table.column(c).to_pylist()) - {None})
            n_digits = max(1, int(np.ceil(np.log(len(cats) + 1) / np.log(self.base))))
            self.fitted_[c] = ({v: i + 1 for i, v in enumerate(cats)}, n_digits)

    def transform_table(self, table, cols):
        self._check_fitted()
        out = {}
        for c in cols:
            mapping, n_digits = self.fitted_[c]
            vals = table.column(c).to_numpy(zero_copy_only=False)
            codes = pd.Series(vals).map(mapping).fillna(0).to_numpy(dtype=np.int64)
            for j in range(n_digits):
                digit = (codes // (self.base ** (n_digits - 1 - j))) % self.base
                out[f"{c}_b{j}"] = pa.array(digit.astype(np.int64))
        return pa.table(out)

    def output_names(self, cols):
        self._check_fitted()
        return [f"{c}_b{j}" for c in cols for j in range(self.fitted_[c][1])]


class BinaryEncoder(BaseNEncoder):
    def __init__(self):
        super().__init__(base=2)


class WOEEncoder(FittedTransform):
    """Weight-of-evidence for a BINARY target
    (category_encoders.WOEEncoder): per category,
    ln( ((pos_c + reg) / (pos_tot + 2·reg)) / ((neg_c + reg) / (neg_tot +
    2·reg)) ). Fitted from one grouped-moments pass (mean·count = positive
    count). Unknown categories → 0."""

    def __init__(self, target_col: str, regularization: float = 0.5):
        self.target_col = target_col
        self.regularization = regularization
        self.fitted_ = None

    def agg_requests(self, cols):
        return [("grouped_moments", self.target_col, c) for c in cols] + [
            ("moments", self.target_col)
        ]

    def _bind(self, cols, grouped: dict, pos_tot: float, n_tot: float):
        reg = self.regularization
        neg_tot = n_tot - pos_tot
        self.fitted_ = {}
        for c in cols:
            m = {}
            for g, st in grouped[c].items():
                pos_c = st["mean"] * st["count"]
                neg_c = st["count"] - pos_c
                num = (pos_c + reg) / (pos_tot + 2 * reg)
                den = (neg_c + reg) / (neg_tot + 2 * reg)
                m[g] = float(np.log(num / den))
            self.fitted_[c] = m

    def bind_fit_results(self, cols, results):
        mom = results[("moments", self.target_col)]
        grouped = {c: results[("grouped_moments", self.target_col, c)] for c in cols}
        self._bind(cols, grouped, mom["sum"], mom["count"])

    def transform_table(self, table, cols):
        self._check_fitted()
        out = {}
        for c in cols:
            vals = table.column(c).to_numpy(zero_copy_only=False)
            out[f"{c}_woe"] = pa.array(
                pd.Series(vals).map(self.fitted_[c]).fillna(0.0).to_numpy(dtype=np.float64)
            )
        return pa.table(out)

    def output_names(self, cols):
        return [f"{c}_woe" for c in cols]


class MEstimateEncoder(FittedTransform):
    """m-probability estimate (category_encoders.MEstimateEncoder):
    (sum_cat + m·global_mean) / (count_cat + m); unknown → global mean."""

    def __init__(self, target_col: str, m: float = 1.0):
        self.target_col = target_col
        self.m = m
        self.fitted_ = None

    def agg_requests(self, cols):
        return [("grouped_moments", self.target_col, c) for c in cols] + [
            ("moments", self.target_col)
        ]

    def bind_fit_results(self, cols, results):
        g_mean = results[("moments", self.target_col)]["mean"]
        self.fitted_ = {"global": g_mean, "maps": {}}
        for c in cols:
            self.fitted_["maps"][c] = {
                g: (st["mean"] * st["count"] + self.m * g_mean) / (st["count"] + self.m)
                for g, st in results[("grouped_moments", self.target_col, c)].items()
            }

    def transform_table(self, table, cols):
        self._check_fitted()
        out = {}
        for c in cols:
            vals = table.column(c).to_numpy(zero_copy_only=False)
            out[f"{c}_mest"] = pa.array(
                pd.Series(vals)
                .map(self.fitted_["maps"][c])
                .fillna(self.fitted_["global"])
                .to_numpy(dtype=np.float64)
            )
        return pa.table(out)

    def output_names(self, cols):
        return [f"{c}_mest" for c in cols]


class JamesSteinEncoder(FittedTransform):
    """James-Stein shrinkage toward the global mean
    (category_encoders.JamesSteinEncoder, independent model):
    enc = (1-B)·cat_mean + B·global_mean with
    B = (cat_var/count) / (cat_var/count + global_var), clipped to [0,1].
    Unknown → global mean."""

    def __init__(self, target_col: str):
        self.target_col = target_col
        self.fitted_ = None

    def agg_requests(self, cols):
        return [("grouped_moments", self.target_col, c) for c in cols] + [
            ("moments", self.target_col)
        ]

    def bind_fit_results(self, cols, results):
        mom = results[("moments", self.target_col)]
        g_mean, g_var = mom["mean"], mom["std0"] ** 2
        self.fitted_ = {"global": g_mean, "maps": {}}
        for c in cols:
            m = {}
            for g, st in results[("grouped_moments", self.target_col, c)].items():
                var_of_mean = (st["std0"] ** 2) / max(st["count"], 1.0)
                b = var_of_mean / (var_of_mean + g_var) if (var_of_mean + g_var) > 0 else 0.0
                b = float(np.clip(b, 0.0, 1.0))
                m[g] = (1.0 - b) * st["mean"] + b * g_mean
            self.fitted_["maps"][c] = m

    def transform_table(self, table, cols):
        self._check_fitted()
        out = {}
        for c in cols:
            vals = table.column(c).to_numpy(zero_copy_only=False)
            out[f"{c}_js"] = pa.array(
                pd.Series(vals)
                .map(self.fitted_["maps"][c])
                .fillna(self.fitted_["global"])
                .to_numpy(dtype=np.float64)
            )
        return pa.table(out)

    def output_names(self, cols):
        return [f"{c}_js" for c in cols]


class LeaveOneOutEncoder(FittedTransform):
    """Leave-one-out target mean (category_encoders.LeaveOneOutEncoder):
    on rows where the target column is present, each row's own target is
    excluded — (sum_cat − y_i) / (count_cat − 1); on target-less (new)
    data it degrades to the plain category mean. Unknown → global mean."""

    def __init__(self, target_col: str):
        self.target_col = target_col
        self.fitted_ = None

    def agg_requests(self, cols):
        return [("grouped_moments", self.target_col, c) for c in cols] + [
            ("moments", self.target_col)
        ]

    def bind_fit_results(self, cols, results):
        mom = results[("moments", self.target_col)]
        self.fitted_ = {"global": mom["mean"], "sums": {}, "counts": {}}
        for c in cols:
            grouped = results[("grouped_moments", self.target_col, c)]
            self.fitted_["sums"][c] = {g: st["mean"] * st["count"] for g, st in grouped.items()}
            self.fitted_["counts"][c] = {g: st["count"] for g, st in grouped.items()}

    def transform_table(self, table, cols):
        self._check_fitted()
        has_y = self.target_col in table.column_names
        y = _col_f64(table, self.target_col) if has_y else None
        out = {}
        g_mean = self.fitted_["global"]
        for c in cols:
            vals = pd.Series(table.column(c).to_numpy(zero_copy_only=False))
            s = vals.map(self.fitted_["sums"][c]).to_numpy(dtype=np.float64)
            n = vals.map(self.fitted_["counts"][c]).to_numpy(dtype=np.float64)
            with np.errstate(invalid="ignore", divide="ignore"):
                if has_y:
                    enc = np.where(n > 1, (s - y) / (n - 1), g_mean)
                else:
                    enc = np.where(n > 0, s / n, g_mean)
            enc = np.where(np.isnan(s), g_mean, enc)
            out[f"{c}_loo"] = pa.array(enc)
        return pa.table(out)

    def output_names(self, cols):
        return [f"{c}_loo" for c in cols]


# ---------------------------------------------------------------------------
# sklearn family
# ---------------------------------------------------------------------------


class Normalizer(Transform):
    """Row-wise normalization across the input columns
    (sklearn.preprocessing.Normalizer): each row scaled to unit l1/l2/max
    norm. Stateless, vectorized."""

    def __init__(self, norm: str = "l2"):
        if norm not in ("l1", "l2", "max"):
            raise ValueError(norm)
        self.norm = norm

    def transform_table(self, table: pa.Table, cols: list[str]) -> pa.Table:
        m = np.column_stack([_col_f64(table, c) for c in cols])
        if self.norm == "l2":
            d = np.sqrt((m * m).sum(axis=1))
        elif self.norm == "l1":
            d = np.abs(m).sum(axis=1)
        else:
            d = np.abs(m).max(axis=1)
        d[d == 0] = 1.0
        m = m / d[:, None]
        return pa.table({f"{c}_norm": pa.array(m[:, j]) for j, c in enumerate(cols)})

    def output_names(self, cols):
        return [f"{c}_norm" for c in cols]


class PolynomialFeatures(Transform):
    """Degree-2 polynomial/interaction expansion
    (sklearn.preprocessing.PolynomialFeatures, degree=2): squares and
    pairwise products of the input columns; ``interaction_only`` drops the
    squares. Stateless, vectorized."""

    def __init__(self, interaction_only: bool = False, include_inputs: bool = True):
        self.interaction_only = interaction_only
        self.include_inputs = include_inputs

    def _terms(self, cols: list[str]):
        terms = []
        if self.include_inputs:
            terms += [(c,) for c in cols]
        for i, a in enumerate(cols):
            for b in cols[i:]:
                if self.interaction_only and a == b:
                    continue
                terms.append((a, b))
        return terms

    def transform_table(self, table: pa.Table, cols: list[str]) -> pa.Table:
        data = {c: _col_f64(table, c) for c in cols}
        out = {}
        for term in self._terms(cols):
            if len(term) == 1:
                out[term[0]] = pa.array(data[term[0]])
            else:
                a, b = term
                out[f"{a}_x_{b}"] = pa.array(data[a] * data[b])
        return pa.table(out)

    def output_names(self, cols):
        return [t[0] if len(t) == 1 else f"{t[0]}_x_{t[1]}" for t in self._terms(cols)]


def _probit(p: np.ndarray) -> np.ndarray:
    """Inverse standard-normal CDF (Acklam's rational approximation,
    |rel err| < 1.15e-9 — no scipy in this environment)."""
    a = [-3.969683028665376e+01, 2.209460984245205e+02, -2.759285104469687e+02,
         1.383577518672690e+02, -3.066479806614716e+01, 2.506628277459239e+00]
    b = [-5.447609879822406e+01, 1.615858368580409e+02, -1.556989798598866e+02,
         6.680131188771972e+01, -1.328068155288572e+01]
    c = [-7.784894002430293e-03, -3.223964580411365e-01, -2.400758277161838e+00,
         -2.549732539343734e+00, 4.374664141464968e+00, 2.938163982698783e+00]
    d = [7.784695709041462e-03, 3.224671290700398e-01, 2.445134137142996e+00,
         3.754408661907416e+00]
    p = np.clip(p, 1e-12, 1 - 1e-12)
    out = np.empty_like(p)
    lo, hi = 0.02425, 1 - 0.02425
    m_lo, m_hi = p < lo, p > hi
    m_mid = ~(m_lo | m_hi)
    q = np.sqrt(-2 * np.log(p[m_lo]))
    out[m_lo] = (((((c[0] * q + c[1]) * q + c[2]) * q + c[3]) * q + c[4]) * q + c[5]) / (
        (((d[0] * q + d[1]) * q + d[2]) * q + d[3]) * q + 1
    )
    q = p[m_mid] - 0.5
    r = q * q
    out[m_mid] = (((((a[0] * r + a[1]) * r + a[2]) * r + a[3]) * r + a[4]) * r + a[5]) * q / (
        ((((b[0] * r + b[1]) * r + b[2]) * r + b[3]) * r + b[4]) * r + 1
    )
    q = np.sqrt(-2 * np.log1p(-p[m_hi]))
    out[m_hi] = -(((((c[0] * q + c[1]) * q + c[2]) * q + c[3]) * q + c[4]) * q + c[5]) / (
        (((d[0] * q + d[1]) * q + d[2]) * q + d[3]) * q + 1
    )
    return out


class QuantileTransformer(FittedTransform):
    """Map to the fitted quantile grid (sklearn QuantileTransformer):
    transform = linear interpolation of x onto [0,1] through n_quantiles
    distributed-fitted quantiles; optionally through the probit for a
    normal output distribution."""

    def __init__(self, n_quantiles: int = 33, output_distribution: str = "uniform"):
        if output_distribution not in ("uniform", "normal"):
            raise ValueError(output_distribution)
        self.n_quantiles = n_quantiles
        self.output_distribution = output_distribution
        self.fitted_ = None

    def _qs(self):
        return tuple(np.linspace(0, 1, self.n_quantiles).tolist())

    def agg_requests(self, cols):
        return [("quantile", c, self._qs()) for c in cols]

    def bind_fit_results(self, cols, results):
        self.fitted_ = {
            c: np.asarray(results[("quantile", c, self._qs())], dtype=np.float64) for c in cols
        }

    def fit_table(self, table, cols):
        self.fitted_ = {}
        for c in cols:
            x = _col_f64(table, c)
            self.fitted_[c] = np.quantile(x[~np.isnan(x)], np.asarray(self._qs()))

    def transform_table(self, table, cols):
        self._check_fitted()
        refs = np.linspace(0, 1, self.n_quantiles)
        out = {}
        for c in cols:
            grid = self.fitted_[c]
            p = np.interp(_col_f64(table, c), grid, refs)
            if self.output_distribution == "normal":
                p = _probit(p)
            out[f"{c}_q"] = pa.array(p)
        return pa.table(out)

    def output_names(self, cols):
        return [f"{c}_q" for c in cols]


class PowerTransformer(FittedTransform):
    """Yeo-Johnson power transform with maximum-likelihood λ
    (sklearn.preprocessing.PowerTransformer): λ is selected from a grid by
    profile log-likelihood whose sufficient statistics are gathered in ONE
    distributed pass (state/fitstate.py yj_grid); optional standardize
    uses the same pass's moments at the chosen λ."""

    def __init__(self, standardize: bool = True, grid: tuple | None = None):
        self.standardize = standardize
        self.grid = tuple(grid) if grid is not None else tuple(np.round(np.linspace(-3, 3, 61), 4))
        self.fitted_ = None

    def agg_requests(self, cols):
        return [("yj_grid", c, self.grid) for c in cols]

    def bind_fit_results(self, cols, results):
        self.fitted_ = {}
        for c in cols:
            g = results[("yj_grid", c, self.grid)]
            ll = yj_loglik_from_grid(g)
            j = int(np.argmax(ll))
            n = float(g["n"])
            mean = g["sum"][j] / n
            std = float(np.sqrt(max(g["sumsq"][j] / n - mean * mean, 0.0)))
            self.fitted_[c] = {"lambda": float(g["lambdas"][j]), "mean": mean, "std": std or 1.0}

    def fit_table(self, table, cols):
        lam = np.asarray(self.grid)
        self.fitted_ = {}
        for c in cols:
            x = _col_f64(table, c)
            x = x[~np.isnan(x)]
            y = yeo_johnson(x[:, None], lam[None, :])
            var = np.maximum(y.var(axis=0), 1e-300)
            ll = -0.5 * len(x) * np.log(var) + (lam - 1.0) * np.sum(
                np.sign(x) * np.log1p(np.abs(x))
            )
            j = int(np.argmax(ll))
            self.fitted_[c] = {
                "lambda": float(lam[j]),
                "mean": float(y[:, j].mean()),
                "std": float(y[:, j].std()) or 1.0,
            }

    def transform_table(self, table, cols):
        self._check_fitted()
        out = {}
        for c in cols:
            st = self.fitted_[c]
            y = yeo_johnson(_col_f64(table, c)[:, None], np.asarray([st["lambda"]]))[:, 0]
            if self.standardize:
                y = (y - st["mean"]) / st["std"]
            out[f"{c}_yj"] = pa.array(y)
        return pa.table(out)

    def output_names(self, cols):
        return [f"{c}_yj" for c in cols]


class GaussianRandomProjection(Transform):
    """Seeded Gaussian random projection
    (sklearn.random_projection.GaussianRandomProjection): the input
    columns (or a list<float> embedding column) are projected to
    n_components with a N(0, 1/n_components) matrix generated
    deterministically per seed — no fit pass, identical on every worker."""

    def __init__(self, n_components: int, seed: int = 1754):
        self.n_components = n_components
        self.seed = seed

    def _matrix(self, dim: int) -> np.ndarray:
        rng = np.random.RandomState(self.seed)
        return rng.randn(dim, self.n_components) / np.sqrt(self.n_components)

    def transform_table(self, table: pa.Table, cols: list[str]) -> pa.Table:
        if len(cols) == 1 and pa.types.is_list(table.column(cols[0]).type) or (
            len(cols) == 1 and pa.types.is_fixed_size_list(table.column(cols[0]).type)
        ):
            from ballet_ray.stages.similarity import _emb_matrix

            m = _emb_matrix(table, cols[0])
        else:
            m = np.column_stack([_col_f64(table, c) for c in cols])
        p = m @ self._matrix(m.shape[1])
        return pa.table({f"proj_{j}": pa.array(p[:, j]) for j in range(self.n_components)})

    def output_names(self, cols):
        return [f"proj_{j}" for j in range(self.n_components)]


# ---------------------------------------------------------------------------
# skits family
# ---------------------------------------------------------------------------


class FourierFeatures(Transform):
    """Seasonal sin/cos terms of a timestamp or numeric column
    (skits.feature_extraction.FourierTransformer): for k = 1..num_terms,
    sin/cos(2πk·t/period_seconds). Stateless, vectorized."""

    def __init__(self, period_seconds: float, num_terms: int = 2):
        self.period = float(period_seconds)
        self.num_terms = num_terms

    def transform_table(self, table: pa.Table, cols: list[str]) -> pa.Table:
        from ballet_ray.stages.windows import _ts_us_col

        c = cols[0]
        col = table.column(c)
        if pa.types.is_timestamp(col.type):
            t = _ts_us_col(col).astype(np.float64) / 1e6
        else:
            t = _col_f64(table, c)
        out = {}
        for k in range(1, self.num_terms + 1):
            w = 2.0 * np.pi * k * t / self.period
            out[f"{c}_sin{k}"] = pa.array(np.sin(w))
            out[f"{c}_cos{k}"] = pa.array(np.cos(w))
        return pa.table(out)

    def output_names(self, cols):
        c = cols[0]
        return [f"{c}_{f}{k}" for k in range(1, self.num_terms + 1) for f in ("sin", "cos")]


# ---------------------------------------------------------------------------
# contrast-coding encoders (category_encoders re-export surface:
# Helmert / Sum / BackwardDifference / Polynomial)
# ---------------------------------------------------------------------------


def _contrast_matrix(k: int, scheme: str) -> np.ndarray:
    """(k, k-1) contrast matrix per category-index, patsy conventions
    (category_encoders delegates to patsy for these schemes)."""
    if k < 2:
        return np.zeros((k, 0))
    if scheme == "sum":
        m = np.zeros((k, k - 1))
        m[np.arange(k - 1), np.arange(k - 1)] = 1.0
        m[k - 1, :] = -1.0
        return m
    if scheme == "helmert":
        # patsy Helmert: level j+1 scores j+1 in column j, levels <= j score
        # -1, later levels 0
        m = np.zeros((k, k - 1))
        for j in range(k - 1):
            m[: j + 1, j] = -1.0
            m[j + 1, j] = j + 1.0
        return m
    if scheme == "backward_difference":
        m = np.zeros((k, k - 1))
        for j in range(k - 1):
            m[: j + 1, j] = -(k - j - 1) / k
            m[j + 1 :, j] = (j + 1) / k
        return m
    if scheme == "polynomial":
        # orthonormal polynomial contrasts: QR of the centered Vandermonde
        levels = np.arange(k, dtype=np.float64)
        v = np.vander(levels, k, increasing=True)
        q, _ = np.linalg.qr(v)
        return q[:, 1:]  # drop the constant term
    raise ValueError(scheme)


class ContrastEncoder(FittedTransform):
    """Generic contrast coding: fitted category list (sorted) → each
    category maps to one row of the scheme's contrast matrix; unknown
    categories map to the zero vector. Schemes: sum, helmert,
    backward_difference, polynomial (patsy conventions, as used by
    category_encoders)."""

    def __init__(self, scheme: str):
        _contrast_matrix(2, scheme)  # validate scheme early
        self.scheme = scheme
        self.fitted_ = None

    def agg_requests(self, cols):
        return [("cats", c) for c in cols]

    def _bind_cats(self, cols, cats_by_col):
        self.fitted_ = {}
        for c in cols:
            cats = sorted(v for v in cats_by_col[c] if v is not None)
            m = _contrast_matrix(len(cats), self.scheme)
            self.fitted_[c] = ({v: i for i, v in enumerate(cats)}, m)

    def bind_fit_results(self, cols, results):
        self._bind_cats(cols, {c: results[("cats", c)] for c in cols})

    def fit_table(self, table, cols):
        self._bind_cats(cols, {c: set(table.column(c).to_pylist()) for c in cols})

    def transform_table(self, table, cols):
        self._check_fitted()
        out = {}
        for c in cols:
            mapping, m = self.fitted_[c]
            vals = table.column(c).to_numpy(zero_copy_only=False)
            idx = pd.Series(vals).map(mapping).fillna(-1).to_numpy(dtype=np.int64)
            padded = np.vstack([m, np.zeros((1, m.shape[1]))])  # -1 → zero row
            enc = padded[idx]
            for j in range(m.shape[1]):
                out[f"{c}_{self.scheme}{j}"] = pa.array(enc[:, j])
        return pa.table(out)

    def output_names(self, cols):
        self._check_fitted()
        return [
            f"{c}_{self.scheme}{j}"
            for c in cols
            for j in range(self.fitted_[c][1].shape[1])
        ]


class HelmertEncoder(ContrastEncoder):
    def __init__(self):
        super().__init__("helmert")


class SumEncoder(ContrastEncoder):
    def __init__(self):
        super().__init__("sum")


class BackwardDifferenceEncoder(ContrastEncoder):
    def __init__(self):
        super().__init__("backward_difference")


class PolynomialEncoder(ContrastEncoder):
    def __init__(self):
        super().__init__("polynomial")


class SparseRandomProjection(Transform):
    """Achlioptas sparse random projection
    (sklearn.random_projection.SparseRandomProjection): entries are
    ±sqrt(s/k) with prob 1/(2s) each, 0 with prob 1-1/s (s = 1/density).
    Deterministic per seed; no fit pass."""

    def __init__(self, n_components: int, density: float = 1 / 3, seed: int = 1754):
        self.n_components = n_components
        self.density = density
        self.seed = seed

    def _matrix(self, dim: int) -> np.ndarray:
        rng = np.random.RandomState(self.seed)
        s = 1.0 / self.density
        u = rng.rand(dim, self.n_components)
        scale = np.sqrt(s / self.n_components)
        return np.where(u < 1 / (2 * s), scale, np.where(u < 1 / s, -scale, 0.0))

    def transform_table(self, table: pa.Table, cols: list[str]) -> pa.Table:
        if len(cols) == 1 and (
            pa.types.is_list(table.column(cols[0]).type)
            or pa.types.is_fixed_size_list(table.column(cols[0]).type)
        ):
            from ballet_ray.stages.similarity import _emb_matrix

            m = _emb_matrix(table, cols[0])
        else:
            m = np.column_stack([_col_f64(table, c) for c in cols])
        p = m @ self._matrix(m.shape[1])
        return pa.table({f"sproj_{j}": pa.array(p[:, j]) for j in range(self.n_components)})

    def output_names(self, cols):
        return [f"sproj_{j}" for j in range(self.n_components)]


class CatBoostEncoder:
    """Ordered target encoding (category_encoders.CatBoostEncoder): row i's
    encoding uses ONLY the target values of earlier rows of the same
    category in a fixed traversal order —
    (sum_before + a·prior) / (count_before + a), prior = global target
    mean. Leakage-free by construction; the traversal order here is the
    ``order_col`` (deterministic, SQL-reproducible), not a random
    permutation.

    Built as a keyed scan: one co-partition shuffle on the category, then
    a vectorized per-group shifted-cumsum. On NEW data (transform after
    fit) it degrades to the smoothed category mean, like the library.
    This class is a factory: use ``keyed()`` inside ``apply_keyed`` /
    pipeline keyed passes.
    """

    def __init__(self, cat_col: str, order_col: str, a: float = 1.0):
        self.cat_col, self.order_col, self.a = cat_col, order_col, a

    def keyed(self):
        from ballet_ray.stages.windows import KeyedTransform, _vals

        a = self.a

        class _CatBoostOrdered(KeyedTransform):
            requires_fit = True
            # per-category prefix state is carried across hot slices: the
            # slice summary accumulates prior row counts + target sums, so
            # a hot category's ordered scan is exact when time-sliced
            carry_prefix = True

            def __init__(self, key, order_by):
                super().__init__(key, order_by)
                self.fitted_ = None

            def agg_requests(self, cols):
                return [("moments", c) for c in cols]

            def bind_fit_results(self, cols, results):
                self.fitted_ = {c: results[("moments", c)]["mean"] for c in cols}

            def transform_sorted_carried(self, table, cols, prior_rows, prior_sums):
                out = {}
                n = table.num_rows
                cnt_before = prior_rows + np.arange(n)
                for c in cols:
                    prior = self.fitted_[c]
                    y = _vals(table, c)
                    y0 = np.where(np.isnan(y), 0.0, y)
                    csum = np.cumsum(y0)
                    sum_before = np.concatenate([[0.0], csum[:-1]]) + prior_sums.get(c, 0.0)
                    out[f"{c}_cb"] = (sum_before + a * prior) / (cnt_before + a)
                return out

            def transform_sorted(self, table, codes, starts, cols):
                out = {}
                n = len(codes)
                cnt_before = np.arange(n) - np.repeat(starts, np.diff(np.append(starts, n)))
                for c in cols:
                    prior = self.fitted_[c]
                    y = _vals(table, c)
                    y0 = np.where(np.isnan(y), 0.0, y)
                    csum = np.cumsum(y0)
                    prev = np.concatenate([[0.0], csum[:-1]])
                    group_off = prev[starts]  # cumsum before each group start
                    sum_before = prev - np.repeat(group_off, np.diff(np.append(starts, n)))
                    out[f"{c}_cb"] = (sum_before + a * prior) / (cnt_before + a)
                return out

            def output_names(self, cols):
                return [f"{c}_cb" for c in cols]

        return _CatBoostOrdered(self.cat_col, (self.order_col,))


class PRatioEncoder(FittedTransform):
    """Probability-ratio encoding for a binary target
    (feature_engine.encoding.PRatioEncoder): per category,
    (pos_rate + reg) / (neg_rate + reg); unknown → 1.0 (neutral)."""

    def __init__(self, target_col: str, regularization: float = 1e-6):
        self.target_col = target_col
        self.regularization = regularization
        self.fitted_ = None

    def agg_requests(self, cols):
        return [("grouped_moments", self.target_col, c) for c in cols]

    def bind_fit_results(self, cols, results):
        reg = self.regularization
        self.fitted_ = {}
        for c in cols:
            m = {}
            for g, st in results[("grouped_moments", self.target_col, c)].items():
                p = st["mean"]
                m[g] = float((p + reg) / (1.0 - p + reg))
            self.fitted_[c] = m

    def transform_table(self, table, cols):
        self._check_fitted()
        out = {}
        for c in cols:
            vals = table.column(c).to_numpy(zero_copy_only=False)
            out[f"{c}_pratio"] = pa.array(
                pd.Series(vals).map(self.fitted_[c]).fillna(1.0).to_numpy(dtype=np.float64)
            )
        return pa.table(out)

    def output_names(self, cols):
        return [f"{c}_pratio" for c in cols]


class GLMMEncoder(FittedTransform):
    """Intercept-only random-effects target encoding — the last
    category_encoders member on the reference surface
    (ballet/eng/external/category_encoders.py:31). The library fits a
    statsmodels MixedLM; the distributed analog here is the closed-form
    empirical-Bayes shrinkage of each category mean toward the grand mean,
    with variance components from the one-way-ANOVA method of moments
    (Cochran) — all derived from ONE grouped-moments pass:

        sigma2 = within-category SSE / (N - k)       (pooled residual var)
        c_n    = (N - Σn_c²/N) / (k - 1)
        tau2   = max(0, (between SS - (k-1)·sigma2) / c_n)
        enc(c) = mu + (ȳ_c - mu) · tau2 / (tau2 + sigma2 / n_c)

    Unknown categories at transform → the grand mean mu (zero random
    effect), matching the library's behavior for unseen levels."""

    def __init__(self, target_col: str):
        self.target_col = target_col
        self.fitted_ = None

    def agg_requests(self, cols):
        return [("grouped_moments", self.target_col, c) for c in cols]

    @staticmethod
    def _shrink(gm: dict) -> dict:
        cats = list(gm)
        n = np.array([gm[g]["count"] for g in cats], dtype=np.float64)
        m = np.array([gm[g]["mean"] for g in cats], dtype=np.float64)
        sd0 = np.array([gm[g]["std0"] for g in cats], dtype=np.float64)
        N, k = float(n.sum()), len(cats)
        mu = float((n * m).sum() / N) if N else np.nan
        ss_within = float((n * sd0 * sd0).sum())
        sigma2 = ss_within / max(N - k, 1.0)
        ss_between = float((n * (m - mu) ** 2).sum())
        c_n = (N - float((n * n).sum()) / N) / max(k - 1, 1) if N else 1.0
        tau2 = max(0.0, (ss_between - (k - 1) * sigma2) / max(c_n, 1e-12))
        with np.errstate(invalid="ignore", divide="ignore"):
            enc = mu + (m - mu) * (tau2 / (tau2 + sigma2 / np.maximum(n, 1.0)))
        return {"mu": mu, "enc": {c: float(e) for c, e in zip(cats, enc)}}

    def bind_fit_results(self, cols, results):
        self.fitted_ = {
            c: self._shrink(results[("grouped_moments", self.target_col, c)]) for c in cols
        }

    def fit_table(self, table, cols):
        y = _col_f64(table, self.target_col)
        acc = {}
        for c in cols:
            k = table.column(c).to_pandas()
            df = pd.DataFrame({"k": k, "y": y}).dropna()
            gm = {
                g: {"count": float(len(v)), "mean": float(v.mean()), "std0": float(v.std(ddof=0))}
                for g, v in df.groupby("k")["y"]
            }
            acc[c] = self._shrink(gm)
        self.fitted_ = acc

    def transform_table(self, table, cols):
        self._check_fitted()
        out = {}
        for c in cols:
            st = self.fitted_[c]
            vals = pd.Series(table.column(c).to_pandas()).map(st["enc"])
            out[f"{c}_glmm"] = pa.array(vals.fillna(st["mu"]).to_numpy(dtype=np.float64))
        return pa.table(out)

    def output_names(self, cols):
        return [f"{c}_glmm" for c in cols]
