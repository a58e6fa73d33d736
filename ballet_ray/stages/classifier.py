"""Distributed logistic regression — the model-based quality-filter stage
(fasttext-classifier shape: score every document, filter by probability).

Newton-Raphson (IRLS): each iteration is ONE streaming pass where every
batch computes its gradient and Hessian contribution at the current β
(a dense (d+1)-vector baked into the pass closure — broadcast-by-value,
never re-shipped per batch) and the (d+1) + (d+1)² partials tree-reduce
via ``vector_sum_reduce`` (decomposition.py) — the driver solves one
(d+1)×(d+1) system per iteration and never sees rows. Deterministic:
fixed iteration count, float64 throughout, no sampling.

Reference shape: a fitted sklearn-style step like the encoders the
reference re-exports (ballet/eng/external/sklearn.py); semantics follow
sklearn.linear_model.LogisticRegression(penalty='l2', solver='newton-cg')
up to solver tolerance.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ballet_ray.stages.decomposition import vector_sum_reduce
from ballet_ray.stages.encoders import FittedTransform, _col_f64


def _sigmoid(z: np.ndarray) -> np.ndarray:
    out = np.empty_like(z)
    pos = z >= 0
    out[pos] = 1.0 / (1.0 + np.exp(-z[pos]))
    e = np.exp(z[~pos])
    out[~pos] = e / (1.0 + e)
    return out


def newton_step_partial(X: np.ndarray, y: np.ndarray, beta: np.ndarray) -> np.ndarray:
    """[gradient (d+1), hessian (d+1)²] contribution of one batch."""
    X1 = np.column_stack([X, np.ones(len(X))])
    p = _sigmoid(X1 @ beta)
    g = X1.T @ (y - p)
    w = p * (1.0 - p)
    H = (X1 * w[:, None]).T @ X1
    return np.concatenate([g, H.ravel()])


def fit_logreg(ds, cols: list[str], target: str, *, n_iter: int = 8, l2: float = 1e-6) -> np.ndarray:
    """β = [w_0..w_{d-1}, b] after ``n_iter`` distributed Newton steps."""
    d1 = len(cols) + 1
    beta = np.zeros(d1)
    narrow = ds.select_columns(list(cols) + [target])
    for _ in range(n_iter):
        b = beta.copy()

        def partial(t: pa.Table, b=b) -> np.ndarray:
            X = np.column_stack([_col_f64(t, c) for c in cols])
            y = _col_f64(t, target)
            ok = ~(np.isnan(X).any(axis=1) | np.isnan(y))
            return newton_step_partial(X[ok], y[ok], b)

        v = vector_sum_reduce(narrow, partial)
        g = v[:d1] - l2 * np.concatenate([beta[:-1], [0.0]])
        H = v[d1:].reshape(d1, d1) + l2 * np.diag(np.concatenate([np.ones(d1 - 1), [0.0]]))
        beta = beta + np.linalg.solve(H, g)
    return beta


class DistributedLogReg(FittedTransform):
    """Fitted classifier step: ``fit`` = distributed Newton on the input
    columns against ``target``; ``transform`` emits the predicted
    probability (``prob`` column) — filter downstream with a threshold."""

    def __init__(self, target: str, *, n_iter: int = 8, l2: float = 1e-6, output: str = "prob"):
        self.target = target
        self.n_iter = n_iter
        self.l2 = l2
        self.output = output
        self.fitted_: dict | None = None

    def agg_requests(self, cols):
        return []

    def fit(self, ds, cols):
        beta = fit_logreg(ds, list(cols), self.target, n_iter=self.n_iter, l2=self.l2)
        self.fitted_ = {"beta": beta}

    def fit_table(self, table: pa.Table, cols: list[str]) -> None:
        X = np.column_stack([_col_f64(table, c) for c in cols])
        y = _col_f64(table, self.target)
        ok = ~(np.isnan(X).any(axis=1) | np.isnan(y))
        X, y = X[ok], y[ok]
        d1 = X.shape[1] + 1
        beta = np.zeros(d1)
        for _ in range(self.n_iter):
            v = newton_step_partial(X, y, beta)
            g = v[:d1] - self.l2 * np.concatenate([beta[:-1], [0.0]])
            H = v[d1:].reshape(d1, d1) + self.l2 * np.diag(np.concatenate([np.ones(d1 - 1), [0.0]]))
            beta = beta + np.linalg.solve(H, g)
        self.fitted_ = {"beta": beta}

    def transform_table(self, table: pa.Table, cols: list[str]) -> pa.Table:
        self._check_fitted()
        X = np.column_stack([_col_f64(table, c) for c in cols])
        beta = self.fitted_["beta"]
        p = _sigmoid(X @ beta[:-1] + beta[-1])
        return pa.table({self.output: pa.array(p)})

    def output_names(self, cols):
        return [self.output]
