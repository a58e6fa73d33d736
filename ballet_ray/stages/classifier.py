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


def _text_features(t: pa.Table, *, text_col: str, buckets: int, ngmax: int,
                   method: str) -> np.ndarray:
    """Dense hashed-n-gram frequency matrix (n_rows × buckets) of a batch —
    the fastText featurization: uni+bigram counts hashed into a FIXED
    bucket space (nothing vocabulary-sized ever exists), rows normalized
    by their gram count. One bincount over doc×bucket codes, no Python
    per row (the gram stream comes from dsir's dictionary-encode kernel)."""
    from ballet_ray.stages.dsir import _gram_buckets

    b, docs, n = _gram_buckets(t, text_col=text_col, buckets=buckets,
                               ngmax=ngmax, method=method)
    if n == 0:
        return np.zeros((0, buckets))
    cnt = np.bincount(docs * buckets + b, minlength=n * buckets).astype(np.float64)
    X = cnt.reshape(n, buckets)
    X /= np.maximum(X.sum(axis=1, keepdims=True), 1.0)
    return X


def fit_text_logreg(ds, *, label_col: str, text_col: str = "text",
                    buckets: int = 256, ngmax: int = 2, n_iter: int = 8,
                    l2: float = 1e-4, method: str = "siphash") -> dict:
    """fastText-shape quality classifier fit (Joulin et al. 2016, the
    CCNet/GPT-3 'looks like the reference corpus' filter): logistic
    regression over hashed uni+bigram frequency features, trained with the
    same distributed Newton as :func:`fit_logreg` — each iteration is ONE
    streaming pass; the (B+1)+(B+1)² partials tree-reduce and the driver
    solves one (B+1)×(B+1) system, never seeing rows. ``label_col`` is
    0/1 (1 = high quality / in-domain). Returns a small model dict for
    :func:`score_text_logreg` (picklable; persistable via state/persist).
    """
    if method not in ("md5", "siphash"):
        raise ValueError("method must be 'md5' or 'siphash'")
    d1 = buckets + 1
    beta = np.zeros(d1)
    narrow = ds.select_columns([text_col, label_col])
    for _ in range(n_iter):
        b0 = beta.copy()

        def partial(t: pa.Table, b0=b0) -> np.ndarray:
            X = _text_features(t, text_col=text_col, buckets=buckets,
                               ngmax=ngmax, method=method)
            y = _col_f64(t, label_col)
            ok = ~np.isnan(y)
            return newton_step_partial(X[ok], y[ok], b0)

        v = vector_sum_reduce(narrow, partial)
        g = v[:d1] - l2 * np.concatenate([beta[:-1], [0.0]])
        H = v[d1:].reshape(d1, d1) + l2 * np.diag(np.concatenate([np.ones(d1 - 1), [0.0]]))
        beta = beta + np.linalg.solve(H, g)
    return {"beta": beta, "buckets": buckets, "ngmax": ngmax,
            "method": method, "text_col": text_col}


def score_text_logreg(ds, model: dict, *, output: str = "prob",
                      text_col: str | None = None):
    """Score every document under a fitted text classifier: one
    shuffle-free ``map_batches`` pass appending ``output`` = P(label=1).
    The model is a ~2 KB dict baked into the task closure."""
    text_col = text_col or model["text_col"]
    beta = np.asarray(model["beta"])
    buckets, ngmax, method = model["buckets"], model["ngmax"], model["method"]

    def score(t: pa.Table) -> pa.Table:
        X = _text_features(t, text_col=text_col, buckets=buckets,
                           ngmax=ngmax, method=method)
        p = _sigmoid(X @ beta[:-1] + beta[-1])
        return t.append_column(output, pa.array(p))

    return ds.map_batches(score, batch_format="pyarrow")


def calibrate_threshold(ds, model: dict, *, keep_rate: float,
                        text_col: str | None = None, k: int = 4096) -> float:
    """Probability threshold that keeps ~``keep_rate`` of the corpus under
    a fitted text classifier — "keep the best 20%" without knowing the
    score distribution up front. One streaming pass: scores feed the KLL
    quantile sketch (exact below ``k`` docs, rank error ~1/k above);
    nothing materializes. Use the result as
    ``quality_filter_by_model(..., threshold=...)``."""
    if not 0.0 < keep_rate <= 1.0:
        raise ValueError("keep_rate must be in (0, 1]")
    from ballet_ray.stages.sketches import approx_quantiles

    scored = score_text_logreg(ds, model, output="__p", text_col=text_col)
    return float(approx_quantiles(scored, "__p", [1.0 - keep_rate], k=k)[0])


def quality_filter_by_model(ds, model: dict, *, threshold: float = 0.5,
                            text_col: str | None = None):
    """Keep documents the fitted classifier scores >= ``threshold`` —
    the model-based quality filter as a streaming row filter (scores are
    computed in-pass and not materialized in the output)."""
    text_col = text_col or model["text_col"]
    beta = np.asarray(model["beta"])
    buckets, ngmax, method = model["buckets"], model["ngmax"], model["method"]

    def flt(t: pa.Table) -> pa.Table:
        X = _text_features(t, text_col=text_col, buckets=buckets,
                           ngmax=ngmax, method=method)
        p = _sigmoid(X @ beta[:-1] + beta[-1])
        return t.filter(pa.array(p >= threshold))

    return ds.map_batches(flt, batch_format="pyarrow")


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
