"""Distributed PCA (sklearn.decomposition.PCA semantics, exact).

The reference re-exports sklearn estimators as transformer steps
(reference ballet/eng/external/sklearn.py); random projections live in
encoders_ext.py — PCA is the data-dependent sibling. The fit is ONE
streaming pass: each batch emits (count, feature sums, X^T X gram) as a
single float64 blob; blobs tree-reduce worker-side (per-block combine,
then one tiny grouped merge — the same shape as the KMV/KLL sketches in
sketches.py), so the driver receives exactly one (2 + d + d²)-value
vector regardless of corpus size. Eigendecomposition of the d×d
covariance happens on the driver (d is feature-count, not row-count);
transforms are a dense GEMM per batch.

Determinism: eigenvectors are sign-normalized so the largest-|entry|
coordinate is positive (sklearn's svd_flip analog), making results
reproducible across runs, partitionings and merge orders.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from ballet_ray.stages.encoders import FittedTransform, _col_f64
from ballet_ray.stages.similarity import _emb_matrix


def _moments_blob(m: np.ndarray) -> bytes:
    """(n, d) matrix → [n, sum_d, gram_d²] float64 blob (NaN rows dropped)."""
    ok = ~np.isnan(m).any(axis=1)
    m = m[ok]
    d = m.shape[1]
    out = np.empty(1 + d + d * d, np.float64)
    out[0] = len(m)
    out[1 : 1 + d] = m.sum(axis=0)
    out[1 + d :] = (m.T @ m).ravel()
    return out.tobytes()


def vector_sum_reduce(ds, batch_to_vector) -> np.ndarray:
    """Σ over batches of ``batch_to_vector(table) -> float64 vector``,
    tree-reduced worker-side (per-block combine, one tiny final group) —
    the driver receives exactly one vector. The generic partial-reduce
    every moment/gram/gradient fit in this package shares."""

    def partial(t: pa.Table) -> pa.Table:
        v = np.asarray(batch_to_vector(t), np.float64)
        return pa.table({"g": pa.array([0], pa.int8()), "blob": pa.array([v.tobytes()])})

    def merge_blobs(blobs) -> bytes:
        tot = None
        for b in blobs:
            v = np.frombuffer(b, np.float64)
            tot = v.copy() if tot is None else tot + v
        return tot.tobytes()

    def combine(t: pa.Table) -> pa.Table:
        return pa.table({"g": pa.array([0], pa.int8()), "blob": pa.array([merge_blobs(t.column("blob").to_pylist())])})

    def final(g: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"blob": [merge_blobs(g["blob"])]})

    parts = ds.map_batches(partial, batch_format="pyarrow").map_batches(combine, batch_format="pyarrow")
    out = parts.groupby("g").map_groups(final, batch_format="pandas").take(1)
    return np.frombuffer(out[0]["blob"], np.float64).copy()


def moments_reduce(ds, batch_to_matrix) -> tuple[float, np.ndarray, np.ndarray]:
    """Tree-reduced (n, sum, gram) over ``batch_to_matrix(table) -> (n,d)``."""
    v = vector_sum_reduce(ds, lambda t: np.frombuffer(_moments_blob(batch_to_matrix(t)), np.float64))
    d = int(round((-1 + np.sqrt(1 + 4 * (len(v) - 1))) / 2))  # 1 + d + d² = len
    return float(v[0]), v[1 : 1 + d].copy(), v[1 + d :].reshape(d, d).copy()


def pca_from_moments(n: float, s: np.ndarray, gram: np.ndarray, n_components: int) -> dict:
    d = len(s)
    if n < 2:
        raise ValueError("PCA needs at least 2 rows")
    mean = s / n
    cov = (gram - n * np.outer(mean, mean)) / (n - 1)
    cov = (cov + cov.T) / 2.0
    w, v = np.linalg.eigh(cov)  # ascending
    order = np.argsort(w)[::-1][: min(n_components, d)]
    comps = v[:, order].T  # (k, d)
    # svd_flip-style deterministic signs
    flips = np.sign(comps[np.arange(len(comps)), np.abs(comps).argmax(axis=1)])
    flips[flips == 0] = 1.0
    comps = comps * flips[:, None]
    ev = np.maximum(w[order], 0.0)
    tot = np.maximum(w, 0.0).sum()
    return {
        "mean": mean,
        "components": comps,
        "explained_variance": ev,
        "explained_variance_ratio": ev / tot if tot > 0 else np.zeros_like(ev),
        "n_samples": n,
    }


class PCA(FittedTransform):
    """Feature-frame PCA over scalar columns (column order = input order).

    fit = one moments_reduce pass; transform emits ``pc0..pc{k-1}``.
    """

    def __init__(self, n_components: int = 2):
        self.n_components = n_components
        self.fitted_: dict | None = None

    def agg_requests(self, cols):
        return []

    def fit(self, ds, cols):
        def to_m(t: pa.Table) -> np.ndarray:
            return np.column_stack([_col_f64(t, c) for c in cols])

        n, s, g = moments_reduce(ds.select_columns(list(cols)), to_m)
        self.fitted_ = pca_from_moments(n, s, g, self.n_components)

    def fit_table(self, table: pa.Table, cols: list[str]) -> None:
        m = np.column_stack([_col_f64(table, c) for c in cols])
        v = np.frombuffer(_moments_blob(m), np.float64)
        d = len(cols)
        self.fitted_ = pca_from_moments(v[0], v[1 : 1 + d], v[1 + d :].reshape(d, d), self.n_components)

    def transform_table(self, table: pa.Table, cols: list[str]) -> pa.Table:
        self._check_fitted()
        m = np.column_stack([_col_f64(table, c) for c in cols])
        proj = (m - self.fitted_["mean"]) @ self.fitted_["components"].T
        return pa.table({f"pc{i}": pa.array(proj[:, i]) for i in range(proj.shape[1])})

    def output_names(self, cols):
        k = min(self.n_components, len(cols))
        return [f"pc{i}" for i in range(k)]


def pca_fit_embeddings(ds, *, embedding_col: str = "embedding", n_components: int = 8) -> dict:
    """PCA model over a list<float> column (one streaming moments pass)."""

    def to_m(t: pa.Table) -> np.ndarray:
        return _emb_matrix(t, embedding_col, dtype=np.float64)

    n, s, g = moments_reduce(ds.select_columns([embedding_col]), to_m)
    return pca_from_moments(n, s, g, n_components)


def pca_transform_embeddings(ds, model: dict, *, embedding_col: str = "embedding", id_col: str = "vec_id"):
    """Project the list column onto the fitted components → pc0..pc{k-1}."""
    mean, comps = model["mean"], model["components"]

    def project(t: pa.Table) -> pa.Table:
        m = _emb_matrix(t, embedding_col, dtype=np.float64)
        proj = (m - mean) @ comps.T
        cols = {id_col: t.column(id_col)}
        for i in range(proj.shape[1]):
            cols[f"pc{i}"] = pa.array(proj[:, i])
        return pa.table(cols)

    return ds.map_batches(project, batch_format="pyarrow")


def correlation_matrix(ds, cols: list[str], *, round_to: int | None = None):
    """Pairwise Pearson correlations of scalar columns from the SAME single
    moments pass PCA uses (one tree-reduced (n, sums, gram) vector — the
    driver never sees rows). Returns one row per unordered pair (col_a <=
    col_b alphabetical order of the input list), DuckDB ``corr()``
    (sample, ddof=1) semantics. Rows with NaN in any column are dropped
    (listwise deletion)."""

    def to_m(t: pa.Table) -> np.ndarray:
        return np.column_stack([_col_f64(t, c) for c in cols])

    n, s, gram = moments_reduce(ds.select_columns(list(cols)), to_m)
    mean = s / n
    cov = (gram - n * np.outer(mean, mean)) / (n - 1)
    sd = np.sqrt(np.diag(cov))
    denom = np.outer(sd, sd)
    with np.errstate(invalid="ignore", divide="ignore"):
        corr = np.where(denom > 0, cov / denom, np.nan)
    rows_a, rows_b, vals = [], [], []
    for i in range(len(cols)):
        for j in range(i, len(cols)):
            rows_a.append(cols[i])
            rows_b.append(cols[j])
            v = corr[i, j]
            vals.append(round(v, round_to) if round_to is not None and np.isfinite(v) else v)
    import ray.data as rd

    return rd.from_arrow(
        pa.table({"col_a": rows_a, "col_b": rows_b, "corr": pa.array(vals, pa.float64())})
    )


def grouped_pca_fit(ds, *, group_col: str, embedding_col: str = "embedding",
                    n_components: int = 8) -> dict:
    """Per-group PCA (per-language/per-source embedding whitening): ONE
    pass emits a (1+d+d²) moments blob per (batch, group); a tiny
    group-keyed merge (one blob row per (batch, group) enters the
    shuffle) leaves the driver exactly one moments row per group (never
    vectors), which it eigendecomposes.
    Returns {group(str): model} with the same fields as
    :func:`pca_from_moments`. Groups with <2 rows are skipped."""

    def partials(t: pa.Table) -> pa.Table:
        g = t.column(group_col).to_numpy(zero_copy_only=False)
        m = _emb_matrix(t, embedding_col, dtype=np.float64)
        if not len(m):
            return pa.table({"g": pa.array([], pa.string()),
                             "blob": pa.array([], pa.binary())})
        order = np.argsort(g, kind="stable")
        gs = g[order]
        starts = np.flatnonzero(np.concatenate(([True], gs[1:] != gs[:-1])))
        ends = np.append(starts[1:], len(gs))
        names, blobs = [], []
        for a, b in zip(starts, ends):
            names.append(str(gs[a]))
            blobs.append(_moments_blob(m[order[a:b]]))
        return pa.table({"g": pa.array(names), "blob": pa.array(blobs, pa.binary())})

    def merge_group(df):
        import pandas as pd  # noqa: F811

        tot = None
        for blob in df["blob"]:
            v = np.frombuffer(blob, np.float64)
            tot = v.copy() if tot is None else tot + v
        return pd.DataFrame({"g": [df["g"].iloc[0]], "blob": [tot.tobytes()]})

    # blobs need a vector-sum merge, which grouped_reduce's pandas agg can't
    # express — groupby().map_groups merges directly (one blob row per
    # (batch, group) enters the shuffle, so the exchange is tiny)
    parts = ds.select_columns([group_col, embedding_col]).map_batches(
        partials, batch_format="pyarrow"
    )
    merged = parts.groupby("g").map_groups(merge_group, batch_format="pandas").to_pandas()

    models = {}
    for _, r in merged.iterrows():
        v = np.frombuffer(r["blob"], np.float64)
        d = int(round((-1 + np.sqrt(1 + 4 * (len(v) - 1))) / 2))
        n, s, gram = float(v[0]), v[1: 1 + d], v[1 + d:].reshape(d, d)
        if n >= 2:
            models[str(r["g"])] = pca_from_moments(n, s.copy(), gram.copy(), n_components)
    return models


def grouped_pca_transform(ds, models: dict, *, group_col: str,
                          embedding_col: str = "embedding", id_col: str = "vec_id"):
    """Project each row through ITS group's fitted components (rows of
    groups without a model are dropped). One shuffle-free pass; the model
    dict broadcasts once via ``ray.put``."""
    import ray as _ray

    mref = _ray.put(models)

    def project(t: pa.Table) -> pa.Table:
        mm = _ray.get(mref)
        g = t.column(group_col).to_numpy(zero_copy_only=False)
        m = _emb_matrix(t, embedding_col, dtype=np.float64)
        k = max((len(v["components"]) for v in mm.values()), default=0)
        cols = {id_col: [], group_col: []}
        proj_rows = []
        keep_idx = []
        for gi in np.unique(g.astype(str)):
            model = mm.get(gi)
            if model is None:
                continue
            sel = np.flatnonzero(g.astype(str) == gi)
            p = (m[sel] - model["mean"]) @ model["components"].T
            if p.shape[1] < k:  # group fit with fewer components (tiny group)
                p = np.pad(p, ((0, 0), (0, k - p.shape[1])), constant_values=np.nan)
            proj_rows.append(p)
            keep_idx.append(sel)
        if not keep_idx:
            out = {id_col: t.column(id_col).slice(0, 0),
                   group_col: t.column(group_col).slice(0, 0)}
            for i in range(k):
                out[f"pc{i}"] = pa.array([], pa.float64())
            return pa.table(out)
        idx = np.concatenate(keep_idx)
        proj = np.vstack(proj_rows)
        out = {id_col: t.column(id_col).take(pa.array(idx)),
               group_col: t.column(group_col).take(pa.array(idx))}
        for i in range(proj.shape[1]):
            out[f"pc{i}"] = pa.array(proj[:, i])
        return pa.table(out)

    return ds.map_batches(project, batch_format="pyarrow")
