"""Distributed PCA vs exact numpy reference (multi-block, NaN rows, sign
determinism, pipeline integration, embeddings path)."""

import numpy as np
import pyarrow as pa
import ray.data as rd

from ballet_ray.feature import Feature
from ballet_ray.pipeline import FeatureEngineeringPipeline
from ballet_ray.stages.decomposition import PCA, pca_fit_embeddings, pca_from_moments, pca_transform_embeddings


def _ref_pca(X, k):
    mean = X.mean(axis=0)
    cov = np.cov(X, rowvar=False, ddof=1)
    w, v = np.linalg.eigh(cov)
    order = np.argsort(w)[::-1][:k]
    comps = v[:, order].T
    flips = np.sign(comps[np.arange(len(comps)), np.abs(comps).argmax(axis=1)])
    comps = comps * flips[:, None]
    return mean, comps, w[order]


def test_pca_matches_numpy_multiblock():
    rng = np.random.default_rng(2)
    X = rng.normal(size=(3000, 5)) @ rng.normal(size=(5, 5)) + rng.normal(size=5)
    cols = [f"x{i}" for i in range(5)]
    t = pa.table({c: X[:, i] for i, c in enumerate(cols)})
    ds = rd.from_arrow(t).repartition(7)

    p = PCA(n_components=3)
    p.fit(ds, cols)
    mean, comps, ev = _ref_pca(X, 3)
    np.testing.assert_allclose(p.fitted_["mean"], mean, atol=1e-9)
    np.testing.assert_allclose(p.fitted_["components"], comps, atol=1e-8)
    np.testing.assert_allclose(p.fitted_["explained_variance"], ev, rtol=1e-9)

    out = p.transform_table(t, cols)
    np.testing.assert_allclose(
        np.column_stack([out.column(f"pc{i}").to_numpy() for i in range(3)]),
        (X - mean) @ comps.T,
        atol=1e-8,
    )


def test_pca_nan_rows_excluded_from_fit():
    rng = np.random.default_rng(3)
    X = rng.normal(size=(500, 3))
    Xn = X.copy()
    Xn[::17, 1] = np.nan
    cols = ["a", "b", "c"]
    ds = rd.from_arrow(pa.table({c: Xn[:, i] for i, c in enumerate(cols)})).repartition(3)
    p = PCA(2)
    p.fit(ds, cols)
    mean, comps, _ = _ref_pca(X[~np.isnan(Xn).any(axis=1)], 2)
    np.testing.assert_allclose(p.fitted_["mean"], mean, atol=1e-9)
    np.testing.assert_allclose(p.fitted_["components"], comps, atol=1e-8)


def test_pca_in_pipeline():
    rng = np.random.default_rng(4)
    X = rng.normal(size=(800, 4))
    cols = ["a", "b", "c", "d"]
    t = pa.table({**{c: X[:, i] for i, c in enumerate(cols)}, "id": list(range(800))})
    ds = rd.from_arrow(t).repartition(4)
    pipe = FeatureEngineeringPipeline([Feature(cols, PCA(2))])
    out = pipe.fit_transform(ds).to_pandas().sort_values("id")
    mean, comps, _ = _ref_pca(X, 2)
    np.testing.assert_allclose(out[["pc0", "pc1"]].to_numpy(), (X - mean) @ comps.T, atol=1e-8)


def test_pca_embeddings_path():
    rng = np.random.default_rng(5)
    X = rng.normal(size=(400, 12)).astype(np.float32)
    t = pa.table(
        {"vec_id": list(range(400)), "embedding": pa.array([r.tolist() for r in X], pa.list_(pa.float32()))}
    )
    ds = rd.from_arrow(t).repartition(5)
    model = pca_fit_embeddings(ds, n_components=4)
    out = pca_transform_embeddings(ds, model).to_pandas().sort_values("vec_id")
    mean, comps, _ = _ref_pca(X.astype(np.float64), 4)
    np.testing.assert_allclose(model["components"], comps, atol=1e-6)
    got = out[[f"pc{i}" for i in range(4)]].to_numpy()
    np.testing.assert_allclose(got, (X - mean) @ comps.T, atol=1e-5)
    assert 0.999 <= model["explained_variance_ratio"].sum() <= 1.0 or model["explained_variance_ratio"].sum() < 1.0


def test_pca_from_moments_sign_determinism():
    rng = np.random.default_rng(6)
    X = rng.normal(size=(100, 3))
    n = len(X)
    m1 = pca_from_moments(n, X.sum(0), X.T @ X, 3)
    m2 = pca_from_moments(n, X.sum(0), X.T @ X, 3)
    np.testing.assert_array_equal(m1["components"], m2["components"])
    assert all(c[np.abs(c).argmax()] > 0 for c in m1["components"])


def test_correlation_matrix_matches_numpy():
    from ballet_ray.stages.decomposition import correlation_matrix

    rng = np.random.default_rng(7)
    X = rng.normal(size=(1000, 3))
    X[:, 1] = 0.7 * X[:, 0] + 0.3 * X[:, 1]
    cols = ["a", "b", "c"]
    ds = rd.from_arrow(pa.table({c: X[:, i] for i, c in enumerate(cols)})).repartition(4)
    got = correlation_matrix(ds, cols).to_pandas()
    ref = np.corrcoef(X, rowvar=False)
    for _, r in got.iterrows():
        i, j = cols.index(r.col_a), cols.index(r.col_b)
        np.testing.assert_allclose(r["corr"], ref[i, j], atol=1e-9)
    assert len(got) == 6
