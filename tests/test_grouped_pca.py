"""Per-group PCA (decomposition.grouped_pca_fit / grouped_pca_transform)."""

import numpy as np
import ray.data as rd

from ballet_ray.stages.decomposition import (
    grouped_pca_fit,
    grouped_pca_transform,
    pca_from_moments,
)


def _data(seed=2):
    rng = np.random.RandomState(seed)
    rows = []
    for g, (n, scale) in {"en": (80, 1.0), "de": (60, 3.0), "zh": (50, 0.5)}.items():
        m = rng.randn(n, 6) * scale + rng.randn(6) * 2
        for v in m:
            rows.append({"vec_id": len(rows), "lang": g, "embedding": list(map(float, v))})
    return rows


def _sk_ref(rows, g, k):
    m = np.array([r["embedding"] for r in rows if r["lang"] == g])
    n, d = m.shape
    s, gram = m.sum(axis=0), m.T @ m
    return pca_from_moments(float(n), s, gram, k), m


def test_fit_matches_single_group_reference():
    rows = _data()
    models = grouped_pca_fit(
        rd.from_items(rows).repartition(5), group_col="lang", n_components=3
    )
    assert set(models) == {"en", "de", "zh"}
    for g in ("en", "de", "zh"):
        ref, _ = _sk_ref(rows, g, 3)
        np.testing.assert_allclose(models[g]["mean"], ref["mean"], atol=1e-9)
        np.testing.assert_allclose(models[g]["components"], ref["components"], atol=1e-9)
        np.testing.assert_allclose(
            models[g]["explained_variance"], ref["explained_variance"], atol=1e-9
        )


def test_transform_projects_per_group():
    rows = _data()
    ds = rd.from_items(rows).repartition(4)
    models = grouped_pca_fit(ds, group_col="lang", n_components=2)
    out = grouped_pca_transform(ds, models, group_col="lang", id_col="vec_id"
                                ).to_pandas().set_index("vec_id").sort_index()
    assert len(out) == len(rows)
    for g in ("en", "de"):
        ref, m = _sk_ref(rows, g, 2)
        ids = [r["vec_id"] for r in rows if r["lang"] == g]
        exp = (m - ref["mean"]) @ ref["components"].T
        got = out.loc[ids, ["pc0", "pc1"]].to_numpy()
        np.testing.assert_allclose(got, exp, atol=1e-9)


def test_unmodeled_group_dropped():
    rows = _data()
    models = grouped_pca_fit(rd.from_items(rows), group_col="lang", n_components=2)
    del models["zh"]
    out = grouped_pca_transform(rd.from_items(rows).repartition(3), models,
                                group_col="lang", id_col="vec_id").to_pandas()
    assert set(out["lang"]) == {"en", "de"}
