"""DistributedLogReg: distributed Newton == in-memory Newton exactly;
recovers a known separating direction; pipeline integration."""

import numpy as np
import pyarrow as pa
import ray.data as rd

from ballet_ray.feature import Feature
from ballet_ray.pipeline import FeatureEngineeringPipeline
from ballet_ray.stages.classifier import DistributedLogReg, _sigmoid, fit_logreg


def _data(n=4000, seed=0):
    rng = np.random.default_rng(seed)
    X = rng.normal(size=(n, 3))
    true_w = np.array([1.5, -2.0, 0.5])
    p = 1 / (1 + np.exp(-(X @ true_w + 0.3)))
    y = (rng.random(n) < p).astype(np.float64)
    return X, y, true_w


def test_distributed_equals_local_newton():
    X, y, _ = _data()
    cols = ["a", "b", "c"]
    t = pa.table({**{c: X[:, i] for i, c in enumerate(cols)}, "y": y})
    ds = rd.from_arrow(t).repartition(6)

    beta_dist = fit_logreg(ds, cols, "y", n_iter=6)
    local = DistributedLogReg("y", n_iter=6)
    local.fit_table(t, cols)
    np.testing.assert_allclose(beta_dist, local.fitted_["beta"], rtol=1e-10, atol=1e-10)


def test_recovers_weights_and_scores():
    X, y, true_w = _data(n=20000, seed=1)
    cols = ["a", "b", "c"]
    ds = rd.from_arrow(pa.table({**{c: X[:, i] for i, c in enumerate(cols)}, "y": y})).repartition(8)
    beta = fit_logreg(ds, cols, "y", n_iter=8)
    np.testing.assert_allclose(beta[:-1], true_w, atol=0.15)
    assert abs(beta[-1] - 0.3) < 0.15
    # predictions well-calibrated on average
    p = _sigmoid(X @ beta[:-1] + beta[-1])
    assert abs(p.mean() - y.mean()) < 0.01


def test_logreg_in_pipeline_with_nan_rows():
    X, y, _ = _data(n=3000, seed=2)
    Xn = X.copy()
    Xn[::11, 0] = np.nan  # fit must skip, transform still scores (nan -> nan)
    cols = ["a", "b", "c"]
    t = pa.table({**{c: Xn[:, i] for i, c in enumerate(cols)}, "y": y, "id": list(range(3000))})
    ds = rd.from_arrow(t).repartition(5)
    pipe = FeatureEngineeringPipeline([Feature(cols, DistributedLogReg("y", n_iter=5))])
    out = pipe.fit_transform(ds).to_pandas().sort_values("id")

    ok = ~np.isnan(Xn).any(axis=1)
    ref = DistributedLogReg("y", n_iter=5)
    ref.fit_table(pa.table({**{c: Xn[ok][:, i] for i, c in enumerate(cols)}, "y": y[ok]}), cols)
    beta = ref.fitted_["beta"]
    exp = _sigmoid(Xn @ beta[:-1] + beta[-1])
    got = out["prob"].to_numpy()
    np.testing.assert_allclose(got[ok], exp[ok], atol=1e-9)
    assert np.isnan(got[~ok]).all()
