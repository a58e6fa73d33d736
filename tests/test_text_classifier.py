"""fastText-shape hashed n-gram quality classifier."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data as rd

from ballet_ray.stages.classifier import (
    _sigmoid,
    _text_features,
    fit_text_logreg,
    newton_step_partial,
    quality_filter_by_model,
    score_text_logreg,
)

GOOD = ["insight", "careful", "analysis", "derivation", "theorem", "proof",
        "study", "result", "method", "evidence"]
SPAM = ["buy", "click", "free", "winner", "casino", "pills", "offer",
        "cheap", "deal", "now"]


def _corpus(n, seed=0):
    rng = np.random.default_rng(seed)
    rows = []
    for i in range(n):
        label = i % 2
        pool = GOOD if label else SPAM
        words = rng.choice(pool, size=rng.integers(5, 15))
        rows.append((f"d{i:04d}", " ".join(words), label))
    return pd.DataFrame(rows, columns=["doc_id", "text", "label"])


def _local_fit(df, *, buckets, ngmax, method, n_iter, l2):
    t = pa.Table.from_pandas(df, preserve_index=False)
    X = _text_features(t, text_col="text", buckets=buckets, ngmax=ngmax, method=method)
    y = df["label"].to_numpy(dtype=float)
    d1 = buckets + 1
    beta = np.zeros(d1)
    for _ in range(n_iter):
        v = newton_step_partial(X, y, beta)
        g = v[:d1] - l2 * np.concatenate([beta[:-1], [0.0]])
        H = v[d1:].reshape(d1, d1) + l2 * np.diag(np.concatenate([np.ones(d1 - 1), [0.0]]))
        beta = beta + np.linalg.solve(H, g)
    return beta


@pytest.mark.parametrize("method", ["siphash", "md5"])
def test_distributed_fit_matches_local(ray_session, method):
    df = _corpus(300)
    kw = dict(buckets=64, ngmax=2, n_iter=5, l2=1e-3)
    model = fit_text_logreg(rd.from_pandas(df).repartition(6),
                            label_col="label", method=method, **kw)
    beta_local = _local_fit(df, method=method, **kw)
    np.testing.assert_allclose(model["beta"], beta_local, rtol=1e-8, atol=1e-10)


def test_classifier_separates_and_filters(ray_session):
    train = _corpus(400, seed=1)
    test = _corpus(200, seed=2)
    model = fit_text_logreg(rd.from_pandas(train).repartition(4), label_col="label")
    scored = score_text_logreg(rd.from_pandas(test).repartition(3), model).to_pandas()
    acc = ((scored["prob"] >= 0.5).astype(int) == scored["label"]).mean()
    assert acc >= 0.97, acc
    kept = quality_filter_by_model(rd.from_pandas(test).repartition(3), model,
                                   threshold=0.5).to_pandas()
    assert set(kept["doc_id"]) == set(scored.loc[scored["prob"] >= 0.5, "doc_id"])
    assert kept["label"].mean() > 0.9


def test_scoring_partition_invariant(ray_session):
    df = _corpus(150, seed=3)
    model = fit_text_logreg(rd.from_pandas(df).repartition(2), label_col="label",
                            buckets=32, n_iter=4)
    a = score_text_logreg(rd.from_pandas(df).repartition(1), model).to_pandas()
    b = score_text_logreg(rd.from_pandas(df).repartition(9), model).to_pandas()
    a = a.sort_values("doc_id").reset_index(drop=True)
    b = b.sort_values("doc_id").reset_index(drop=True)
    np.testing.assert_allclose(a["prob"], b["prob"], rtol=1e-12)


def test_features_normalized_and_empty_safe():
    t = pa.table({"text": pa.array(["hello world hello", ""])})
    X = _text_features(t, text_col="text", buckets=16, ngmax=2, method="siphash")
    assert X.shape == (2, 16)
    # 3 unigrams + 2 bigrams = 5 grams, normalized to sum 1
    assert X[0].sum() == pytest.approx(1.0)
    # empty doc: zero vector (scores through sigmoid(bias))
    assert X[1].sum() == pytest.approx(1.0) or X[1].sum() == pytest.approx(0.0)


def test_calibrate_threshold(ray_session):
    from ballet_ray.stages.classifier import calibrate_threshold

    df = _corpus(500, seed=6)
    model = fit_text_logreg(rd.from_pandas(df).repartition(4), label_col="label",
                            buckets=64, n_iter=5)
    for rate in (0.2, 0.5):
        thr = calibrate_threshold(rd.from_pandas(df).repartition(3), model,
                                  keep_rate=rate)
        kept = quality_filter_by_model(rd.from_pandas(df).repartition(3), model,
                                       threshold=thr).count()
        # discrete quantile: kept fraction within one sketch step of target
        assert abs(kept / 500 - rate) < 0.05, (rate, kept)
    import pytest as _pt

    with _pt.raises(ValueError):
        calibrate_threshold(rd.from_pandas(df), model, keep_rate=0.0)


def test_model_persists(ray_session, tmp_path):
    from ballet_ray.state.persist import load_artifact, save_artifact

    df = _corpus(100, seed=4)
    model = fit_text_logreg(rd.from_pandas(df).repartition(2), label_col="label",
                            buckets=32, n_iter=3)
    p = str(tmp_path / "clf.pkl")
    save_artifact(model, p)
    loaded = load_artifact(p)
    np.testing.assert_array_equal(loaded["beta"], model["beta"])
    out = score_text_logreg(rd.from_pandas(df.head(10)), loaded).to_pandas()
    assert len(out) == 10
