"""Temperature-based mixture sampling (mT5/XLM-R recipe)."""

import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from ballet_ray.stages.sampling import temperature_rates, temperature_sample


def _df(sizes: dict, seed=0):
    rows = []
    i = 0
    for g, n in sizes.items():
        for _ in range(n):
            rows.append((g, f"k{i:06d}", 10))
            i += 1
    return pd.DataFrame(rows, columns=["source", "key", "n_tok"])


def test_rates_match_closed_form(ray_session):
    sizes = {"web": 8000, "books": 1500, "code": 500}
    df = _df(sizes)
    alpha = 0.5
    rates = temperature_rates(rd.from_pandas(df).repartition(5),
                              group_col="source", alpha=alpha)
    n = np.array([sizes[g] for g in rates])
    p = n / n.sum()
    q = p**alpha / (p**alpha).sum()
    t = np.min(n / q)
    expect = np.minimum(1.0, t * q / n)
    got = np.array([rates[g] for g in rates])
    np.testing.assert_allclose(got, expect, rtol=1e-12)
    # the tightest (most-upweighted) group keeps everything
    assert max(rates.values()) == pytest.approx(1.0)
    assert rates["code"] == pytest.approx(1.0)  # smallest group anchors


def test_alpha_one_is_proportional(ray_session):
    df = _df({"a": 4000, "b": 1000})
    rates = temperature_rates(rd.from_pandas(df).repartition(3),
                              group_col="source", alpha=1.0)
    # natural proportions: every group keeps the same rate (=1 at the anchor)
    assert rates["a"] == pytest.approx(rates["b"], rel=1e-12)


def test_target_total_and_expected_mixture(ray_session):
    sizes = {"web": 9000, "wiki": 1000}
    df = _df(sizes)
    alpha = 0.3
    rates = temperature_rates(rd.from_pandas(df).repartition(4),
                              group_col="source", alpha=alpha, target_total=2000)
    exp_total = sum(rates[g] * sizes[g] for g in sizes)
    assert exp_total == pytest.approx(2000, rel=1e-9)
    kept = temperature_sample(rd.from_pandas(df).repartition(4),
                              group_col="source", key_col="key",
                              alpha=alpha, target_total=2000).to_pandas()
    # Bernoulli keep: within 5 sigma of expectation per group
    for g in sizes:
        got = int((kept["source"] == g).sum())
        mu = rates[g] * sizes[g]
        sd = np.sqrt(sizes[g] * rates[g] * (1 - rates[g])) + 1e-9
        assert abs(got - mu) < 5 * sd + 1, (g, got, mu)


def test_token_weighted_rates(ray_session):
    df = _df({"a": 1000, "b": 1000})
    # group b has 10x the tokens per row
    df.loc[df["source"] == "b", "n_tok"] = 100
    rates = temperature_rates(rd.from_pandas(df).repartition(3),
                              group_col="source", alpha=0.5, count_col="n_tok")
    n = np.array([10_000.0, 100_000.0])  # token totals a, b
    p = n / n.sum()
    q = p**0.5 / (p**0.5).sum()
    t = np.min(n / q)
    expect = np.minimum(1.0, t * q / n)
    np.testing.assert_allclose([rates["a"], rates["b"]], expect, rtol=1e-12)


def test_empty_input(ray_session):
    df = _df({"a": 5}).head(0)
    assert temperature_rates(rd.from_pandas(df), group_col="source") == {}
