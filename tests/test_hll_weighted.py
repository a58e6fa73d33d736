"""HyperLogLog distinct sketch + A-ES weighted sampling."""

import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from ballet_ray.stages.sampling import _priority_u, weighted_sample
from ballet_ray.stages.sketches import (
    _hll_estimate,
    _hll_registers,
    approx_distinct_hll,
    approx_distinct_per_group_hll,
)

# ---------------------------------------------------------------- HLL core


def test_hll_registers_match_reference_clz():
    """The vectorized float-exponent CLZ equals the exact bit-scan rank,
    including the half-ulp rounding edge (values just below a power of 2)."""
    p = 12
    rng = np.random.default_rng(7)
    vals = rng.integers(0, 2**63, size=5000)
    # plant the rounding edge: rest values of the form 2^e - small
    edge = np.array([2**64 - 1, 2**64 - 2**10, 2**53 - 1, 2**53, 1, 0],
                    dtype=np.uint64)

    def ref_rank(rest, p):
        if rest == 0:
            return 64 - p + 1
        lz = 64 - int(rest).bit_length()
        return min(lz + 1, 64 - p + 1)

    from ballet_ray.functions.partition import stable_hash_array

    h = stable_hash_array(vals)
    regs = _hll_registers(vals, p)
    expect = np.zeros(1 << p, np.uint8)
    for hv in h:
        idx = int(hv >> np.uint64(64 - p))
        rest = int((int(hv) << p) & (2**64 - 1))
        expect[idx] = max(expect[idx], ref_rank(rest, p))
    assert np.array_equal(regs, expect)

    # direct check of the CLZ correction on planted edge bit patterns
    for rest in edge:
        nz = rest != 0
        if nz:
            f = np.array([rest], np.uint64).astype(np.float64)
            e = int((f.view(np.uint64) >> np.uint64(52))[0]) - 1023
            e = min(e, 63)
            if rest < np.uint64(1) << np.uint64(e):
                e -= 1
            assert e == int(rest).bit_length() - 1


def test_hll_error_bound():
    p = 12
    for true_n in (100, 5_000, 200_000):
        vals = np.arange(true_n)
        est = _hll_estimate(_hll_registers(vals, p), p)
        assert abs(est - true_n) / true_n < 0.05, (true_n, est)


def test_hll_merge_equals_single_pass():
    p = 10
    a = np.arange(0, 30_000)
    b = np.arange(15_000, 50_000)  # overlapping
    ra, rb = _hll_registers(a, p), _hll_registers(b, p)
    merged = np.maximum(ra, rb)
    single = _hll_registers(np.concatenate([a, b]), p)
    assert np.array_equal(merged, single)


def test_hll_distributed(ray_session):
    n = 40_000
    df = pd.DataFrame({"k": np.arange(n) % 9_000})
    ds = rd.from_pandas(df).repartition(8)
    est = approx_distinct_hll(ds, "k", p=12)
    assert abs(est - 9_000) / 9_000 < 0.05
    # distributed == local single-pass estimate
    local = _hll_estimate(_hll_registers(df["k"].to_numpy(), 12), 12)
    assert est == pytest.approx(local, rel=1e-12)


def test_hll_per_group(ray_session):
    df = pd.DataFrame({
        "g": np.repeat(["a", "b"], 20_000),
        "k": np.concatenate([np.arange(20_000) % 500, np.arange(20_000) % 4_000]),
    })
    out = approx_distinct_per_group_hll(
        rd.from_pandas(df).repartition(6), "k", "g", p=11
    ).set_index("g")["approx_nd"]
    assert abs(out["a"] - 500) / 500 < 0.07
    assert abs(out["b"] - 4_000) / 4_000 < 0.07


# ------------------------------------------------------- weighted sampling


def _brute_aes(df, key_col, weight_col, n, salt, method):
    u = _priority_u(df[key_col].to_numpy(), salt, method)
    w = df[weight_col].to_numpy().astype(float)
    race = -np.log(np.maximum(u, 2.0**-64))
    with np.errstate(divide="ignore", invalid="ignore"):
        race = race / w
    race[~(w > 0)] = np.inf
    d = df.assign(__race=race)
    d = d[np.isfinite(d["__race"])]
    return set(d.sort_values(["__race", key_col]).head(n)[key_col])


def test_weighted_sample_matches_brute(ray_session):
    rng = np.random.default_rng(3)
    df = pd.DataFrame({
        "k": [f"doc{i}" for i in range(2_000)],
        "w": rng.gamma(2.0, 1.0, size=2_000),
    })
    for method in ("siphash", "md5"):
        got = weighted_sample(
            rd.from_pandas(df).repartition(7), key_col="k", weight_col="w",
            n=50, salt="s1", method=method,
        ).to_pandas()
        assert set(got["k"]) == _brute_aes(df, "k", "w", 50, "s1", method)
        assert len(got) == 50


def test_weighted_sample_partition_invariance(ray_session):
    rng = np.random.default_rng(5)
    df = pd.DataFrame({"k": np.arange(3_000), "w": rng.uniform(0.1, 5.0, 3_000)})
    a = weighted_sample(rd.from_pandas(df).repartition(2), key_col="k",
                        weight_col="w", n=40).to_pandas()
    b = weighted_sample(rd.from_pandas(df).repartition(11), key_col="k",
                        weight_col="w", n=40).to_pandas()
    assert set(a["k"]) == set(b["k"])


def test_weighted_sample_respects_weights(ray_session):
    # two blocks of keys, heavy 10x weight -> heavy keys dominate the draw
    df = pd.DataFrame({
        "k": np.arange(4_000),
        "w": np.where(np.arange(4_000) < 2_000, 10.0, 1.0),
    })
    hits_heavy = 0
    for salt in ("a", "b", "c"):
        got = weighted_sample(rd.from_pandas(df).repartition(4), key_col="k",
                              weight_col="w", n=100, salt=salt).to_pandas()
        hits_heavy += int((got["k"] < 2_000).sum())
    # expected heavy share ~10/11 ≈ 0.909 of 300; binomial 5σ ≈ 25
    assert hits_heavy > 240


def test_weighted_sample_groups_and_bad_weights(ray_session):
    df = pd.DataFrame({
        "g": np.repeat(["x", "y"], 500),
        "k": np.arange(1_000),
        "w": np.concatenate([np.full(500, 1.0), np.full(500, 2.0)]),
    })
    df.loc[df.index[:10], "w"] = 0.0        # never selected
    df.loc[df.index[10:20], "w"] = -1.0     # never selected
    df.loc[df.index[20:30], "w"] = np.nan   # never selected
    out = weighted_sample(rd.from_pandas(df).repartition(5), key_col="k",
                          weight_col="w", n=30, group_col="g").to_pandas()
    assert (out.groupby("g").size() == 30).all()
    assert not set(out["k"]) & set(range(30))
    assert list(out.columns) == ["g", "k", "w"]
