"""Validation suite: entropy/MI sanity (reference test style,
tests/validation/test_entropy.py), accepters on the regression fixture
(tests/util.py:119-142: informative col accepted, noise rejected), and the
15 feature-API checks."""

import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from ballet_ray.feature import Feature
from ballet_ray.stages.core import IdentityTransform, Log1p
from ballet_ray.validation.accepters import (
    AlwaysAccepter,
    CompoundAccepter,
    GFSSFAccepter,
    GFSSFPruner,
    MutualInformationAccepter,
    NeverAccepter,
    NoOpPruner,
    RandomAccepter,
    VarianceThresholdAccepter,
)
from ballet_ray.validation.discover import discover
from ballet_ray.validation.entropy import (
    digamma,
    estimate_conditional_information,
    estimate_entropy,
    estimate_mutual_information,
)
from ballet_ray.validation.feature_checks import check_feature_api


# ---------------------------------------------------------------- entropy

def test_digamma_matches_known_values():
    # ψ(1) = -γ, ψ(2) = 1-γ, ψ(0.5) = -γ-2ln2
    gamma = 0.5772156649015329
    assert np.isclose(digamma(np.array([1.0]))[0], -gamma, atol=1e-8)
    assert np.isclose(digamma(np.array([2.0]))[0], 1 - gamma, atol=1e-8)
    assert np.isclose(digamma(np.array([0.5]))[0], -gamma - 2 * np.log(2), atol=1e-8)


def test_disc_entropy_uniform():
    # 8 equally likely symbols -> ln 8
    x = np.repeat(np.arange(8), 10)
    assert np.isclose(estimate_entropy(x), np.log(8), atol=1e-9)


def test_entropy_constant_is_zero():
    assert estimate_entropy(np.ones(100)) == 0.0


def test_mi_informative_vs_uninformative():
    # reference-style inequality (tests/validation/test_entropy.py:222-261):
    # I(x; x_noisy) > I(x; const) and copies have high MI
    rng = np.random.RandomState(1754)
    x = np.arange(1, 101, dtype=float) + rng.randn(100) * 1e-6
    y_copy = x.copy()
    y_const = np.ones(100)
    mi_copy = estimate_mutual_information(x, y_copy)
    mi_const = estimate_mutual_information(x, y_const)
    assert mi_copy > mi_const
    assert mi_const == pytest.approx(0.0, abs=1e-9)


def test_cmi_redundant_feature_is_low():
    rng = np.random.RandomState(7)
    x = rng.randn(300)
    y = x + 0.1 * rng.randn(300)
    # conditioning on a copy of x should wipe out most of I(x;y)
    cmi = estimate_conditional_information(x, y, x.copy())
    mi = estimate_mutual_information(x, y)
    assert cmi < mi


# ---------------------------------------------------------------- accepters

def _regression_fixture(n=500, seed=1754):
    """1 informative column + noise columns + continuous target
    (reference tests/util.py:119-142)."""
    rng = np.random.RandomState(seed)
    a0 = rng.randn(n)
    z = rng.randn(n, 3)
    y = 3 * a0 + 0.1 * rng.randn(n)
    return a0[:, None], z, y[:, None]


def test_variance_threshold_accepter():
    assert VarianceThresholdAccepter(0.05).judge(np.random.RandomState(0).randn(200, 2))
    assert not VarianceThresholdAccepter(0.05).judge(np.full((200, 1), 3.0))


def test_variance_threshold_distributed(sf_dir):
    ds = rd.read_parquet(f"{sf_dir}/orders.parquet", columns=["o_totalprice"])
    assert VarianceThresholdAccepter(0.05).judge(ds, cols=["o_totalprice"])


def test_mi_accepter_informative_vs_noise():
    a0, z, y = _regression_fixture()
    assert MutualInformationAccepter(0.05).judge(a0, y)
    # KSG has finite-sample bias (~0.3 nats at n=500 for independent data),
    # so the reject case uses a threshold above the bias floor
    assert not MutualInformationAccepter(1.0).judge(z[:, :1], y)
    # and the informative feature carries far more information than noise
    mi_info = estimate_mutual_information(a0, y)
    mi_noise = estimate_mutual_information(z[:, :1], y)
    assert mi_info > 5 * mi_noise


def test_mi_accepter_nan_policy():
    a0, _, y = _regression_fixture()
    y2 = y.copy()
    y2[0] = np.nan
    assert not MutualInformationAccepter(0.05, handle_nan_targets="fail").judge(a0, y2)
    assert MutualInformationAccepter(0.05, handle_nan_targets="ignore").judge(a0, y2)


def test_gfssf_accepts_informative_rejects_noise():
    # explicit lambdas above the KSG finite-sample bias floor (the default
    # H(y)/64 is semantics-parity with the reference but sits below the
    # estimator's ~0.1-nat bias at n=500)
    a0, z, y = _regression_fixture()
    acc = GFSSFAccepter(lmbda_1=0.25, lmbda_2=0.25)
    assert acc.judge(a0, {}, y)  # informative feature accepted
    accepted = {"a0": a0}
    assert not acc.judge(z[:, :1], accepted, y)  # pure noise rejected


def test_gfssf_pruner_prunes_redundant():
    a0, _, y = _regression_fixture()
    accepted = {"a0": a0, "a0_copy": a0.copy()}
    pruner = GFSSFPruner(lmbda_1=0.25, lmbda_2=0.25)
    redundant = pruner.prune(accepted, y)
    assert len(redundant) >= 1  # one of the two copies is redundant


def test_trivial_policies():
    assert AlwaysAccepter().judge()
    assert not NeverAccepter().judge()
    r1, r2 = RandomAccepter(p=0.5, seed=1), RandomAccepter(p=0.5, seed=1)
    assert r1.judge() == r2.judge()  # seeded determinism
    assert NoOpPruner().prune() == []
    a0, _, y = _regression_fixture()
    assert CompoundAccepter([AlwaysAccepter(), NeverAccepter()], agg="any").judge()
    assert not CompoundAccepter([AlwaysAccepter(), NeverAccepter()], agg="all").judge()


# ---------------------------------------------------------------- feature API

def test_feature_api_checks_pass_for_good_feature(corpus_dir):
    ds = rd.read_parquet(corpus_dir)
    results = check_feature_api(Feature("n_tok", Log1p()), ds)
    failed = [name for name, ok, _ in results if not ok]
    assert not failed, failed
    assert len(results) == 15


def test_feature_api_checks_catch_bad_feature(corpus_dir):
    ds = rd.read_parquet(corpus_dir)

    class RowDropper(IdentityTransform):
        def transform_table(self, table, cols):
            return table.select(cols).slice(0, max(0, table.num_rows - 1))

    results = dict(
        (name, ok) for name, ok, _ in check_feature_api(Feature("n_tok", RowDropper()), ds)
    )
    assert not results["HasCorrectOutputDimensionsCheck"]


def test_discover_summary(corpus_dir):
    ds = rd.read_parquet(corpus_dir)
    feats = [Feature("n_tok", Log1p(), name="log tokens"), Feature("n_tok", IdentityTransform(), name="raw")]
    df = discover(feats, ds, y_col="n_tok", sample_cap=500)
    assert len(df) == 2
    assert {"mean", "std", "min", "max", "nunique", "mutual_information"} <= set(df.columns)
    # identity feature carries maximal information about the target
    assert df.loc[df["name"] == "raw", "mutual_information"].iloc[0] >= df[
        "mutual_information"
    ].min()


# --------------------------------------------------------- KSG golden parity
# fixtures hand-verified in the reference test suite
# (tests/validation/test_entropy.py:23-112) — our estimator internals must
# reproduce the same epsilons and in-radius counts.


def test_ksg_epsilon_golden_diagonal():
    """Diagonal 5-point grid, k=3, chebyshev: epsilon = 2 × kth distance
    (reference test_compute_epsilon golden [6,4,4,4,6])."""
    from ballet_ray.validation.entropy import _compute_epsilon

    x = np.array([[0.5, 0.5], [1.5, 1.5], [2.5, 2.5], [3.5, 3.5], [4.5, 4.5]])
    eps = _compute_epsilon(x)
    assert np.allclose(eps, [6.0, 4.0, 4.0, 4.0, 6.0])


def test_ksg_radius_counts_golden():
    """Strictly-within-radius counts incl. self (reference test_compute_nx_i
    golden [2,5,2,2,1]); points ON the margin are excluded."""
    from ballet_ray.validation.entropy import _count_strictly_within

    x = np.array([[0, 0], [1, 0], [0, 1], [1, 1], [0.5, 0.5]], dtype=float)
    radius = np.array([0.7, 10, 1, 0.7, 0.1])
    nx = _count_strictly_within(x, radius)
    assert nx.tolist() == [2, 5, 2, 2, 1]


def test_empirical_probability_golden():
    from ballet_ray.validation.entropy import _disc_entropy

    # H of [1,1,2,3,2,1,1,2]: p = [1/2, 3/8, 1/8]
    x = np.array([1, 1, 2, 3, 2, 1, 1, 2])
    p = np.array([4 / 8, 3 / 8, 1 / 8])
    expected = float(-(p * np.log(p)).sum())
    assert np.isclose(_disc_entropy(x), expected)


def test_discreteness_heuristics():
    """Reference _is_column_disc cases (ballet/validation/entropy.py:65-99)."""
    from ballet_ray.validation.entropy import _is_column_disc

    assert _is_column_disc(np.arange(100))  # integral dtype
    assert _is_column_disc(np.arange(100).astype(float))  # near-integer floats
    rng = np.random.RandomState(0)
    cont = rng.randn(100) + 0.1  # continuous: unique, non-integer
    assert not _is_column_disc(cont)
    rep = np.concatenate([np.full(30, 0.5), rng.randn(10) + 7.77])  # heavy repeats
    assert _is_column_disc(rep)

def test_get_transformer_primitives():
    from ballet_ray.validation.accepters import NeverAccepter  # noqa: F401 — import check only
    from ballet_ray.stages.encoders import StandardScaler
    from ballet_ray.transformer import get_transformer_primitives

    assert get_transformer_primitives(None) == ["IdentityTransform"]
    assert get_transformer_primitives(StandardScaler()) == ["StandardScaler"]
    assert get_transformer_primitives([Log1p(), StandardScaler()]) == [
        "Log1p", "StandardScaler",
    ]
    def halve(col):
        return np.asarray(col) / 2
    assert get_transformer_primitives(halve) == ["halve"]
    nested = Feature("n_tok", Log1p(), output="lt")
    assert get_transformer_primitives(nested) == ["Log1p"]


def test_discover_filters_by_input_and_primitive(corpus_dir):
    ds = rd.read_parquet(corpus_dir)
    feats = [
        Feature("n_tok", Log1p(), name="log tokens"),
        Feature("n_tok", IdentityTransform(), name="raw"),
        Feature(lambda schema: ["n_tok"], IdentityTransform(), name="via callable"),
    ]
    by_input = discover(feats, ds, input="n_tok", sample_cap=200)
    # callable selectors never match an input filter (reference semantics)
    assert sorted(by_input["name"]) == ["log tokens", "raw"]
    by_prim = discover(feats, ds, primitive="Log1p", sample_cap=200)
    assert by_prim["name"].tolist() == ["log tokens"]
    assert by_prim["primitives"].iloc[0] == ["Log1p"]


def _sfds_regression_fixture(n_informative=1, n_uninformative=14, n=500, seed=1):
    """Reference fixture shape (reference tests/util.py:119-142): n columns
    of standard normals, y a linear function of the informative ones."""
    rng = np.random.RandomState(seed)
    X = rng.randn(n, n_informative + n_uninformative)
    coef = np.zeros(n_informative + n_uninformative)
    coef[:n_informative] = 40.0 + 60.0 * rng.rand(n_informative)
    y = X @ coef
    return X, y, coef


def test_sfds_selects_informative_only():
    from ballet_ray.validation.sfds import sfds

    X, y, coef = _sfds_regression_fixture()
    stream = [X[:, i : i + 1] for i in range(X.shape[1])]
    chosen = sfds(stream, y, l1=0.25, l2=0.25)
    assert 0 in chosen                      # the informative column survives
    assert all(coef[i] != 0 for i in chosen)  # nothing uninformative survives


def test_gfssf_matches_sfds_oracle():
    """The production accepter/pruner, run as a streaming loop, must select
    the same feature set as the readable SFDS oracle on the reference's
    regression fixture (1 informative + 14 noise columns)."""
    from ballet_ray.validation.sfds import sfds

    X, y, _ = _sfds_regression_fixture()
    stream = [X[:, i : i + 1] for i in range(X.shape[1])]
    expected = set(sfds(stream, y, l1=0.25, l2=0.25))

    acc = GFSSFAccepter(lmbda_1=0.25, lmbda_2=0.25)
    pruner = GFSSFPruner(lmbda_1=0.25, lmbda_2=0.25)
    selected: dict = {}
    for i, f in enumerate(stream):
        if acc.judge(f, selected, y):
            candidate = {**selected, i: f}
            redundant = set(pruner.prune(candidate, y)) - {i}
            selected = {k: v for k, v in candidate.items() if k not in redundant}
    assert set(selected) == expected


def test_acceptance_sample_unbiased_under_block_sorted_shift():
    """limit(cap) drew a PREFIX of the first blocks, so on block-sorted
    data the GFSSF verdict disagreed with the full-data verdict; the
    hash-priority sample must agree (VERDICT r3 #4)."""
    import ray.data as rd

    from ballet_ray.client import Client
    from ballet_ray.feature import Feature
    from ballet_ray.stages.core import IdentityTransform

    rng = np.random.default_rng(12)
    n = 4000
    # first half: candidate column is CONSTANT and y is noise;
    # second half: y == x exactly (maximally informative)
    x = np.concatenate([np.zeros(n // 2), rng.normal(size=n // 2)])
    y = np.concatenate([rng.normal(size=n // 2), x[n // 2 :]])
    df = pd.DataFrame({"x": x, "y": y})
    ds = rd.from_pandas(df).repartition(8)  # order-preserving split

    c = Client()
    feat = Feature("x", IdentityTransform(), output="x_id")
    verdict_sampled = c.validate_feature_acceptance(feat, [], ds, "y", sample_cap=1500)

    # full-data verdict (no sampling): x is informative about y
    from ballet_ray.validation.accepters import GFSSFAccepter

    full = GFSSFAccepter().judge(x.reshape(-1, 1), {}, y.reshape(-1, 1))
    assert full, "sanity: full-data GFSSF must accept an informative feature"
    assert verdict_sampled == full

    # the prefix draw (first 1500 rows: constant x) gives the WRONG verdict
    pre_x = x[:1500].reshape(-1, 1)
    pre_y = y[:1500].reshape(-1, 1)
    assert not GFSSFAccepter().judge(pre_x, {}, pre_y), (
        "sanity: the old prefix sample should reject here — if this fails "
        "the scenario no longer demonstrates the bias"
    )


def test_priority_sample_rows_align_across_features():
    """Every feature and the target must draw the SAME rows (GFSSF
    compares rowwise), so the priority is a pure function of input row
    content — verify alignment by reconstructing y from the feature."""
    import ray.data as rd

    from ballet_ray.feature import Feature
    from ballet_ray.stages.core import IdentityTransform
    from ballet_ray.validation.discover import (
        _feature_values_sample,
        _target_values_sample,
    )

    rng = np.random.default_rng(3)
    df = pd.DataFrame({"a": rng.normal(size=2000)})
    df["y"] = 2.0 * df.a
    ds = rd.from_pandas(df).repartition(6)
    f = Feature("a", IdentityTransform(), output="a_id")
    xs = _feature_values_sample(f, ds, 300)
    ys = _target_values_sample(ds, "y", 300)
    assert xs.shape[0] == ys.shape[0] == 300
    assert np.allclose(ys[:, 0], 2.0 * xs[:, 0])
