"""Token-budget mixture sampling (sampling.budget_sample)."""

import hashlib

import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from ballet_ray.stages.sampling import budget_sample


def _corpus(seed=9, n=600):
    rng = np.random.RandomState(seed)
    return pd.DataFrame({
        "doc_id": [f"d{i}" for i in range(n)],
        "source": rng.choice(["web", "books", "code"], n, p=[0.6, 0.25, 0.15]),
        "n_tok": rng.randint(50, 500, n).astype(np.int64),
    })


def _brute(df, budgets, salt=""):
    keep = []
    for g, grp in df.groupby("source"):
        if g not in budgets:
            continue
        prio = [hashlib.md5((salt + k).encode()).hexdigest() for k in grp["doc_id"]]
        srt = grp.assign(__p=prio).sort_values(["__p", "doc_id"])
        run = srt["n_tok"].cumsum().to_numpy()
        over = np.flatnonzero(run > budgets[g])
        kept = srt.iloc[: over[0]] if len(over) else srt
        keep.append(kept.drop(columns="__p"))
    return pd.concat(keep) if keep else df.iloc[:0]


BUDGETS = {"web": 20_000, "books": 8_000}  # code: absent -> dropped


def test_matches_brute_prefix_md5():
    df = _corpus()
    out = budget_sample(
        rd.from_pandas(df).repartition(5), group_col="source", key_col="doc_id",
        token_col="n_tok", budgets=BUDGETS, method="md5",
    ).to_pandas()
    exp = _brute(df, BUDGETS)
    assert set(out["doc_id"]) == set(exp["doc_id"])
    # budgets respected and prefix-maximal per group
    for g, b in BUDGETS.items():
        got_g = out[out["source"] == g]["n_tok"].sum()
        assert got_g <= b
        assert got_g == exp[exp["source"] == g]["n_tok"].sum()
    assert (out["source"] != "code").all()


def test_partition_invariance_siphash():
    df = _corpus()
    a = budget_sample(rd.from_pandas(df).repartition(1), group_col="source",
                      key_col="doc_id", token_col="n_tok", budgets=BUDGETS
                      ).to_pandas()
    b = budget_sample(rd.from_pandas(df).repartition(7), group_col="source",
                      key_col="doc_id", token_col="n_tok", budgets=BUDGETS
                      ).to_pandas()
    assert set(a["doc_id"]) == set(b["doc_id"])
    for g, bud in BUDGETS.items():
        assert a[a["source"] == g]["n_tok"].sum() <= bud


def test_budget_larger_than_group_keeps_all():
    df = _corpus(n=100)
    out = budget_sample(
        rd.from_pandas(df).repartition(3), group_col="source", key_col="doc_id",
        token_col="n_tok", budgets={"web": 10**9, "books": 10**9, "code": 10**9},
    ).to_pandas()
    assert set(out["doc_id"]) == set(df["doc_id"])


def test_zero_budget_empty_group():
    df = _corpus(n=100)
    out = budget_sample(
        rd.from_pandas(df).repartition(2), group_col="source", key_col="doc_id",
        token_col="n_tok", budgets={"web": 0, "books": 5_000},
    ).to_pandas()
    assert (out["source"] == "books").all()
    assert out["n_tok"].sum() <= 5_000


def test_bad_method_raises():
    df = _corpus(n=20)
    with pytest.raises(ValueError, match="method"):
        budget_sample(rd.from_pandas(df), group_col="source", key_col="doc_id",
                      token_col="n_tok", budgets=BUDGETS, method="sha9")


from hypothesis import given, settings, strategies as st


@settings(max_examples=15, deadline=None)
@given(
    n=st.integers(20, 120),
    budget=st.integers(0, 20_000),
    seed=st.integers(0, 10_000),
    parts=st.integers(1, 6),
)
def test_property_budget_and_prefix_maximality(n, budget, seed, parts):
    rng = np.random.RandomState(seed)
    df = pd.DataFrame({
        "doc_id": [f"p{seed}-{i}" for i in range(n)],
        "source": rng.choice(["a", "b"], n),
        "n_tok": rng.randint(1, 800, n).astype(np.int64),
    })
    budgets = {"a": budget, "b": budget // 2}
    out = budget_sample(
        rd.from_pandas(df).repartition(parts), group_col="source",
        key_col="doc_id", token_col="n_tok", budgets=budgets, method="md5",
    ).to_pandas()
    exp = _brute(df, budgets)
    if len(exp) == 0:
        # all-empty selection: Ray loses the schema on a fully empty
        # union, so only the row count is checkable
        assert len(out) == 0
        return
    # exact set equality with the brute prefix rule implies both the
    # budget bound and prefix-maximality
    assert set(out["doc_id"]) == set(exp["doc_id"])
    for g, b in budgets.items():
        assert out[out["source"] == g]["n_tok"].sum() <= b
