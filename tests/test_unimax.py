"""UniMax mixture allocation (Chung 2023, arXiv:2304.09151): water-fill a
budget across groups under a per-group epoch cap, then map-only epoch
expansion. Brute water-fill reference by bisection; partition invariance;
up-sampling epochs; cap saturation; count_col mode; validation."""

import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from ballet_ray.stages.sampling import unimax_rates, unimax_sample


def _brute_rates(sizes: dict, budget: float, max_epochs: float) -> dict:
    caps = {g: max_epochs * c for g, c in sizes.items()}
    total = sum(caps.values())
    if total <= budget:
        return {g: max_epochs for g in sizes}
    lo, hi = 0.0, max(caps.values())
    for _ in range(200):  # bisection on f(t) = sum min(cap, t)
        mid = (lo + hi) / 2
        if sum(min(c, mid) for c in caps.values()) < budget:
            lo = mid
        else:
            hi = mid
    t = (lo + hi) / 2
    return {g: min(caps[g], t) / sizes[g] for g in sizes}


def _df(sizes: dict, seed=11) -> pd.DataFrame:
    rows = []
    i = 0
    for g, n in sizes.items():
        for _ in range(n):
            rows.append({"doc_id": i, "grp": g, "n_tok": 10 + (i % 7)})
            i += 1
    return pd.DataFrame(rows)


def test_unimax_rates_waterfill_matches_brute():
    sizes = {"en": 500, "de": 120, "fr": 80, "sw": 20, "is": 5}
    df = _df(sizes)
    for budget, epochs in [(400, 1.0), (900, 2.0), (725, 3.0), (50, 1.0)]:
        got = unimax_rates(
            rd.from_pandas(df).repartition(4), group_col="grp",
            budget=budget, max_epochs=epochs,
        )
        want = _brute_rates(sizes, budget, epochs)
        assert set(got) == set(want)
        for g in want:
            assert got[g] == pytest.approx(want[g], rel=1e-9), (g, budget, epochs)
        # allocations hit the budget exactly (or all caps when budget exceeds)
        alloc = sum(got[g] * sizes[g] for g in sizes)
        cap_total = epochs * sum(sizes.values())
        assert alloc == pytest.approx(min(budget, cap_total), rel=1e-9)


def test_unimax_rates_cap_saturation_and_count_col():
    sizes = {"a": 30, "b": 10}
    df = _df(sizes)
    # budget above total caps: every group at max_epochs
    got = unimax_rates(rd.from_pandas(df), group_col="grp", budget=1e9,
                       max_epochs=2.5)
    assert got == {"a": 2.5, "b": 2.5}
    # token-weighted sizes: rates follow token sums, not row counts
    tok = unimax_rates(rd.from_pandas(df), group_col="grp", budget=200,
                       max_epochs=1.0, count_col="n_tok")
    tok_sizes = df.groupby("grp")["n_tok"].sum().to_dict()
    want = _brute_rates(tok_sizes, 200, 1.0)
    for g in want:
        assert tok[g] == pytest.approx(want[g], rel=1e-9)

    with pytest.raises(ValueError):
        unimax_rates(rd.from_pandas(df), group_col="grp", budget=0)
    with pytest.raises(ValueError):
        unimax_rates(rd.from_pandas(df), group_col="grp", budget=10,
                     max_epochs=0)


def test_unimax_sample_epochs_and_partition_invariance():
    sizes = {"en": 400, "sw": 40, "is": 10}
    df = _df(sizes)
    budget = 0.9 * len(df)  # small groups up-sample to the cap, en trims
    kw = dict(group_col="grp", key_col="doc_id", budget=budget,
              max_epochs=2.0, salt="t:", method="md5")
    out = unimax_sample(rd.from_pandas(df).repartition(5), **kw).to_pandas()
    out2 = unimax_sample(rd.from_pandas(df).repartition(1), **kw).to_pandas()
    key = lambda d: sorted(zip(d.doc_id, d.epoch))
    assert key(out) == key(out2)  # partition-invariant

    rates = unimax_rates(rd.from_pandas(df), group_col="grp", budget=budget,
                         max_epochs=2.0)
    by_g = out.groupby("grp")
    for g, r in rates.items():
        grp = by_g.get_group(g)
        # every row of a group with rate >= 1 appears at least floor(r) times
        per_doc = grp.groupby("doc_id")["epoch"].agg(["count", "max"])
        assert (per_doc["count"] >= int(np.floor(r))).all(), g
        assert (per_doc["count"] <= int(np.floor(r)) + 1).all(), g
        # epochs are dense 0..count-1 per doc
        assert (per_doc["max"] == per_doc["count"] - 1).all(), g
        # realized size tracks the allocation (hash-exact expectation ±5%)
        assert len(grp) == pytest.approx(r * sizes[g], rel=0.08), (g, r)

    # rate <= 1 group: plain filter, epoch always 0
    en = by_g.get_group("en")
    assert rates["en"] < 1 and (en["epoch"] == 0).all()
    # cap-bound group at exactly max_epochs=2: every doc exactly twice
    if rates["is"] == 2.0:
        is_counts = by_g.get_group("is").groupby("doc_id").size()
        assert (is_counts == 2).all()


def test_unimax_oracle_parity_duckdb():
    """The Ray pipeline and the SQL water-fill oracle agree row-for-row on
    a synthetic skewed corpus (the same guarantee the driver checks at
    sf0.01, pinned here so it can't silently drift)."""
    import duckdb

    from ballet_ray.pipelines.driver_queries import (
        SQL_UNIMAX_MIXTURE_DOCS, q_unimax_mixture_docs)

    rng = np.random.default_rng(3)
    langs = ["en"] * 300 + ["zh"] * 80 + ["es"] * 60 + ["sw"] * 15 + ["is"] * 5
    df = pd.DataFrame({
        "doc_id": np.arange(len(langs), dtype=np.int64),
        "lang": langs,
        "text": ["x"] * len(langs),
    })
    import os
    import tempfile

    with tempfile.TemporaryDirectory() as d:
        df.to_parquet(os.path.join(d, "documents.parquet"))
        got = q_unimax_mixture_docs(d).to_pandas()
        con = duckdb.connect()
        con.execute(
            "CREATE VIEW documents AS SELECT * FROM "
            f"read_parquet('{os.path.join(d, 'documents.parquet')}')"
        )
        want = con.execute(SQL_UNIMAX_MIXTURE_DOCS).fetchdf()
    k = lambda d: sorted(zip(d.doc_id, d.lang, d.epoch))
    assert k(got) == k(want)
    assert got["epoch"].max() >= 1  # up-sampling actually happened
