"""stratified_sample / hash_rate_filter / grouped_rank vs pandas refs."""

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

from ballet_ray.stages.sampling import hash_rate_filter, stratified_sample
from ballet_ray.stages.windows import grouped_rank


def _docs(n=1000, seed=0):
    rng = np.random.default_rng(seed)
    return pd.DataFrame(
        {
            "doc_id": np.arange(n),
            "g": rng.choice(["a", "b", "c"], size=n, p=[0.6, 0.3, 0.1]),
            "v": rng.integers(0, 50, size=n).astype(np.float64),
        }
    )


def test_stratified_sample_matches_reference():
    df = _docs()
    ds = rd.from_pandas(df).repartition(6)
    got = stratified_sample(ds, group_col="g", key_col="doc_id", n=15, method="md5").to_pandas()
    df = df.assign(prio=[hashlib.md5(str(k).encode()).hexdigest() for k in df.doc_id])
    exp = (
        df.sort_values(["prio", "doc_id"]).groupby("g").head(15)[["g", "doc_id"]]
    )
    assert sorted(map(tuple, got[["g", "doc_id"]].to_numpy())) == sorted(map(tuple, exp.to_numpy()))
    # partitioning-invariant
    got2 = stratified_sample(rd.from_pandas(df), group_col="g", key_col="doc_id", n=15, method="md5").to_pandas()
    assert sorted(got2.doc_id) == sorted(got.doc_id)


def test_hash_rate_filter_reference_and_rates():
    df = _docs(2000, seed=1)
    ds = rd.from_pandas(df).repartition(4)
    rates = {"a": 0.3, "b": 1.0, "c": 0.0}
    got = hash_rate_filter(ds, key_col="doc_id", rates=rates, group_col="g", salt="s:", method="md5").to_pandas()
    u = np.array([int(hashlib.md5(b"s:" + str(k).encode()).hexdigest()[:8], 16) / 2**32 for k in df.doc_id])
    exp = df[u < df.g.map(rates).to_numpy()]
    assert sorted(got.doc_id) == sorted(exp.doc_id)
    assert not (got.g == "c").any()
    # global rate mode
    g2 = hash_rate_filter(ds, key_col="doc_id", rate=0.5, method="md5").to_pandas()
    u2 = np.array([int(hashlib.md5(str(k).encode()).hexdigest()[:8], 16) / 2**32 for k in df.doc_id])
    assert sorted(g2.doc_id) == sorted(df.doc_id[u2 < 0.5])


def test_grouped_rank_matches_pandas_window():
    df = _docs(1500, seed=2)  # v has heavy ties (50 distinct values)
    ds = rd.from_pandas(df).repartition(5)
    got = grouped_rank(ds, group_col="g", value_col="v").to_pandas().sort_values("doc_id")
    exp_rank = df.groupby("g")["v"].rank(method="min").astype(np.int64)
    n = df.groupby("g")["v"].transform("size")
    exp_pr = np.where(n > 1, (exp_rank - 1) / (n - 1), 0.0)
    df_sorted = df.sort_values("doc_id")
    np.testing.assert_array_equal(got["rank"].to_numpy(), exp_rank[df_sorted.index].to_numpy())
    np.testing.assert_allclose(got["percent_rank"].to_numpy(), exp_pr[df_sorted.index], atol=1e-12)


def test_global_shuffle_index_permutation_and_stability():
    import hashlib

    from ballet_ray.stages.sampling import global_shuffle_index

    df = pd.DataFrame({"doc_id": [f"d{i}" for i in range(777)], "payload": np.arange(777)})
    a = global_shuffle_index(rd.from_pandas(df).repartition(6), key_col="doc_id", method="md5").to_pandas()
    # dense permutation
    assert sorted(a.shuffle_idx) == list(range(777))
    # matches the md5-order reference
    ref = df.assign(p=[hashlib.md5(k.encode()).hexdigest() for k in df.doc_id]).sort_values(["p", "doc_id"])
    exp = {k: i for i, k in enumerate(ref.doc_id)}
    assert all(exp[k] == i for k, i in zip(a.doc_id, a.shuffle_idx))
    # payload carried through intact
    assert dict(zip(a.doc_id, a.payload)) == dict(zip(df.doc_id, df.payload))
    # partitioning-invariant
    b = global_shuffle_index(rd.from_pandas(df), key_col="doc_id", method="md5").to_pandas()
    assert dict(zip(b.doc_id, b.shuffle_idx)) == exp


def test_find_contaminated_reference():
    from ballet_ray.stages.dedup import find_contaminated

    eval_texts = ["q w e r t y u i o p", "a b c d e f g h"]
    corpus_texts = [
        "x x q w e r t y u i o p y y",   # contains 3 eval 8-windows
        "a b c d e f g h",               # equals eval doc -> 1 window
        "nothing here at all to see",    # clean (short, 0 windows anyway)
        "z z z z z z z z z z",           # clean
    ]
    ev = rd.from_arrow(pa.table({"doc_id": [100, 101], "text": eval_texts}))
    cp = rd.from_arrow(pa.table({"doc_id": [0, 1, 2, 3], "text": corpus_texts})).repartition(2)
    for key in ("hash", "text"):
        got = find_contaminated(cp, ev, n=8, key=key).to_pandas().sort_values("doc_id")
        assert dict(zip(got.doc_id, got.n_hits)) == {0: 3, 1: 1}
        assert list(got.columns) == ["doc_id", "n_hits"]  # default schema
    # PaLM overlap-fraction mode: doc 0 has 14 words -> 7 windows, 3 hit;
    # doc 1 has 8 words -> 1 window, fully contaminated
    fr = find_contaminated(cp, ev, n=8, key="hash",
                           with_fraction=True).to_pandas().sort_values("doc_id")
    assert dict(zip(fr.doc_id, fr.n_windows)) == {0: 7, 1: 1}
    assert dict(zip(fr.doc_id, fr.hit_frac)) == {0: 3 / 7, 1: 1.0}


def test_curriculum_index_buckets_in_order():
    from ballet_ray.stages.sampling import global_shuffle_index

    df = pd.DataFrame({"doc_id": list(range(600)), "tier": [i % 3 for i in range(600)]})
    out = global_shuffle_index(
        rd.from_pandas(df).repartition(4), key_col="doc_id", bucket_col="tier", n_buckets=3
    ).to_pandas()
    # dense permutation; every tier occupies a contiguous index range in tier order
    assert sorted(out.shuffle_idx) == list(range(600))
    by_tier = out.groupby("tier")["shuffle_idx"]
    assert by_tier.max()[0] < by_tier.min()[1] < by_tier.max()[1] < by_tier.min()[2]


def test_global_shuffle_index_siphash_permutation_equivalence():
    """Default (siphash) mode: dense 0..N-1 permutation, identical under
    any partitioning, and genuinely shuffled (not input order)."""
    from ballet_ray.stages.sampling import global_shuffle_index

    df = pd.DataFrame({"doc_id": [f"d{i}" for i in range(911)], "payload": np.arange(911)})
    a = global_shuffle_index(rd.from_pandas(df).repartition(7), key_col="doc_id").to_pandas()
    assert sorted(a.shuffle_idx) == list(range(911))
    b = global_shuffle_index(rd.from_pandas(df), key_col="doc_id").to_pandas()
    assert dict(zip(a.doc_id, a.shuffle_idx)) == dict(zip(b.doc_id, b.shuffle_idx))
    # same multiset of rows, different order than input (overwhelmingly)
    in_order = a.sort_values("payload").shuffle_idx.to_numpy()
    assert not np.array_equal(in_order, np.arange(911))
    # payload intact
    assert dict(zip(a.doc_id, a.payload)) == dict(zip(df.doc_id, df.payload))
    # salt changes the permutation
    c = global_shuffle_index(rd.from_pandas(df), key_col="doc_id", salt="x").to_pandas()
    assert dict(zip(c.doc_id, c.shuffle_idx)) != dict(zip(a.doc_id, a.shuffle_idx))


def test_stratified_sample_siphash_deterministic_and_uniformish():
    from ballet_ray.stages.sampling import stratified_sample

    df = _docs(3000, seed=5)
    a = stratified_sample(rd.from_pandas(df).repartition(6), group_col="g", key_col="doc_id", n=25).to_pandas()
    b = stratified_sample(rd.from_pandas(df), group_col="g", key_col="doc_id", n=25).to_pandas()
    assert sorted(a.doc_id) == sorted(b.doc_id)
    assert (a.groupby("g").size() == 25).all()
    # matches the direct definition: n smallest siphash priorities per group
    from ballet_ray.stages.sampling import _sip_u64

    pr = _sip_u64(df.doc_id.to_numpy(), "")
    exp = df.assign(p=pr).sort_values(["p", "doc_id"]).groupby("g").head(25)
    assert sorted(a.doc_id) == sorted(exp.doc_id)


def test_cap_per_group_matches_stratified_winners_and_keeps_full_rows():
    from ballet_ray.stages.sampling import cap_per_group

    df = _docs(1200, seed=3)
    ds = rd.from_pandas(df).repartition(7)
    capped = cap_per_group(ds, group_col="g", key_col="doc_id", cap=40).to_pandas()
    # winners are exactly the stratified_sample set, with the FULL row schema
    win = stratified_sample(ds, group_col="g", key_col="doc_id", n=40).to_pandas()
    assert sorted(capped.doc_id) == sorted(win.doc_id)
    assert set(capped.columns) == set(df.columns)
    assert (capped.groupby("g").size() <= 40).all()
    # payload survives intact
    merged = capped.merge(df, on="doc_id", suffixes=("", "_orig"))
    assert (merged["v"] == merged["v_orig"]).all()
    # partitioning-invariant
    again = cap_per_group(rd.from_pandas(df), group_col="g", key_col="doc_id",
                          cap=40).to_pandas()
    assert sorted(again.doc_id) == sorted(capped.doc_id)


def test_cap_per_group_identity_below_cap_and_join_path():
    from ballet_ray.stages.sampling import cap_per_group

    df = _docs(300, seed=4)
    ds = rd.from_pandas(df).repartition(5)
    # every group under the cap -> identity (all rows kept)
    all_rows = cap_per_group(ds, group_col="g", key_col="doc_id", cap=1000).to_pandas()
    assert sorted(all_rows.doc_id) == sorted(df.doc_id)
    # distributed-join path (broadcast_limit=0 forces it) == broadcast path
    bc = cap_per_group(ds, group_col="g", key_col="doc_id", cap=25).to_pandas()
    jn = cap_per_group(ds, group_col="g", key_col="doc_id", cap=25,
                       broadcast_limit=0).to_pandas()
    assert sorted(jn.doc_id) == sorted(bc.doc_id)
    import pytest

    with pytest.raises(ValueError):
        cap_per_group(ds, group_col="g", key_col="doc_id", cap=0)


def test_filter_groups_count_mean_invert_and_join_path():
    from ballet_ray.stages.sampling import filter_groups

    df = pd.DataFrame({
        "doc_id": np.arange(100),
        "domain": (["big.org"] * 60 + ["mid.org"] * 30 + ["tiny.org"] * 8
                   + [None] * 2),
        "q": np.concatenate([np.full(60, 0.9), np.full(30, 0.2),
                             np.full(8, 0.8), np.full(2, 1.0)]),
    })
    ds = rd.from_pandas(df).repartition(6)

    # count >= 10 keeps big+mid; null-group rows always drop
    kept = filter_groups(ds, group_col="domain", agg="count",
                         min_value=10).to_pandas()
    assert set(kept.domain) == {"big.org", "mid.org"} and len(kept) == 90

    # mean quality >= 0.5 keeps big+tiny
    good = filter_groups(ds, group_col="domain", agg="mean", value_col="q",
                         min_value=0.5).to_pandas()
    assert set(good.domain) == {"big.org", "tiny.org"} and len(good) == 68

    # invert drops those groups instead
    bad = filter_groups(ds, group_col="domain", agg="mean", value_col="q",
                        min_value=0.5, invert=True).to_pandas()
    assert set(bad.domain) == {"mid.org"} and len(bad) == 30

    # distributed-join path matches broadcast
    jn = filter_groups(ds, group_col="domain", agg="count", min_value=10,
                       broadcast_limit=0).to_pandas()
    assert sorted(jn.doc_id) == sorted(kept.doc_id)

    import pytest

    with pytest.raises(ValueError):
        filter_groups(ds, group_col="domain", agg="mean", value_col="q")
    with pytest.raises(ValueError):
        filter_groups(ds, group_col="domain", agg="median", value_col="q",
                      min_value=1)
    with pytest.raises(ValueError):
        filter_groups(ds, group_col="domain", agg="sum", min_value=1)


def test_cap_and_filter_groups_property_vs_pandas():
    """Property check vs a pandas reference over randomized shapes:
    many/few groups, string/int keys, caps spanning under/over."""
    from ballet_ray.stages.sampling import cap_per_group, filter_groups
    from ballet_ray.functions.partition import stable_hash_array

    for seed, n_groups, n, cap in [(0, 3, 200, 5), (1, 50, 400, 3),
                                   (2, 200, 600, 2), (3, 7, 100, 1000)]:
        rng = np.random.default_rng(seed)
        df = pd.DataFrame({
            "doc_id": [f"k{i}" for i in range(n)],
            "g": [f"g{x}" for x in rng.integers(0, n_groups, n)],
            "v": rng.normal(size=n),
        })
        ds = rd.from_pandas(df).repartition(5)

        got = cap_per_group(ds, group_col="g", key_col="doc_id",
                            cap=cap).to_pandas()
        prio = stable_hash_array(df["doc_id"].to_numpy())
        exp = (df.assign(__p=prio).sort_values(["__p", "doc_id"])
               .groupby("g").head(cap))
        assert sorted(got.doc_id) == sorted(exp.doc_id), (seed, cap)

        # nudge off the exact boundary: the median IS one group's mean, and
        # distributed summation differs from pandas in the last ulp there
        thr = float(df.groupby("g")["v"].mean().median()) - 1e-9
        keep = filter_groups(ds, group_col="g", agg="mean", value_col="v",
                             min_value=thr).to_pandas()
        exp_groups = set(df.groupby("g")["v"].mean().loc[lambda s: s >= thr].index)
        assert set(keep.g) == exp_groups, seed
        assert len(keep) == df.g.isin(exp_groups).sum(), seed
