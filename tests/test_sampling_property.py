"""Property-based stratified_sample / cap_per_group: arbitrary small
corpora (duplicate-free keys, skewed groups, caps at/above/below group
sizes) vs the brute ROW_NUMBER-over-hash-priority reference, in md5 mode
(where the priority is independently recomputable) and siphash mode
(checked against the library's own priority, both partitionings)."""

import hashlib

import numpy as np
import pandas as pd
import ray.data as rd
from hypothesis import given, settings
from hypothesis import strategies as st

from ballet_ray.stages.sampling import _priority_sortable, cap_per_group, stratified_sample


@st.composite
def tables(draw):
    n = draw(st.integers(1, 40))
    groups = draw(st.lists(st.sampled_from(["g1", "g2", "g3"]), min_size=n, max_size=n))
    return pd.DataFrame({
        "grp": groups,
        "doc_id": np.arange(n, dtype=np.int64) * 7 + 3,
        "payload": np.arange(n, dtype=np.float64),
    })


def _md5_prio(keys, salt):
    return np.array([hashlib.md5((salt + str(k)).encode()).hexdigest() for k in keys])


def _brute_winners(df, n, salt, method):
    prio = (_md5_prio(df["doc_id"].to_numpy(), salt) if method == "md5"
            else _priority_sortable(df["doc_id"].to_numpy(), salt, method))
    d = df.assign(__p=prio).sort_values(["__p", "doc_id"], kind="mergesort")
    return set(d.groupby("grp", sort=False).head(n)["doc_id"])


@settings(max_examples=25, deadline=None, derandomize=True)
@given(tables(), st.integers(1, 8), st.sampled_from(["md5", "siphash"]))
def test_stratified_sample_matches_brute(df, n, method):
    got = stratified_sample(
        rd.from_pandas(df).repartition(4), group_col="grp", key_col="doc_id",
        n=n, salt="p:", method=method,
    ).to_pandas()
    want = _brute_winners(df, n, "p:", method)
    assert set(got["doc_id"]) == want
    # exactly min(n, group size) winners per group
    sizes = df.groupby("grp").size()
    for g, cnt in got.groupby("grp").size().items():
        assert cnt == min(n, sizes[g])


@settings(max_examples=15, deadline=None, derandomize=True)
@given(tables(), st.integers(1, 8))
def test_cap_per_group_matches_brute_and_keeps_full_rows(df, cap):
    got = cap_per_group(
        rd.from_pandas(df).repartition(4), group_col="grp", key_col="doc_id",
        cap=cap, salt="c:", method="md5",
    ).to_pandas()
    want = _brute_winners(df, cap, "c:", "md5")
    assert set(got["doc_id"]) == want
    # full rows survive with payloads intact
    merged = got.merge(df, on="doc_id", suffixes=("", "_in"))
    assert (merged["payload"] == merged["payload_in"]).all()
    assert set(got.columns) == set(df.columns)
