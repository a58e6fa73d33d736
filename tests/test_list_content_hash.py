"""add_content_hash / exact_dedup over LIST columns (sequence-level exact
dedup on the pre-tokenized tokens table): zero-copy binary row hashing,
boundary/order sensitivity, null vs empty, fixed-size lists, slow path."""

import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd

from ballet_ray.stages.dedup import _list_row_hashes, exact_dedup


def _h(arr):
    return _list_row_hashes(arr)[0]


def test_boundary_and_order_sensitivity():
    a = pa.array([[1, 2], [3], [1], [2, 3], [2, 1]], pa.list_(pa.int32()))
    h = _h(a)
    assert len(set(h.tolist())) == 5  # [1,2]|[3] != [1]|[2,3]; order matters


def test_equal_rows_equal_hashes_across_batches():
    a = pa.array([[5, 6, 7], [8]], pa.list_(pa.int64()))
    b = pa.array([[9], [5, 6, 7]], pa.list_(pa.int64()))
    assert _h(a)[0] == _h(b)[1]
    h1a, h2a = _list_row_hashes(a)
    assert h1a[0] != h2a[0]  # the two keys are independent


def test_null_vs_empty_and_slow_path():
    a = pa.array([[], None, [1]], pa.list_(pa.int32()))
    h = _h(a)
    assert len(set(h.tolist())) == 3
    # list<string> takes the repr slow path, still exact
    s = pa.array([["a", "b"], ["ab"], ["a", "b"]], pa.list_(pa.string()))
    hs = _h(s)
    assert hs[0] == hs[2] and hs[0] != hs[1]


def test_fixed_size_list():
    a = pa.array([[1.0, 2.0], [1.0, 2.0], [2.0, 1.0]],
                 pa.list_(pa.float32(), 2))
    h = _h(a)
    assert h[0] == h[1] and h[0] != h[2]


def test_exact_dedup_on_token_lists(ray_session):
    rows = [{"doc_id": i,
             "tokens": [1, 2, 3] if i % 3 == 0 else [i, i + 1]}
            for i in range(12)]
    out = exact_dedup(rd.from_items(rows), col="tokens", id_col="doc_id")
    ids = sorted(out.to_pandas()["doc_id"])
    assert ids == [0, 1, 2, 4, 5, 7, 8, 10, 11]  # min-id per sequence


def test_dedup_by_token_minhash_keep_longest(ray_session):
    """End-to-end token-sequence near-dedup: planted near-dup token arrays
    collapse to one row per cluster — keep_col='n_tok' keeps the LONGEST
    member, default keeps the min id; disjoint sequences survive."""
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from ballet_ray.stages.dedup import dedup_by_token_minhash

    rng = np.random.default_rng(5)
    base = rng.integers(0, 50_000, 300).astype(np.int32)
    near = np.concatenate([base, rng.integers(0, 50_000, 6).astype(np.int32)])
    other = rng.integers(0, 50_000, 280).astype(np.int32)
    df = pd.DataFrame({
        "doc_id": [1, 2, 3],
        "tokens": [list(base), list(near), list(other)],
    })
    df["n_tok"] = df["tokens"].map(len)
    ds = rd.from_pandas(df).repartition(2)

    kept = dedup_by_token_minhash(
        ds, est_threshold=0.8, keep_col="n_tok"
    ).to_pandas()
    assert sorted(kept["doc_id"]) == [2, 3]  # longest near-dup member wins

    kept_min = dedup_by_token_minhash(ds, est_threshold=0.8).to_pandas()
    assert sorted(kept_min["doc_id"]) == [1, 3]  # default: min id

    # no near-dups at all → identity, both retention modes
    df2 = df[df.doc_id.isin([1, 3])]
    for kw in ({}, {"keep_col": "n_tok"}):
        out = dedup_by_token_minhash(
            rd.from_pandas(df2), est_threshold=0.8, **kw
        ).to_pandas()
        assert sorted(out["doc_id"]) == [1, 3], kw
