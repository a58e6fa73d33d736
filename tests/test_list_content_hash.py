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
