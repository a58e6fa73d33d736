"""Property-based tests for the sequence kernels: chunking must match the
brute per-row definition for arbitrary (max_len, stride, drop) configs and
row shapes; packing must preserve token mass, respect capacity, and cover
every chunked row exactly once. Pure-kernel tests — no Ray session needed
beyond the shared fixture."""

import numpy as np
import pyarrow as pa
from hypothesis import given, settings
from hypothesis import strategies as st

from ballet_ray.stages.sequences import chunk_table, pack_table


@st.composite
def list_table(draw):
    n = draw(st.integers(1, 40))
    rows = [
        draw(st.lists(st.integers(0, 999), min_size=0, max_size=60)) for _ in range(n)
    ]
    t = pa.table(
        {"doc_id": list(range(n)), "tokens": pa.array([[np.int32(x) for x in r] for r in rows], pa.list_(pa.int32()))}
    )
    return rows, t


@settings(max_examples=60, deadline=None, derandomize=True)
@given(list_table(), st.integers(1, 20), st.integers(1, 20), st.booleans())
def test_chunk_table_property(data, max_len, stride, drop):
    rows, t = data
    got = chunk_table(
        t, list_col="tokens", id_col="doc_id", max_len=max_len, stride=stride, drop_remainder=drop
    )
    exp = []
    for rid, toks in enumerate(rows):
        if drop:
            starts = range(0, max(len(toks) - max_len, -1) + 1, stride)
        else:
            starts = range(0, len(toks), stride)
        for ci, s in enumerate(starts):
            exp.append((rid, ci, tuple(toks[s : s + max_len])))
    got_rows = [
        (i, c, tuple(tk))
        for i, c, tk in zip(
            got.column("doc_id").to_pylist(), got.column("chunk_id").to_pylist(), got.column("tokens").to_pylist()
        )
    ]
    assert got_rows == exp


@settings(max_examples=40, deadline=None, derandomize=True)
@given(list_table(), st.integers(1, 30))
def test_pack_table_property(data, max_len):
    rows, t = data
    out = pack_table(t, list_col="tokens", id_col="doc_id", max_len=max_len)
    n_tok = np.asarray(out.column("n_tok").to_pylist(), dtype=np.int64)
    assert (n_tok <= max_len).all()
    assert n_tok.sum() == sum(len(r) for r in rows)
    # every nonempty row appears exactly ceil(len/max_len) times
    expected = []
    for i, r in enumerate(rows):
        if r:
            expected += [i] * (-(-len(r) // max_len))
    member = sorted(x for m in out.column("doc_ids").to_pylist() for x in m)
    assert member == sorted(expected)
    # spans tile each pack
    for toks, spans in zip(out.column("tokens").to_pylist(), out.column("span_lens").to_pylist()):
        assert sum(spans) == len(toks) and all(s > 0 for s in spans)
