"""chunk_sequences / pack_sequences: brute-force reference parity and
packing invariants (token-mass preservation, capacity, coverage)."""

import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd

from ballet_ray.stages.sequences import chunk_sequences, chunk_table, pack_sequences, pack_table


def _rand_lists(rng, n, max_items=40, empty_every=7):
    rows = []
    for i in range(n):
        k = 0 if i % empty_every == 3 else int(rng.integers(0, max_items))
        rows.append(rng.integers(0, 1000, size=k).astype(np.int32).tolist())
    return rows


def _brute_chunks(rows, ids, max_len, stride, drop_remainder):
    out = []
    for rid, toks in zip(ids, rows):
        if drop_remainder:
            starts = range(0, max(len(toks) - max_len, -1) + 1, stride)
        else:
            starts = range(0, len(toks), stride)
        for ci, s in enumerate(starts):
            out.append((rid, ci, tuple(toks[s : s + max_len])))
    return out


@pytest.mark.parametrize(
    "max_len,stride,drop", [(16, 16, False), (16, 12, False), (8, 3, False), (16, 16, True), (10, 4, True)]
)
def test_chunk_table_matches_brute(max_len, stride, drop):
    rng = np.random.default_rng(7)
    rows = _rand_lists(rng, 200)
    ids = list(range(200))
    t = pa.table({"doc_id": ids, "tokens": pa.array(rows, type=pa.list_(pa.int32()))})
    got = chunk_table(t, list_col="tokens", id_col="doc_id", max_len=max_len, stride=stride, drop_remainder=drop)
    got_rows = [
        (i, c, tuple(tk))
        for i, c, tk in zip(got.column("doc_id").to_pylist(), got.column("chunk_id").to_pylist(), got.column("tokens").to_pylist())
    ]
    assert got_rows == _brute_chunks(rows, ids, max_len, stride, drop)
    assert got.column("chunk_len").to_pylist() == [len(tk) for _, _, tk in got_rows]


def test_chunk_sequences_dataset_and_carry():
    rng = np.random.default_rng(11)
    rows = _rand_lists(rng, 120)
    t = pa.table(
        {
            "doc_id": list(range(120)),
            "source": [f"s{i % 3}" for i in range(120)],
            "tokens": pa.array(rows, type=pa.list_(pa.int32())),
        }
    )
    ds = rd.from_arrow(t).repartition(5)
    out = chunk_sequences(ds, max_len=8, carry_cols=("source",)).to_pandas()
    brute = _brute_chunks(rows, list(range(120)), 8, 8, False)
    assert len(out) == len(brute)
    got = sorted(zip(out.doc_id, out.chunk_id, (tuple(x) for x in out.tokens)))
    assert got == sorted(brute)
    # carried column preserved per-chunk
    for did, src in zip(out.doc_id, out.source):
        assert src == f"s{did % 3}"


def test_pack_table_invariants():
    rng = np.random.default_rng(3)
    max_len = 64
    rows = _rand_lists(rng, 300, max_items=150)  # some rows > max_len -> pre-chunked
    t = pa.table({"doc_id": list(range(300)), "tokens": pa.array(rows, type=pa.list_(pa.int32()))})
    out = pack_table(t, list_col="tokens", id_col="doc_id", max_len=max_len)

    n_tok = np.asarray(out.column("n_tok").to_pylist())
    assert (n_tok <= max_len).all() and (n_tok > 0).all()
    assert n_tok.sum() == sum(len(r) for r in rows)  # token mass preserved
    # spans partition each pack exactly
    for toks, spans in zip(out.column("tokens").to_pylist(), out.column("span_lens").to_pylist()):
        assert sum(spans) == len(toks)
    # every nonempty (possibly chunked) row appears exactly once
    expected = []
    for i, r in enumerate(rows):
        expected += [i] * max(0, -(-len(r) // max_len)) if len(r) else []
    member = sorted(x for m in out.column("doc_ids").to_pylist() for x in m)
    assert member == sorted(expected)
    # packed token streams reassemble the originals (order within pack = span order)
    seen: dict[int, list[int]] = {}
    for toks, members, spans in zip(
        out.column("tokens").to_pylist(), out.column("doc_ids").to_pylist(), out.column("span_lens").to_pylist()
    ):
        pos = 0
        for m, ln in zip(members, spans):
            seen.setdefault(m, []).append((toks[pos : pos + ln]))
            pos += ln
    for i, r in enumerate(rows):
        if r:
            got = sorted(seen[i], key=len, reverse=True)
            # chunks of the row, re-sorted by length, must tile the original
            whole = sorted([r[s : s + max_len] for s in range(0, len(r), max_len)], key=len, reverse=True)
            assert sorted(map(tuple, got)) == sorted(map(tuple, whole))
    # FFD fill: no more bins than a loose 1.5x of the LP lower bound
    assert len(n_tok) <= int(np.ceil(n_tok.sum() / max_len * 1.5)) + 1


def test_pack_sequences_dataset_streaming():
    rng = np.random.default_rng(5)
    rows = _rand_lists(rng, 400, max_items=30, empty_every=10**9)
    t = pa.table({"doc_id": list(range(400)), "tokens": pa.array(rows, type=pa.list_(pa.int32()))})
    ds = rd.from_arrow(t).repartition(4)
    out = pack_sequences(ds, max_len=32, batch_size=100).to_pandas()
    assert out.n_tok.sum() == sum(len(r) for r in rows)
    assert (out.n_tok <= 32).all()
    # pack_id unique (first member id)
    assert out.pack_id.is_unique


def test_corpus_namespace_complete():
    import ballet_ray.corpus as c

    assert all(hasattr(c, n) for n in c.__all__)
    assert callable(c.chunk_sequences) and callable(c.semantic_dedup)


def test_pack_with_separator_token():
    rng = np.random.default_rng(13)
    rows = [rng.integers(0, 100, size=int(rng.integers(1, 20))).astype(np.int32).tolist() for _ in range(150)]
    t = pa.table({"doc_id": list(range(150)), "tokens": pa.array(rows, pa.list_(pa.int32()))})
    out = pack_table(t, list_col="tokens", id_col="doc_id", max_len=64, sep_token=-1)

    n_tok = np.asarray(out.column("n_tok").to_pylist())
    assert (n_tok <= 64).all()
    total_seps = 0
    for toks, members, spans in zip(
        out.column("tokens").to_pylist(), out.column("doc_ids").to_pylist(), out.column("span_lens").to_pylist()
    ):
        assert sum(spans) == len(toks)
        pos = 0
        for mi, (m, ln) in enumerate(zip(members, spans)):
            span = toks[pos : pos + ln]
            if mi == 0:
                assert span == rows[m]
            else:
                assert span[0] == -1 and span[1:] == rows[m]  # EOS prefix
                total_seps += 1
            pos += ln
    # token mass = original + one separator per non-first member
    assert n_tok.sum() == sum(len(r) for r in rows) + total_seps
    # every doc present exactly once
    member = sorted(x for m in out.column("doc_ids").to_pylist() for x in m)
    assert member == list(range(150))


def test_pack_id_unique_over_chunked_input():
    # one long doc chunked then packed used to yield colliding pack_ids
    import pyarrow as pa

    from ballet_ray.stages.sequences import chunk_table, pack_table

    t = pa.table({"doc_id": ["docA", "docB"], "tokens": [list(range(5000)), list(range(700))]})
    chunked = chunk_table(t, list_col="tokens", id_col="doc_id", max_len=512)
    packed = pack_table(chunked, list_col="tokens", id_col="doc_id", max_len=2048)
    ids = packed.column("pack_id").to_pylist()
    assert len(ids) == len(set(ids)), ids
    assert all("#" in i for i in ids)  # composite id#chunk_id form
    # token mass preserved
    n_in = sum(len(x) for x in t.column("tokens").to_pylist())
    n_out = sum(len(x) for x in packed.column("tokens").to_pylist())
    assert n_in == n_out


def test_pack_id_unique_when_pack_prechunks_internally():
    import pyarrow as pa

    from ballet_ray.stages.sequences import pack_table

    # a single row longer than max_len forces pack_table's internal chunking
    t = pa.table({"doc_id": ["only"], "tokens": [list(range(3000))]})
    packed = pack_table(t, list_col="tokens", id_col="doc_id", max_len=1024)
    ids = packed.column("pack_id").to_pylist()
    assert len(ids) == len(set(ids)), ids
