"""prefix_lm / span objectives through the resumable pack job, plus the
pack_table member_cols machinery they ride on: member-aligned metadata
(n_prefix / n_in), kernel-composition parity, growth validation, resume."""

import glob
import json
import os
import subprocess
import sys

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from ballet_ray.stages.sequences import (
    chunk_table,
    pack_table,
    prefix_lm_mark_table,
    span_corruption_table,
)


def _toks_table(n_docs=24, seed=5, vmax=500, lmax=60):
    rng = np.random.RandomState(seed)
    rows = [{"doc_id": i,
             "tokens": rng.randint(0, vmax, rng.randint(1, lmax)).astype(np.int32).tolist()}
            for i in range(n_docs)]
    tbl = pa.table({"doc_id": pa.array([r["doc_id"] for r in rows]),
                    "tokens": pa.array([r["tokens"] for r in rows], pa.list_(pa.int32()))})
    return rows, tbl


def _tokens_dir(tmp_path, rows):
    d = tmp_path / "tokens"
    d.mkdir()
    pd.DataFrame(rows[: len(rows) // 2]).to_parquet(d / "a.parquet")
    pd.DataFrame(rows[len(rows) // 2:]).to_parquet(d / "b.parquet")
    return str(d)


def _run(inp, out, *extra):
    r = subprocess.run(
        [sys.executable, "jobs/run.py", "--mode", "pack", "--input", inp,
         "--out", out, "--num-cpus", "4", "--max-len", "16", "--pack-len", "64",
         *extra],
        capture_output=True, text=True, cwd="/root/repo",
        env={**os.environ, "RAY_ADDRESS": "local"},
    )
    assert r.returncode == 0, r.stderr[-3000:]
    return json.loads(r.stdout.strip().splitlines()[-1])


def _read_examples(out):
    files = sorted(glob.glob(os.path.join(out, "examples", "part=*", "*.parquet")))
    return pd.concat([pd.read_parquet(f) for f in files], ignore_index=True)


def _member_multiset(ex, meta_col):
    """(member token tuple, meta value) multiset from packed examples."""
    got = []
    for toks, span_lens, metas in zip(ex["tokens"], ex["span_lens"], ex[meta_col]):
        toks, pos = list(toks), 0
        for ln, m in zip(span_lens, metas):
            got.append((tuple(toks[pos:pos + ln]), int(m)))
            pos += ln
    return sorted(got)


# ---------------------------------------------------------------- kernels


def test_pack_table_member_cols_alignment():
    rows, tbl = _toks_table(n_docs=40, seed=11)
    ch = chunk_table(tbl, list_col="tokens", id_col="doc_id", max_len=16)
    marked = prefix_lm_mark_table(ch, rate=1.0, chunk_col="chunk_id",
                                  carry_cols=("chunk_id",))
    packed = pack_table(marked, list_col="tokens", id_col="doc_id",
                        max_len=64, member_cols=("n_prefix",))
    # per pack: member count aligns across doc_ids / span_lens / n_prefix
    for dids, spans, nps in zip(packed["doc_ids"].to_pylist(),
                                packed["span_lens"].to_pylist(),
                                packed["n_prefix"].to_pylist()):
        assert len(dids) == len(spans) == len(nps)
        for ln, npx in zip(spans, nps):
            assert 1 <= npx <= ln
    # multiset of (member tokens, n_prefix) is exactly the marked table's
    want = sorted((tuple(t), int(p)) for t, p in
                  zip(marked["tokens"].to_pylist(), marked["n_prefix"].to_pylist()))
    ex = pd.DataFrame({"tokens": packed["tokens"].to_pylist(),
                       "span_lens": packed["span_lens"].to_pylist(),
                       "n_prefix": packed["n_prefix"].to_pylist()})
    assert _member_multiset(ex, "n_prefix") == want


def test_pack_table_member_cols_rejects_prechunk():
    _, tbl = _toks_table(n_docs=6, seed=3, lmax=60)
    tbl = tbl.append_column("n_prefix", pa.array([1] * 6, pa.int32()))
    with pytest.raises(ValueError, match="member_cols"):
        pack_table(tbl, list_col="tokens", id_col="doc_id", max_len=8,
                   member_cols=("n_prefix",))


def test_span_decoder_layout_is_pair_concat():
    _, tbl = _toks_table(n_docs=30, seed=9)
    pair = span_corruption_table(tbl)
    dec = span_corruption_table(tbl, layout="decoder")
    for i_, t_, d_, n_ in zip(pair["inputs"].to_pylist(), pair["targets"].to_pylist(),
                              dec["tokens"].to_pylist(), dec["n_in"].to_pylist()):
        assert d_ == i_ + t_
        assert n_ == len(i_)


def test_span_chunk_keying_draws_independently():
    # two identical windows of one doc must corrupt differently when the
    # chunk ordinal keys the hash
    toks = list(range(40)) * 2
    tbl = pa.table({"doc_id": pa.array([7]), "tokens": pa.array([toks], pa.list_(pa.int32()))})
    ch = chunk_table(tbl, list_col="tokens", id_col="doc_id", max_len=40)
    assert ch.num_rows == 2
    assert ch["tokens"].to_pylist()[0] == ch["tokens"].to_pylist()[1]
    out = span_corruption_table(ch, chunk_col="chunk_id", layout="decoder")
    a, b = out["tokens"].to_pylist()
    assert a != b  # independent draws per window
    # without chunk keying the two windows draw identically
    out2 = span_corruption_table(ch, layout="decoder")
    a2, b2 = out2["tokens"].to_pylist()
    assert a2 == b2


def test_checkpointed_pack_growth_validation():
    from ballet_ray.state.checkpoint import CheckpointedPack

    with pytest.raises(ValueError, match="fim"):
        CheckpointedPack("/tmp/x", max_len=16, pack_len=17, objective="fim")
    with pytest.raises(ValueError, match="span"):
        CheckpointedPack("/tmp/x", max_len=512, pack_len=512, objective="span")
    CheckpointedPack("/tmp/x", max_len=16, pack_len=64, objective="span")
    with pytest.raises(ValueError, match="objective"):
        CheckpointedPack("/tmp/x", objective="mlm")


# ------------------------------------------------------------ job (slow)


@pytest.mark.slow
def test_prefix_lm_pack_job(tmp_path):
    rows, tbl = _toks_table()
    inp = _tokens_dir(tmp_path, rows)
    out = str(tmp_path / "out")
    plain_out = str(tmp_path / "plain")
    s = _run(inp, out, "--objective", "prefix_lm", "--objective-rate", "1.0")
    sp = _run(inp, plain_out)
    # tokens unchanged by the marking objective: packs identical to a plain run
    ex, exp = _read_examples(out), _read_examples(plain_out)
    assert [list(t) for t in ex["tokens"]] == [list(t) for t in exp["tokens"]]
    assert s["tokens_out"] == sp["tokens_out"]
    assert json.load(open(os.path.join(out, "manifest", "part-0.json")))["objective"] == "prefix_lm"
    # n_prefix parity with the kernel composition
    want_tbl = prefix_lm_mark_table(
        chunk_table(tbl, list_col="tokens", id_col="doc_id", max_len=16),
        rate=1.0, chunk_col="chunk_id", carry_cols=("chunk_id",))
    want = sorted((tuple(t), int(p)) for t, p in
                  zip(want_tbl["tokens"].to_pylist(), want_tbl["n_prefix"].to_pylist()))
    assert _member_multiset(ex, "n_prefix") == want
    # resume leaves examples identical
    s2 = _run(inp, out, "--objective", "prefix_lm", "--objective-rate", "1.0")
    assert s2["partitions_resumed"] == s2["partitions_total"]
    ex2 = _read_examples(out)
    assert [list(m) for m in ex2["n_prefix"]] == [list(m) for m in ex["n_prefix"]]


@pytest.mark.slow
def test_span_pack_job(tmp_path):
    rows, tbl = _toks_table(seed=13)
    inp = _tokens_dir(tmp_path, rows)
    out = str(tmp_path / "out")
    s = _run(inp, out, "--objective", "span", "--noise-density", "0.25",
             "--mean-span-len", "2.0")
    ex = _read_examples(out)
    want_tbl = span_corruption_table(
        chunk_table(tbl, list_col="tokens", id_col="doc_id", max_len=16),
        noise_density=0.25, mean_span_len=2.0, chunk_col="chunk_id",
        carry_cols=("chunk_id",), layout="decoder")
    want = sorted((tuple(t), int(n)) for t, n in
                  zip(want_tbl["tokens"].to_pylist(), want_tbl["n_in"].to_pylist()))
    assert _member_multiset(ex, "n_in") == want
    assert s["tokens_out"] == sum(len(t) for t, _ in want)

@pytest.mark.slow
def test_objective_threads_through_ingest(tmp_path):
    """--objective fim through --mode ingest: the pack phase applies the
    transform (sentinels present, manifest records it)."""
    rng = np.random.RandomState(3)
    words = [f"w{j}" for j in range(80)]
    docs = pd.DataFrame([
        {"doc_id": i,
         "text": " ".join(np.random.RandomState(3 + i).choice(words, 40))}
        for i in range(30)
    ])
    inp = str(tmp_path / "docs.parquet")
    docs.to_parquet(inp)
    out = str(tmp_path / "out")
    r = subprocess.run(
        [sys.executable, "jobs/run.py", "--mode", "ingest", "--input", inp,
         "--out", out, "--num-cpus", "4", "--max-len", "16", "--pack-len", "64",
         "--bloom-bits", str(1 << 20), "--objective", "fim",
         "--objective-rate", "1.0"],
        capture_output=True, text=True, cwd="/root/repo",
        env={**os.environ, "RAY_ADDRESS": "local"},
    )
    assert r.returncode == 0, r.stderr[-3000:]
    s = json.loads(r.stdout.strip().splitlines()[-1])
    assert s["pack"]["packs"] > 0
    ex = _read_examples(os.path.join(out, "packs"))
    flat = np.concatenate([np.asarray(t) for t in ex["tokens"]])
    assert (flat == -1).sum() > 0 and (flat == -2).sum() == (flat == -1).sum()
    mans = [json.load(open(os.path.join(out, "packs", "manifest", f)))
            for f in os.listdir(os.path.join(out, "packs", "manifest"))]
    assert all(m["objective"] == "fim" for m in mans)
