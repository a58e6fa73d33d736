"""--fim-rate through the resumable pack job (jobs/run.py --mode pack):
FIM applied per context window between chunking and packing — sentinel
accounting, exact parity with the driver-side kernel composition, and
byte-identical resume."""

import json
import os
import subprocess
import sys

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest


def _tokens_dir(tmp_path, n_docs=24, seed=5):
    rng = np.random.RandomState(seed)
    d = tmp_path / "tokens"
    d.mkdir()
    rows = [{"doc_id": i, "tokens": rng.randint(0, 500, rng.randint(1, 60)).astype(np.int32).tolist()}
            for i in range(n_docs)]
    pd.DataFrame(rows[:12]).to_parquet(d / "a.parquet")
    pd.DataFrame(rows[12:]).to_parquet(d / "b.parquet")
    return str(d), rows


def _run(inp, out, *extra):
    r = subprocess.run(
        [sys.executable, "jobs/run.py", "--mode", "pack", "--input", inp,
         "--out", out, "--num-cpus", "4", "--max-len", "16", "--pack-len", "64",
         "--fim-rate", "1.0", *extra],
        capture_output=True, text=True, cwd="/root/repo",
        env={**os.environ, "RAY_ADDRESS": "local"},
    )
    assert r.returncode == 0, r.stderr[-3000:]
    return json.loads(r.stdout.strip().splitlines()[-1])


def _read_examples(out):
    import glob

    files = sorted(glob.glob(os.path.join(out, "examples", "part=*", "*.parquet")))
    return pd.concat([pd.read_parquet(f) for f in files], ignore_index=True)


@pytest.mark.slow
def test_fim_pack_job(tmp_path):
    inp, rows = _tokens_dir(tmp_path)
    out = str(tmp_path / "out")
    s = _run(inp, out)
    ex = _read_examples(out)
    flat = np.concatenate([np.asarray(t) for t in ex["tokens"]])

    n_chunks = sum(-(-len(r["tokens"]) // 16) for r in rows)
    total_in = sum(len(r["tokens"]) for r in rows)
    # rate 1.0: every chunk transformed — exactly one sentinel triple each
    for sid in (-1, -2, -3):
        assert (flat == sid).sum() == n_chunks
    assert s["tokens_out"] == total_in + 3 * n_chunks
    assert int(ex["n_tok"].sum()) == s["tokens_out"]
    # manifests record the objective
    man = json.load(open(os.path.join(out, "manifest", "part-0.json")))
    assert man["objective"] == "fim"

    # parity with the driver-side kernel composition on the same input
    from ballet_ray.stages.sequences import chunk_table, fim_table

    tbl = pa.table({"doc_id": pa.array([r["doc_id"] for r in rows]),
                    "tokens": pa.array([r["tokens"] for r in rows],
                                       pa.list_(pa.int32()))})
    want = fim_table(chunk_table(tbl, list_col="tokens", id_col="doc_id", max_len=16),
                     rate=1.0, chunk_col="chunk_id", carry_cols=("chunk_id",))
    want_multiset = sorted(tuple(x) for x in want.column("tokens").to_pylist())
    # packs concatenate chunks with span boundaries; recover the chunk
    # multiset by splitting each pack at its span offsets
    got = []
    for toks, span_lens in zip(ex["tokens"], ex["span_lens"]):
        toks, pos = list(toks), 0
        for ln in span_lens:
            got.append(tuple(toks[pos:pos + ln]))
            pos += ln
    assert sorted(got) == want_multiset

    # resume: a second run processes nothing and leaves examples identical
    s2 = _run(inp, out)
    assert s2["partitions_resumed"] == s2["partitions_total"]
    ex2 = _read_examples(out)
    assert [list(t) for t in ex2["tokens"]] == [list(t) for t in ex["tokens"]]
