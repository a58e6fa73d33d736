"""End-to-end ingest job (jobs/run.py --mode ingest): bloom dedup →
quality filter → tokenize → resumable pack, with incremental replay
suppression via the checkpointed bloom state."""

import json
import os
import subprocess
import sys

import numpy as np
import pandas as pd
import pytest


def _docs(ids, seed=3):
    rng = np.random.RandomState(seed)
    words = [f"w{j}" for j in range(80)]  # wide vocab: passes the Gopher repetition thresholds
    rows = []
    for i in ids:
        rng2 = np.random.RandomState(seed + i)
        text = " ".join(rng2.choice(words, 40))
        rows.append({"doc_id": i, "text": text})
    return pd.DataFrame(rows)


def _run(inp, out, *extra):
    r = subprocess.run(
        [sys.executable, "jobs/run.py", "--mode", "ingest", "--input", inp,
         "--out", out, "--num-cpus", "4", "--max-len", "16", "--pack-len", "64",
         "--bloom-bits", str(1 << 20), *extra],
        capture_output=True, text=True, cwd="/root/repo",
        env={**os.environ, "RAY_ADDRESS": "local"},
    )
    assert r.returncode == 0, r.stderr[-3000:]
    return json.loads(r.stdout.strip().splitlines()[-1])


@pytest.mark.slow
def test_ingest_incremental(tmp_path):
    day1 = tmp_path / "day1.parquet"
    _docs(range(40)).to_parquet(day1)
    out = str(tmp_path / "out")

    s1 = _run(str(day1), out)
    assert s1["docs_in"] == 40
    assert 0 < s1["docs_kept"] <= 40
    assert s1["bloom_restored"] is False
    assert s1["pack"]["packs"] > 0

    # pure replay: everything suppressed by the restored index
    s2 = _run(str(day1), out)
    assert s2["bloom_restored"] is True
    assert s2["docs_kept"] == 0
    assert s2["pack"]["packs"] == 0

    # day 2 = replayed docs + genuinely new ones -> only the new survive
    day2 = tmp_path / "day2.parquet"
    pd.concat([_docs(range(40)), _docs(range(100, 120))]).to_parquet(day2)
    s3 = _run(str(day2), out)
    assert s3["bloom_restored"] is True
    assert 0 < s3["docs_kept"] <= 20


@pytest.mark.slow
def test_ingest_no_probe_loss(tmp_path):
    """Every doc unique and quality-passing -> docs_kept must equal docs_in
    EXACTLY. Guards the probe-suppression bug: when the stateful Bloom
    stage sat upstream of the pipeline fit, the fit's schema probe
    (ds.schema(fetch_if_missing=True) -> limit(1) execution) inserted some
    blocks' hashes a first time and the real run silently dropped them."""
    rows = [{"doc_id": i, "text": " ".join(f"u{i}w{j}" for j in range(40))}
            for i in range(50)]
    inp = tmp_path / "in.parquet"
    pd.DataFrame(rows).to_parquet(inp)
    s = _run(str(inp), str(tmp_path / "out"))
    assert s["docs_in"] == 50
    assert s["docs_kept"] == 50


@pytest.mark.slow
def test_ingest_token_decontamination(tmp_path):
    """--decontam-tokens drops docs whose token-window hit fraction vs a
    pre-tokenized eval set reaches the threshold — applied at the tokens-
    parquet boundary, so the pack output shrinks by exactly those docs."""
    src = tmp_path / "corpus.parquet"
    _docs(range(30)).to_parquet(src)

    out1 = str(tmp_path / "o1")
    s1 = _run(str(src), out1)
    toks = pd.read_parquet(os.path.join(out1, "tokens"))
    evil = toks.sort_values("doc_id").head(3)
    eval_p = tmp_path / "eval.parquet"
    evil[["doc_id", "tokens"]].to_parquet(eval_p)

    out2 = str(tmp_path / "o2")
    s2 = _run(str(src), out2, "--decontam-tokens", str(eval_p))
    assert s2["docs_decontaminated"] == 3
    assert s2["docs_kept"] == s1["docs_kept"]  # counted before decon
    kept = pd.read_parquet(os.path.join(out2, "tokens_clean"))
    assert set(kept.doc_id) == set(toks.doc_id) - set(evil.doc_id)
    assert s2["pack"]["tokens_out"] < s1["pack"]["tokens_out"]

    # partial overlap below the threshold is KEPT: an eval doc sharing
    # only a short run with a corpus doc must not nuke it
    partial = toks.sort_values("doc_id").iloc[5]
    frag = np.asarray(partial["tokens"])[:10]  # 3 windows out of ~33
    eval2 = tmp_path / "eval2.parquet"
    pd.DataFrame({"doc_id": [0], "tokens": [frag]}).to_parquet(eval2)
    out3 = str(tmp_path / "o3")
    s3 = _run(str(src), out3, "--decontam-tokens", str(eval2))
    assert s3["docs_decontaminated"] == 0
