"""CCNet head/middle/tail perplexity selection in the curate job
(--ppl-buckets): rank docs by LM score within the mixture group, cut the
ranking into thirds, keep the named buckets (Wenzek 2020 §3.3)."""

import json
import os
import subprocess
import sys

import numpy as np
import pandas as pd
import pytest


def _docs(n=90, seed=3):
    words = [f"w{j}" for j in range(80)]
    rows = []
    for i in range(n):
        rng = np.random.RandomState(seed + i)
        text = " ".join(rng.choice(words, 40))
        rows.append({"doc_id": i, "text": text,
                     "source": "web" if i % 3 else "books"})
    return pd.DataFrame(rows)


def _run(inp, out, *extra):
    r = subprocess.run(
        [sys.executable, "jobs/run.py", "--mode", "curate", "--input", inp,
         "--out", out, "--num-cpus", "4", "--max-len", "16",
         "--pack-len", "64", "--rows-per-shard", "20", "--dedup", "none",
         "--mix", "none", *extra],
        capture_output=True, text=True, cwd="/root/repo",
        env={**os.environ, "RAY_ADDRESS": "local"},
    )
    return r


@pytest.mark.slow
def test_ppl_buckets_head_middle(tmp_path):
    import pyarrow.parquet as pq

    inp = tmp_path / "docs.parquet"
    df = _docs()
    df.to_parquet(inp)

    out = str(tmp_path / "out")
    r = _run(str(inp), out, "--stop-after", "lm", "--lm", "bigram",
             "--ppl-buckets", "head,middle")
    assert r.returncode == 0, r.stderr[-3000:]
    s = json.loads(r.stdout.strip().splitlines()[-1])
    n_clean = s["stages"]["clean"]["rows_out"]
    n_lm = s["stages"]["lm"]["rows_out"]
    assert s["stages"]["lm"]["lm_threshold"] == "head,middle"

    lm = pq.read_table(os.path.join(out, "lm")).to_pandas()
    assert len(lm) == n_lm
    assert set(lm.ppl_bucket) <= {"head", "middle"}

    # reference: per-source PERCENT_RANK over ppl, thirds cut — the kept
    # set is exactly the docs whose within-group rank falls before 2/3
    full = _run(str(inp), str(tmp_path / "full"), "--stop-after", "lm",
                "--lm", "bigram", "--ppl-buckets", "head,middle,tail")
    assert full.returncode == 0, full.stderr[-3000:]
    allb = pq.read_table(os.path.join(str(tmp_path / "full"), "lm")).to_pandas()
    assert len(allb) == n_clean  # keeping every bucket = no filter

    def pct_rank(g):
        r = g["ppl"].rank(method="min") - 1
        n = len(g)
        return r / (n - 1) if n > 1 else r * 0.0

    pr = allb.groupby("source", group_keys=False)[["ppl", "doc_id", "source"]].apply(
        lambda g: g.assign(pr=pct_rank(g)))
    want = set(pr.loc[pr.pr < 2.0 / 3, "doc_id"])
    assert set(lm.doc_id) == want
    # and the bucket labels agree with the thirds rule
    lab = np.where(pr.pr < 1.0 / 3, "head",
                   np.where(pr.pr < 2.0 / 3, "middle", "tail"))
    want_lab = dict(zip(pr.doc_id, lab))
    got_lab = dict(zip(allb.doc_id, allb.ppl_bucket))
    assert got_lab == want_lab

    # bad bucket list fails loudly
    bad = _run(str(inp), str(tmp_path / "bad"), "--ppl-buckets", "best")
    assert bad.returncode != 0
    assert "head/middle/tail" in (bad.stderr + bad.stdout)


@pytest.mark.slow
def test_ppl_buckets_kn_lm(tmp_path):
    """--lm kn routes the CCNet selection through the interpolated
    Kneser-Ney trigram scorer (score values parity-tested in
    tests/test_knlm.py; here: the job's ranking/keep set is internally
    consistent with its own all-buckets run)."""
    import pyarrow.parquet as pq

    inp = tmp_path / "docs.parquet"
    df = _docs(n=60)
    df.to_parquet(inp)

    full = _run(str(inp), str(tmp_path / "full"), "--stop-after", "lm",
                "--lm", "kn", "--ppl-buckets", "head,middle,tail")
    assert full.returncode == 0, full.stderr[-3000:]
    allb = pq.read_table(os.path.join(str(tmp_path / "full"), "lm")).to_pandas()

    r = _run(str(inp), str(tmp_path / "out"), "--stop-after", "lm",
             "--lm", "kn", "--ppl-buckets", "head")
    assert r.returncode == 0, r.stderr[-3000:]
    lm = pq.read_table(os.path.join(str(tmp_path / "out"), "lm")).to_pandas()
    assert set(lm.ppl_bucket) == {"head"}

    def pct_rank(g):
        rk = g["ppl"].rank(method="min") - 1
        n = len(g)
        return rk / (n - 1) if n > 1 else rk * 0.0

    pr = allb.groupby("source", group_keys=False)[["ppl", "doc_id", "source"]].apply(
        lambda g: g.assign(pr=pct_rank(g)))
    want = set(pr.loc[pr.pr < 1.0 / 3, "doc_id"])
    assert set(lm.doc_id) == want


@pytest.mark.slow
def test_redact_pii_in_clean_stage(tmp_path):
    import pyarrow.parquet as pq

    df = _docs(n=40)
    df.loc[0, "text"] += " contact bob@example.com or 12345678"
    df.loc[1, "text"] += " visit https://example.com/x now"
    inp = tmp_path / "docs.parquet"
    df.to_parquet(inp)

    out = str(tmp_path / "out")
    r = _run(str(inp), out, "--stop-after", "clean", "--redact-pii",
             "--ppl-keep", "1.0")
    assert r.returncode == 0, r.stderr[-3000:]
    clean = pq.read_table(os.path.join(out, "clean")).to_pandas()
    t0 = clean.loc[clean.doc_id == 0, "text"].iloc[0]
    t1 = clean.loc[clean.doc_id == 1, "text"].iloc[0]
    assert "<EMAIL>" in t0 and "<NUM>" in t0 and "bob@example.com" not in t0
    assert "<URL>" in t1 and "https://example.com/x" not in t1
    # untouched docs pass through byte-identical
    t5 = clean.loc[clean.doc_id == 5, "text"].iloc[0]
    assert t5 == df.loc[5, "text"]


@pytest.mark.slow
def test_decontaminate_in_clean_stage(tmp_path):
    import pyarrow.parquet as pq

    df = _docs(n=40)
    # doc 0 becomes an exact copy of an eval doc (hit_frac 1.0); doc 1
    # shares a prefix but is mostly clean (frac below the 0.7 bar)
    eval_df = pd.DataFrame({
        "doc_id": [900],
        "text": [" ".join(f"e{i}" for i in range(20))],
    })
    df.loc[0, "text"] = eval_df.text.iloc[0]
    df.loc[1, "text"] = " ".join(f"e{i}" for i in range(8)) + " " + df.loc[1, "text"]
    inp = tmp_path / "docs.parquet"
    ev = tmp_path / "eval.parquet"
    df.to_parquet(inp)
    eval_df.to_parquet(ev)

    out = str(tmp_path / "out")
    r = _run(str(inp), out, "--stop-after", "clean", "--ppl-keep", "1.0",
             "--decontaminate", str(ev))
    assert r.returncode == 0, r.stderr[-3000:]
    clean = pq.read_table(os.path.join(out, "clean")).to_pandas()
    assert 0 not in set(clean.doc_id)        # fully contaminated -> dropped
    assert 1 in set(clean.doc_id)            # partial overlap under 0.7 kept
    s = json.loads(r.stdout.strip().splitlines()[-1])
    assert s["stages"]["clean"]["rows_out"] == len(clean) == 39
