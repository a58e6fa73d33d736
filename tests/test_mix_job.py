"""Dolma-architecture mixer (jobs/run.py --mode mix): the policy half of
--mode tag — a pandas-query expression over the attribute sidecars selects
the keep set; the corpus text is never re-scanned for signals."""

import json
import os
import subprocess
import sys

import numpy as np
import pandas as pd
import pytest


def _run(mode, inp, out, *extra):
    r = subprocess.run(
        [sys.executable, "jobs/run.py", "--mode", mode, "--input", inp,
         "--out", out, "--num-cpus", "4", *extra],
        capture_output=True, text=True, cwd="/root/repo",
        env={**os.environ, "RAY_ADDRESS": "local"},
    )
    assert r.returncode == 0, r.stderr[-3000:]
    return json.loads(r.stdout.strip().splitlines()[-1])


@pytest.mark.slow
def test_mix_policy_over_attributes(tmp_path):
    import pyarrow.parquet as pq

    rng = np.random.default_rng(11)
    words = [f"w{j}" for j in range(60)] + ["the", "and", "of", "to"]
    texts = [" ".join(rng.choice(words, 50)) + ". The end of it."
             for _ in range(70)]
    # plant 10 degenerate docs the policy must drop (word repetition)
    texts += ["spam spam spam spam spam spam spam spam"] * 10
    df = pd.DataFrame({"doc_id": np.arange(80), "text": texts})
    inp = tmp_path / "docs.parquet"
    df.to_parquet(inp)

    tag_out = str(tmp_path / "tagged")
    s = _run("tag", str(inp), tag_out)
    assert s["rows_out"] == 80
    attrs_dir = os.path.join(tag_out, "attributes")

    # policy over two sidecar columns; expected keep set computed from the
    # sidecar itself (the job must agree with a driver-side pandas apply)
    policy = "dup_word_frac <= 0.5 and words >= 40"
    adf = pq.read_table(attrs_dir).to_pandas()
    expect = set(adf.query(policy).doc_id.tolist())
    assert 0 < len(expect) < 80  # policy actually bites both ways

    mix_out = str(tmp_path / "mixed")
    s2 = _run("mix", str(inp), mix_out, "--attributes", attrs_dir,
              "--policy", policy)
    assert s2["docs_in"] == 80
    assert s2["docs_kept"] == len(expect)
    got = pq.read_table(os.path.join(mix_out, "mixed"))
    assert set(got.to_pandas().doc_id.tolist()) == expect
    # the mixed output carries the corpus text for kept docs
    assert "text" in got.column_names

    # a policy referencing no attribute column fails loudly
    r = subprocess.run(
        [sys.executable, "jobs/run.py", "--mode", "mix", "--input", str(inp),
         "--out", str(tmp_path / "bad"), "--num-cpus", "4",
         "--attributes", attrs_dir, "--policy", "nonexistent > 1"],
        capture_output=True, text=True, cwd="/root/repo",
        env={**os.environ, "RAY_ADDRESS": "local"},
    )
    assert r.returncode != 0
    assert "no attribute column" in (r.stderr + r.stdout)


@pytest.mark.slow
def test_tag_spans_then_mix_redacts(tmp_path):
    import pyarrow.parquet as pq

    rng = np.random.default_rng(13)
    words = [f"w{j}" for j in range(60)] + ["the", "and", "of", "to"]
    texts = [" ".join(rng.choice(words, 50)) + ". The end of it."
             for _ in range(30)]
    texts[0] += " mail bob@example.com now"
    texts[1] += " also alice@test.org and 10.0.0.1"
    df = pd.DataFrame({"doc_id": np.arange(30), "text": texts})
    inp = tmp_path / "docs.parquet"
    df.to_parquet(inp)

    tag_out = str(tmp_path / "tagged")
    s = _run("tag", str(inp), tag_out, "--tag-spans")
    assert s["rows_out"] == 30
    attrs_dir = os.path.join(tag_out, "attributes")
    adf = pq.read_table(attrs_dir).to_pandas()
    assert "text_emails_spans" in adf.columns
    assert len(adf.loc[adf.doc_id == 0, "text_emails_spans"].iloc[0]) == 2

    mix_out = str(tmp_path / "mixed")
    s2 = _run("mix", str(inp), mix_out, "--attributes", attrs_dir,
              "--policy", "words >= 1",
              "--apply-spans", "text_emails_spans,text_ip_addresses_spans",
              "--span-repl", "<PII>")
    assert s2["docs_kept"] == 30
    got = pq.read_table(os.path.join(mix_out, "mixed")).to_pandas()
    t0 = got.loc[got.doc_id == 0, "text"].iloc[0]
    t1 = got.loc[got.doc_id == 1, "text"].iloc[0]
    assert "bob@example.com" not in t0 and t0.endswith("mail <PII> now")
    assert "alice@test.org" not in t1 and "10.0.0.1" not in t1
    assert t1.count("<PII>") == 2
    # span columns are consumed, not emitted; untouched docs byte-identical
    assert "text_emails_spans" not in got.columns
    assert got.loc[got.doc_id == 5, "text"].iloc[0] == texts[5]

    # unknown span column fails loudly
    r = subprocess.run(
        [sys.executable, "jobs/run.py", "--mode", "mix", "--input", str(inp),
         "--out", str(tmp_path / "bad"), "--num-cpus", "4",
         "--attributes", attrs_dir, "--policy", "words >= 1",
         "--apply-spans", "nope_spans"],
        capture_output=True, text=True, cwd="/root/repo",
        env={**os.environ, "RAY_ADDRESS": "local"},
    )
    assert r.returncode != 0 and "not in attributes" in (r.stderr + r.stdout)
