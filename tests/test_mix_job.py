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
