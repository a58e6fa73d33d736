"""Dolma-architecture attribute tagging job (jobs/run.py --mode tag):
taggers write per-doc signal sidecars, never the text; policy is a
separate decision over cheap attribute files."""

import json
import os
import subprocess
import sys

import numpy as np
import pandas as pd
import pytest


def _run(inp, out, *extra):
    r = subprocess.run(
        [sys.executable, "jobs/run.py", "--mode", "tag", "--input", inp,
         "--out", out, "--num-cpus", "4", *extra],
        capture_output=True, text=True, cwd="/root/repo",
        env={**os.environ, "RAY_ADDRESS": "local"},
    )
    assert r.returncode == 0, r.stderr[-3000:]
    return json.loads(r.stdout.strip().splitlines()[-1])


@pytest.mark.slow
def test_tag_attributes_sidecar(tmp_path):
    import pyarrow.parquet as pq

    rng = np.random.default_rng(5)
    words = [f"w{j}" for j in range(60)] + ["the", "and", "of", "to"]
    df = pd.DataFrame({
        "doc_id": np.arange(80),
        "text": [" ".join(rng.choice(words, 50)) + ". The end of it."
                 for _ in range(80)],
    })
    inp = tmp_path / "docs.parquet"
    df.to_parquet(inp)
    out = str(tmp_path / "out")

    s = _run(str(inp), out)
    assert s["docs_in"] == s["rows_out"] == 80 and s["ppl"] is False

    attrs_dir = os.path.join(out, "attributes")
    files = [f for f in os.listdir(attrs_dir) if f.endswith(".parquet")]
    t = pq.read_table(attrs_dir)
    cols = set(t.column_names)
    assert files and len(t) == 80
    # the sidecar carries signals, never the corpus text
    assert "text" not in cols
    for c in ("doc_id", "words", "quality", "dup_word_frac",
              "dup_line_frac", "bullet_line_frac", "text_n_pii",
              "pred_lang", "stop_frac"):
        assert c in cols, c
    pdf = t.to_pandas()
    # stop words planted in every doc: language resolves and words count
    assert (pdf.pred_lang == "en").all()
    assert (pdf.words >= 50).all()

    # --tag-ppl adds the corpus-fit LM perplexity columns
    s2 = _run(str(inp), str(tmp_path / "out2"), "--tag-ppl")
    assert s2["ppl"] is True and s2["rows_out"] == 80
    t2 = pq.read_table(os.path.join(str(tmp_path / "out2"), "attributes"))
    assert {"ppl", "logprob"} <= set(t2.column_names)
    assert "text" not in t2.column_names
