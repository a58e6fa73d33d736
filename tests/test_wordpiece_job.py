"""WordPiece artifact through the ingest job's --tokenizer path (the
third accepted tokenizer class): ids bounded by the artifact vocab and
the encode matches the driver-side per-word reference."""

import json
import os
import subprocess
import sys

import numpy as np
import pandas as pd
import pytest


def _docs(n=50, seed=3):
    words = [f"w{j}" for j in range(80)]
    rows = []
    for i in range(n):
        rng = np.random.RandomState(seed + i)
        rows.append({"doc_id": i, "text": " ".join(rng.choice(words, 40)),
                     "source": "web"})
    return pd.DataFrame(rows)


@pytest.mark.slow
def test_ingest_with_wordpiece_artifact(tmp_path, ray_session):
    import pyarrow.parquet as pq
    import ray.data as rd

    from ballet_ray.stages.wordpiece import train_wordpiece
    from ballet_ray.state.persist import save_artifact

    df = _docs()
    inp = tmp_path / "docs.parquet"
    df.to_parquet(inp)

    tok = train_wordpiece(rd.from_pandas(df), vocab_size=150)
    art = str(tmp_path / "wp.pkl")
    save_artifact(tok, art)

    out = str(tmp_path / "out")
    r = subprocess.run(
        [sys.executable, "jobs/run.py", "--mode", "ingest", "--input",
         str(inp), "--out", out, "--num-cpus", "4", "--max-len", "16",
         "--pack-len", "64", "--rows-per-shard", "20", "--min-words", "1",
         "--tokenizer", art],
        capture_output=True, text=True, cwd="/root/repo",
        env={**os.environ, "RAY_ADDRESS": "local"},
    )
    assert r.returncode == 0, r.stderr[-3000:]
    s = json.loads(r.stdout.strip().splitlines()[-1])
    assert s["docs_kept"] > 0

    tokens_dir = os.path.join(out, "tokens")
    files = [f for f in os.listdir(tokens_dir) if f.endswith(".parquet")]
    got = {}
    for f in files:
        t = pq.read_table(os.path.join(tokens_dir, f),
                          columns=["doc_id", "tokens"])
        got.update(zip(t["doc_id"].to_pylist(),
                       (list(x) for x in t["tokens"].to_pylist())))
    assert got
    for did, ids in got.items():
        text = df.loc[df.doc_id == did, "text"].iloc[0]
        want = [i for w in text.split(" ") for i in tok.encode_word(w)]
        assert ids == want, did
