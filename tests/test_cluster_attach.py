"""Cluster-attach deployment shape: `ray start --head` then run the job
with RAY_ADDRESS=<host:port> — the single-node-expressible equivalent of
`ray job submit` onto a standing cluster (this sandbox's ray install is
minimal-mode: the dashboard HTTP server that `ray job submit` talks to is
disabled, so attach-by-address is the testable path; on a real cluster the
same entrypoint runs unchanged under the job submission API)."""

import json
import os
import shutil
import subprocess
import sys

import numpy as np
import pandas as pd
import pytest

PORT = 6391
TEMP = "/tmp/ballet_ray_attach_head"


@pytest.mark.slow
def test_job_attaches_to_running_cluster(tmp_path):
    rows = []
    for i in range(40):
        rng = np.random.RandomState(i)
        rows.append({"doc_id": i,
                     "text": " ".join(rng.choice(
                         [f"w{j}" for j in range(80)], 40)),
                     "source": "web" if i % 3 else "books"})
    inp = tmp_path / "docs.parquet"
    pd.DataFrame(rows).to_parquet(inp)

    # dedicated --temp-dir so teardown can kill THIS head's processes by
    # cmdline match — `ray stop` is global and would take down the pytest
    # session's own Ray instance
    up = subprocess.run(
        ["ray", "start", "--head", "--num-cpus", "4",
         "--disable-usage-stats", "--port", str(PORT), "--temp-dir", TEMP],
        capture_output=True, text=True,
        env={k: v for k, v in os.environ.items() if k != "RAY_ADDRESS"},
    )
    assert up.returncode == 0, up.stderr[-2000:]
    try:
        r = subprocess.run(
            [sys.executable, "jobs/run.py", "--mode", "curate",
             "--input", str(inp), "--out", str(tmp_path / "out"),
             "--max-len", "16", "--pack-len", "64",
             "--rows-per-shard", "20"],
            capture_output=True, text=True, cwd="/root/repo",
            env={**os.environ, "RAY_ADDRESS": f"127.0.0.1:{PORT}"},
        )
        assert r.returncode == 0, r.stderr[-3000:]
        s = json.loads(r.stdout.strip().splitlines()[-1])
        assert s["stages"]["clean"]["docs_in"] == 40
        assert s["stages"]["pack"]["packs"] > 0
    finally:
        subprocess.run(["pkill", "-9", "-f", TEMP], capture_output=True)
        shutil.rmtree(TEMP, ignore_errors=True)
