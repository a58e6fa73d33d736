"""One-call corpus report (stages/report.py)."""

import numpy as np
import pandas as pd
import ray.data as rd

from ballet_ray.stages.report import corpus_report


def _corpus():
    rng = np.random.RandomState(6)
    words = [f"w{j}" for j in range(30)] + ["hot"] * 10  # 'hot' dominates draws
    rows = []
    for i in range(200):
        n = rng.randint(5, 50)
        rows.append({
            "doc_id": i,
            "text": " ".join(np.array(words, dtype=object)[rng.randint(0, len(words), n)]),
            "lang": "en" if i % 4 else "de",
            "source": f"s{i % 3}",
        })
    # plant 40 exact duplicates (doc i copies doc i-40)
    for i in range(160, 200):
        rows[i]["text"] = rows[i - 40]["text"]
    return pd.DataFrame(rows)


def test_report_fields():
    df = _corpus()
    rep = corpus_report(rd.from_pandas(df).repartition(4))
    assert rep["documents"] == 200
    exact_words = int(df["text"].str.split(" ").str.len().sum())
    assert rep["total_words"] == exact_words

    # quantiles: KLL is exact below its capacity
    lens = df["text"].str.split(" ").str.len().to_numpy()
    assert abs(rep["words_per_doc_quantiles"]["0.5"] - np.quantile(lens, 0.5)) <= 2

    # 40 planted exact duplicates of 200 docs -> ~0.2 (KMV estimate)
    assert 0.12 <= rep["approx_duplicate_fraction"] <= 0.28

    # 31 distinct words; KMV exact below capacity
    assert rep["approx_distinct_words"] == 31

    # 'hot' is ~10/40 of all draws -> must be the top word
    assert rep["top_words"][0][0] == "hot"

    # mixture is exact (cardinality far below MG capacity)
    assert rep["mixture"]["lang"] == {"en": 150, "de": 50}
    assert sum(rep["mixture"]["source"].values()) == 200


def test_report_without_group_cols():
    df = _corpus()[["doc_id", "text"]]
    rep = corpus_report(rd.from_pandas(df).repartition(2))
    assert rep["mixture"] == {}
    assert rep["documents"] == 200


def test_report_cli(tmp_path):
    import json
    import os
    import subprocess
    import sys as _sys

    _corpus().to_parquet(tmp_path / "docs.parquet")
    r = subprocess.run(
        [_sys.executable, "-m", "ballet_ray", "report", str(tmp_path / "docs.parquet")],
        capture_output=True, text=True, cwd="/root/repo",
        env={**os.environ, "RAY_ADDRESS": "local", "BALLET_RAY_NUM_CPUS": "4"},
    )
    assert r.returncode == 0, r.stderr[-2000:]
    rep = json.loads(r.stdout.strip().splitlines()[-1])
    assert rep["documents"] == 200 and rep["mixture"]["lang"]["en"] == 150
