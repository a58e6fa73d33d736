"""WARC input for the ingest/curate jobs (--input-format warc): crawl
archives → HtmlToText → apex-domain source → the same downstream stages
as the parquet path, end to end in a subprocess."""

import json
import os
import subprocess
import sys

import numpy as np
import pytest

from ballet_ray.sources.warc import write_warc


def _pages(tmp_path, n=60, shards=3):
    """Record-gzipped WARC shards of HTML pages with dedup-proof word
    salads (40 distinct-ish words each, below every Gopher threshold)."""
    words = [f"w{j}" for j in range(80)]
    os.makedirs(tmp_path, exist_ok=True)
    for shard in range(shards):
        recs = []
        for i in range(shard, n, shards):
            rng = np.random.RandomState(7 + i)
            body = " ".join(rng.choice(words, 40, replace=False))
            recs.append({
                "target_uri": f"HTTPS://Site{i % 5}.Example.ORG:443/p/{i}",
                "payload": (f"<html><body><h1>t</h1><p>{body}</p>"
                            f"</body></html>").encode(),
            })
        write_warc(str(tmp_path / f"part-{shard}.warc.gz"), recs,
                   gzip_per_record=True)
    return n


def _run(mode, inp, out, *extra):
    r = subprocess.run(
        [sys.executable, "jobs/run.py", "--mode", mode, "--input", inp,
         "--out", out, "--num-cpus", "4", "--input-format", "warc",
         "--max-len", "16", "--pack-len", "64", *extra],
        capture_output=True, text=True, cwd="/root/repo",
        env={**os.environ, "RAY_ADDRESS": "local"},
    )
    assert r.returncode == 0, r.stderr[-3000:]
    return json.loads(r.stdout.strip().splitlines()[-1])


@pytest.mark.slow
def test_curate_from_warc(tmp_path):
    n = _pages(tmp_path / "warc")
    s = _run("curate", str(tmp_path / "warc"), str(tmp_path / "out"),
             "--rows-per-shard", "20")
    st = s["stages"]
    assert st["clean"]["docs_in"] == n
    # all pages are distinct word salads over clean HTML: none lost
    assert st["clean"]["rows_out"] == n
    assert st["pack"]["packs"] > 0
    # the mixing group came from the apex domain — check the mix stage ran
    # over real groups (source column = example.org for every page here)
    assert st["mix"]["rows_out"] > 0

    # identical rerun resumes every stage
    s2 = _run("curate", str(tmp_path / "warc"), str(tmp_path / "out"),
              "--rows-per-shard", "20")
    assert all(s2["stages"][k].get("resumed")
               for k in ("clean", "lm", "mix", "tokens"))


@pytest.mark.slow
def test_ingest_from_warc_and_replay_suppression(tmp_path):
    _pages(tmp_path / "warc", n=40)
    out = str(tmp_path / "out")
    s1 = _run("ingest", str(tmp_path / "warc"), out)
    assert s1["docs_in"] == 40
    assert s1["docs_kept"] == 40  # distinct salads: nothing suppressed
    assert s1["pack"]["packs"] > 0

    # day-2 replay of the SAME archives: the checkpointed Bloom index
    # suppresses everything (WARC doc_ids are content-stable record hashes)
    s2 = _run("ingest", str(tmp_path / "warc"), out)
    assert s2["bloom_restored"] is True
    assert s2["docs_kept"] == 0


@pytest.mark.slow
def test_curate_block_domains(tmp_path):
    """--block-domains over the source column: parquet input with plain
    source labels (the documented degenerate case: exact label match)."""
    import pandas as pd

    words = [f"w{j}" for j in range(80)]
    rows = []
    for i in range(45):
        rng = np.random.RandomState(11 + i)
        rows.append({"doc_id": i,
                     "text": " ".join(rng.choice(words, 40, replace=False)),
                     "source": ["web", "books", "spam.example"][i % 3]})
    inp = tmp_path / "docs.parquet"
    pd.DataFrame(rows).to_parquet(inp)
    bl = tmp_path / "blocklist.txt"
    bl.write_text("# fixture blocklist\nspam.example\n")

    r = subprocess.run(
        [sys.executable, "jobs/run.py", "--mode", "curate", "--input",
         str(inp), "--out", str(tmp_path / "out"), "--num-cpus", "4",
         "--max-len", "16", "--pack-len", "64", "--rows-per-shard", "20",
         "--block-domains", str(bl)],
        capture_output=True, text=True, cwd="/root/repo",
        env={**os.environ, "RAY_ADDRESS": "local"},
    )
    assert r.returncode == 0, r.stderr[-3000:]
    s = json.loads(r.stdout.strip().splitlines()[-1])
    # 15 of 45 docs carry the blocked source; docs_in is post-blocklist
    assert s["stages"]["clean"]["docs_in"] == 30
    assert s["stages"]["clean"]["rows_out"] == 30


def test_warc_rejected_for_pack_mode(tmp_path):
    r = subprocess.run(
        [sys.executable, "jobs/run.py", "--mode", "pack", "--input", "x",
         "--out", str(tmp_path / "o"), "--input-format", "warc"],
        capture_output=True, text=True, cwd="/root/repo",
    )
    assert r.returncode != 0
    assert "ingest/curate" in r.stderr


def _wet_pages(tmp_path, n=40, shards=2):
    """WET shards (conversion records of pre-extracted plain text)."""
    words = [f"w{j}" for j in range(80)]
    os.makedirs(tmp_path, exist_ok=True)
    for shard in range(shards):
        recs = []
        for i in range(shard, n, shards):
            rng = np.random.RandomState(11 + i)
            body = " ".join(rng.choice(words, 40, replace=False))
            recs.append({
                "target_uri": f"https://site{i % 5}.example.org/p/{i}",
                "payload": body.encode(),
                "warc_type": "conversion",
            })
        write_warc(str(tmp_path / f"part-{shard}.wet.gz"), recs,
                   gzip_per_record=True)
    return n


@pytest.mark.slow
def test_curate_from_wet(tmp_path):
    """--input-format wet: Common Crawl extracted text straight into the
    curate chain (no HTML strip), apex-domain source groups intact."""
    n = _wet_pages(tmp_path / "wet")
    r = subprocess.run(
        [sys.executable, "jobs/run.py", "--mode", "curate",
         "--input", str(tmp_path / "wet"), "--out", str(tmp_path / "out"),
         "--num-cpus", "4", "--input-format", "wet",
         "--max-len", "16", "--pack-len", "64", "--rows-per-shard", "20"],
        capture_output=True, text=True, cwd="/root/repo",
        env={**os.environ, "RAY_ADDRESS": "local"},
    )
    assert r.returncode == 0, r.stderr[-3000:]
    s = json.loads(r.stdout.strip().splitlines()[-1])
    st = s["stages"]
    assert st["clean"]["docs_in"] == n
    assert st["clean"]["rows_out"] == n  # distinct word salads: none lost
    assert st["pack"]["packs"] > 0
