"""Composed curation flagship job (jobs/run.py --mode curate): line dedup
→ near-dedup → Gopher filter → bigram-ppl filter → mixture sampling →
global shuffle index → tokenize → resumable chunk+pack, with per-stage
lineage manifests. A clean run and a stop-after/resumed run must produce
byte-identical packs (every selection is hash-priority deterministic and
the token shard layout depends only on row count + rows_per_shard)."""

import hashlib
import json
import os
import subprocess
import sys

import numpy as np
import pandas as pd
import pytest


def _docs(ids, seed=3):
    rng_words = [f"w{j}" for j in range(80)]
    rows = []
    for i in ids:
        rng = np.random.RandomState(seed + i)
        text = " ".join(rng.choice(rng_words, 40))
        rows.append({"doc_id": i, "text": text,
                     "source": "web" if i % 3 else "books"})
    return pd.DataFrame(rows)


def _run(inp, out, *extra):
    r = subprocess.run(
        [sys.executable, "jobs/run.py", "--mode", "curate", "--input", inp,
         "--out", out, "--num-cpus", "4", "--max-len", "16", "--pack-len", "64",
         "--rows-per-shard", "20", *extra],
        capture_output=True, text=True, cwd="/root/repo",
        env={**os.environ, "RAY_ADDRESS": "local"},
    )
    assert r.returncode == 0, r.stderr[-3000:]
    return json.loads(r.stdout.strip().splitlines()[-1])


def _pack_digest(out_dir):
    import pyarrow.parquet as pq

    ex = os.path.join(out_dir, "packs", "examples")
    files = sorted(os.listdir(ex))
    h = hashlib.sha256()
    for f in files:
        t = pq.read_table(os.path.join(ex, f))
        for c in sorted(t.column_names):
            h.update(str(t.column(c).to_pylist()).encode())
    return files, h.hexdigest()


@pytest.mark.slow
def test_curate_clean_vs_resumed_identical(tmp_path):
    inp = tmp_path / "docs.parquet"
    # plant exact dups (same text, new ids) so the dedup stages bite
    base = _docs(range(60))
    dups = base.head(6).assign(doc_id=lambda d: d.doc_id + 1000)
    pd.concat([base, dups]).to_parquet(inp)

    out_a = str(tmp_path / "a")
    s_a = _run(str(inp), out_a)
    st = s_a["stages"]
    assert st["clean"]["docs_in"] == 66
    # the 6 planted dup ids lose to their originals (min-id winner)
    assert 0 < st["clean"]["rows_out"] <= 60
    assert st["lm"]["rows_out"] <= st["clean"]["rows_out"]
    assert st["lm"]["lm_threshold"] is not None
    assert 0 < st["mix"]["rows_out"] <= st["lm"]["rows_out"]
    assert st["tokens"]["rows_out"] == st["mix"]["rows_out"]
    assert st["pack"]["packs"] > 0

    # pure resume: every stage skipped, zero pack work
    s_a2 = _run(str(inp), out_a)
    assert all(s_a2["stages"][k].get("resumed") for k in
               ("clean", "lm", "mix", "tokens"))
    assert s_a2["stages"]["pack"]["partitions_processed"] == 0
    assert s_a2["wall_s_total"] < 5

    # interrupted run (checkpoint after lm) + rerun == clean run's packs
    out_b = str(tmp_path / "b")
    s_b1 = _run(str(inp), out_b, "--stop-after", "lm")
    assert s_b1["stopped_after"] == "lm"
    assert "mix" not in s_b1["stages"]
    s_b2 = _run(str(inp), out_b)
    assert s_b2["stages"]["clean"].get("resumed")
    assert s_b2["stages"]["lm"].get("resumed")
    assert "resumed" not in s_b2["stages"]["mix"]

    files_a, dig_a = _pack_digest(out_a)
    files_b, dig_b = _pack_digest(out_b)
    assert files_a == files_b
    assert dig_a == dig_b


@pytest.mark.slow
def test_curate_dedup_keep_longest(tmp_path):
    """--dedup-keep longest: the surviving near-dup cluster member is the
    LONGEST copy (here the higher id), not the min id; default min_id keeps
    the representative."""
    import pyarrow.parquet as pq

    base = _docs(range(20))
    long_copy = base[base.doc_id == 5].assign(
        doc_id=1005, text=lambda d: d.text + " zz yy xx ww vv"
    )
    df = pd.concat([base, long_copy], ignore_index=True)

    def clean_ids(out_dir, *extra):
        inp = tmp_path / f"in_{len(extra)}.parquet"
        df.to_parquet(inp)
        r = subprocess.run(
            [sys.executable, "jobs/run.py", "--mode", "curate",
             "--input", str(inp), "--out", out_dir, "--num-cpus", "4",
             "--min-words", "5", "--stop-after", "clean", *extra],
            capture_output=True, text=True, cwd="/root/repo",
            env={**os.environ, "RAY_ADDRESS": "local"},
        )
        assert r.returncode == 0, r.stderr[-3000:]
        kept = pq.read_table(os.path.join(out_dir, "clean"), columns=["doc_id"])
        return set(kept.column("doc_id").to_pylist())

    ids_longest = clean_ids(str(tmp_path / "o1"), "--dedup-keep", "longest")
    assert 1005 in ids_longest and 5 not in ids_longest
    ids_default = clean_ids(str(tmp_path / "o2"))
    assert 5 in ids_default and 1005 not in ids_default
    # everything else identical between the two retention policies
    assert ids_longest - {1005} == ids_default - {5}


def test_curate_unimax_mix(tmp_path):
    """--mix unimax: the mix stage keeps exactly the water-fill selection
    over the lm-stage survivors (recomputed independently here from the
    lm parquet + the library's hash priorities)."""
    import pyarrow.parquet as pq

    from ballet_ray.stages.sampling import _priority_u, unimax_rates

    inp = tmp_path / "docs.parquet"
    _docs(range(90)).to_parquet(inp)
    out = str(tmp_path / "o")
    r = subprocess.run(
        [sys.executable, "jobs/run.py", "--mode", "curate", "--input",
         str(inp), "--out", out, "--num-cpus", "4", "--min-words", "5",
         "--mix", "unimax", "--mix-total", "40", "--stop-after", "mix"],
        capture_output=True, text=True, cwd="/root/repo",
        env={**os.environ, "RAY_ADDRESS": "local"},
    )
    assert r.returncode == 0, r.stderr[-3000:]

    lm = pq.read_table(os.path.join(out, "lm")).to_pandas()
    mixed = pq.read_table(os.path.join(out, "mix")).to_pandas()
    assert "epoch" not in mixed.columns  # cap-1 form: no expansion column

    import ray.data as rd

    rates = unimax_rates(rd.from_pandas(lm), group_col="source", budget=40.0,
                         max_epochs=1.0)
    u = _priority_u(lm["doc_id"].to_numpy(), "curate", "siphash")
    want = set(lm.loc[u < lm["source"].map(rates).to_numpy(), "doc_id"])
    assert set(mixed["doc_id"]) == want
    # the smaller source is below the water level → kept whole
    by = lm.groupby("source").size()
    small = by.idxmin()
    if by[small] <= 40 / len(by):
        assert rates[small] == 1.0

    # --mix unimax without a budget fails loudly
    r2 = subprocess.run(
        [sys.executable, "jobs/run.py", "--mode", "curate", "--input",
         str(inp), "--out", str(tmp_path / "o2"), "--num-cpus", "4",
         "--min-words", "5", "--mix", "unimax", "--stop-after", "mix"],
        capture_output=True, text=True, cwd="/root/repo",
        env={**os.environ, "RAY_ADDRESS": "local"},
    )
    assert r2.returncode != 0 and "requires --mix-total" in r2.stderr


def test_curate_dsir_mix(tmp_path):
    inp = tmp_path / "docs.parquet"
    _docs(range(40)).to_parquet(inp)
    target = tmp_path / "target.parquet"
    _docs(range(500, 520), seed=9).to_parquet(target)

    out = str(tmp_path / "out")
    s = _run(str(inp), out, "--mix", "dsir", "--target", str(target),
             "--dsir-k", "10", "--dedup", "none", "--ppl-keep", "1.0")
    st = s["stages"]
    assert st["lm"]["rows_out"] == st["clean"]["rows_out"]  # ppl filter off
    assert st["mix"]["rows_out"] == 10
    assert st["pack"]["tokens_out"] > 0


@pytest.mark.slow
def test_curate_streaming_no_probe_loss(tmp_path):
    """Streaming (sharded-Bloom) dedup mode with every doc unique and
    quality-passing: clean rows_out must equal docs_in EXACTLY. Guards the
    probe-suppression bug — with the Bloom stage upstream of the pipeline
    fit / meta hash_join, their schema probes executed the lazy insert
    chain once and the real run suppressed the whole corpus (kept = 0,
    which then crashed the meta join on an all-empty left side)."""
    rows = [{"doc_id": i, "text": " ".join(f"u{i}w{j}" for j in range(40)),
             "source": "web"} for i in range(50)]
    inp = tmp_path / "in.parquet"
    pd.DataFrame(rows).to_parquet(inp)
    out = str(tmp_path / "out")
    s = _run(str(inp), out, "--dedup", "streaming", "--ppl-keep", "1.0",
             "--mix", "none")
    st = s["stages"]
    assert st["clean"]["docs_in"] == 50
    assert st["clean"]["rows_out"] == 50
    assert st["mix"]["rows_out"] == 50
    assert st["pack"]["tokens_out"] > 0


@pytest.mark.slow
def test_curate_c4_flag(tmp_path):
    """--c4 drops terminal-punctuation-less boilerplate lines and whole
    poison docs inside the clean stage; punctuated docs survive."""
    rows = []
    for i in range(40):
        rng = np.random.RandomState(5 + i)
        w = [" ".join(rng.choice([f"w{j}" for j in range(80)], 14))
             for _ in range(3)]
        # three per-doc-unique punctuated sentences (corpus-wide line dedup
        # runs first and would eat shared lines) + one nav line C4 removes
        text = (f"Document {i} opens with {w[0]} and more words here.\n"
                f"Document {i} continues with {w[1]} right here today!\n"
                f"Document {i} closes with {w[2]} to end the page?\n"
                "nav bar home about")
        if i % 10 == 0:
            # per-doc-unique poison (a SHARED poison line would be removed
            # from all but its first doc by line dedup before C4 runs)
            text += f"\nlorem ipsum dolor sit amet {i}."
        rows.append({"doc_id": i, "text": text,
                     "source": "web" if i % 3 else "books"})
    inp = tmp_path / "docs.parquet"
    pd.DataFrame(rows).to_parquet(inp)
    s = _run(str(inp), str(tmp_path / "out"), "--c4")
    st = s["stages"]
    assert st["clean"]["docs_in"] == 40
    # 4 lorem-ipsum docs dropped by the c4 doc rule; rest pass Gopher
    assert st["clean"]["rows_out"] == 36
    assert st["pack"]["packs"] > 0


@pytest.mark.slow
def test_curate_gopher_full(tmp_path):
    """--gopher-full swaps in the complete published Gopher rule set:
    English-like docs pass; a stop-word-free doc and a too-short-words doc
    are dropped by rules the 3-signal filter doesn't have. (A repeated-LINE
    violator can't reach the Gopher stage here: corpus-wide line dedup runs
    first and de-duplicates within-doc lines too.)"""
    vocab = ["apple", "river", "stone", "cloud", "tiger", "metal",
             "grain", "light", "sound", "patch", "field", "crane"]
    rows = []
    for i in range(30):
        rng = np.random.RandomState(13 + i)
        lines = [" ".join(rng.choice(vocab, 14)) + f" with the doc{i}x{j}"
                 for j in range(4)]
        rows.append({"doc_id": i, "text": "\n".join(lines),
                     "source": "web" if i % 3 else "books"})
    # violators: no stop words; >30% duplicate lines
    rng = np.random.RandomState(99)
    rows.append({"doc_id": 100,
                 "text": " ".join(rng.choice(vocab, 80)),
                 "source": "web"})
    rows.append({"doc_id": 101,
                 "text": " ".join(["ab"] * 76) + " with the to of",
                 "source": "web"})  # mean word length ~2 < 3
    inp = tmp_path / "docs.parquet"
    pd.DataFrame(rows).to_parquet(inp)
    s = _run(str(inp), str(tmp_path / "out"), "--gopher-full")
    st = s["stages"]
    assert st["clean"]["docs_in"] == 32
    assert st["clean"]["rows_out"] == 30
    assert st["pack"]["packs"] > 0


@pytest.mark.slow
def test_curate_with_fitted_tokenizer_artifact(tmp_path, ray_session):
    """--tokenizer <artifact>: a persisted fitted UnigramTokenizer replaces
    hash tokenization (fit once, apply in later jobs). Token ids must stay
    inside the artifact's vocab and the job must still pack."""
    import pyarrow.parquet as pq
    import ray.data as rd

    from ballet_ray.stages.unigram import train_unigram
    from ballet_ray.state.persist import save_artifact

    df = _docs(range(50))
    inp = tmp_path / "docs.parquet"
    df.to_parquet(inp)

    tok = train_unigram(rd.from_pandas(df), vocab_size=120, max_piece_len=4,
                        seed_size=400, em_rounds=1)
    art = str(tmp_path / "uni.pkl")
    save_artifact(tok, art)

    out = str(tmp_path / "out")
    s = _run(str(inp), out, "--tokenizer", art)
    st = s["stages"]
    assert st["tokens"]["rows_out"] == st["mix"]["rows_out"] > 0
    assert st["pack"]["packs"] > 0
    tokens_dir = os.path.join(out, "tokens")
    files = [f for f in os.listdir(tokens_dir) if f.endswith(".parquet")]
    ids = [i for f in files
           for lst in pq.read_table(os.path.join(tokens_dir, f),
                                    columns=["tokens"])["tokens"].to_pylist()
           for i in lst]
    assert ids and 0 <= min(ids) and max(ids) < tok.vocab_size()

    # wrong-class artifact fails loudly, not silently
    save_artifact({"not": "a tokenizer"}, str(tmp_path / "bad.pkl"))
    r = subprocess.run(
        [sys.executable, "jobs/run.py", "--mode", "curate", "--input",
         str(inp), "--out", str(tmp_path / "out_bad"), "--num-cpus", "4",
         "--tokenizer", str(tmp_path / "bad.pkl")],
        capture_output=True, text=True, cwd="/root/repo",
        env={**os.environ, "RAY_ADDRESS": "local"},
    )
    assert r.returncode != 0 and "expected BpeTokenizer," in r.stderr
