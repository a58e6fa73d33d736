"""tokenizer_report: exact-parity evaluation metrics (fertility,
compression, UNK rate) for all three trainable tokenizers against a
per-row python reference."""

import numpy as np
import pandas as pd
import pytest
import ray.data as rd


def _corpus(n=120, seed=9):
    rng = np.random.default_rng(seed)
    stems = ["walk", "talk", "jump", "read", "build", "token", "data", "ray"]
    sufs = ["", "s", "ing", "ed", "er"]
    rows = []
    for i in range(n):
        words = [rng.choice(stems) + rng.choice(sufs)
                 for _ in range(int(rng.integers(4, 12)))]
        rows.append({"doc_id": f"d{i:04d}", "text": " ".join(words)})
    return pd.DataFrame(rows)


def _reference(df, tok, unk_id=0):
    docs = words = chars = tokens = unks = docs_unk = 0
    for t in df.text:
        docs += 1
        chars += len(t)
        ids = []
        for w in t.split(" "):
            if w:
                words += 1
            ids.extend(tok.encode_word(w))
        tokens += len(ids)
        u = sum(1 for i in ids if i == unk_id)
        unks += u
        docs_unk += 1 if u else 0
    return {
        "documents": docs, "words": words, "tokens": tokens,
        "vocab_size": tok.vocab_size(),
        "fertility": round(tokens / words, 4),
        "chars_per_token": round(chars / tokens, 4),
        "tokens_per_doc": round(tokens / docs, 2),
        "unk_rate": round(unks / tokens, 6),
        "doc_unk_fraction": round(docs_unk / docs, 4),
    }


@pytest.mark.parametrize("kind", ["bpe", "wordpiece", "unigram"])
def test_report_matches_reference(kind, ray_session):
    from ballet_ray.stages.report import tokenizer_report

    df = _corpus()
    ds = rd.from_pandas(df).repartition(4)
    if kind == "bpe":
        from ballet_ray.stages.bpe import train_bpe
        tok = train_bpe(ds, num_merges=40)
    elif kind == "wordpiece":
        from ballet_ray.stages.wordpiece import train_wordpiece
        tok = train_wordpiece(ds, vocab_size=60)
    else:
        from ballet_ray.stages.unigram import train_unigram
        tok = train_unigram(ds, vocab_size=80, max_piece_len=6,
                            seed_size=500, em_rounds=1)

    got = tokenizer_report(ds, tok)
    assert got == _reference(df, tok)
    # trained on its own corpus: full coverage, sane compression
    assert got["unk_rate"] == 0.0 and got["doc_unk_fraction"] == 0.0
    assert got["fertility"] >= 1.0 and got["chars_per_token"] > 0


def test_report_unk_on_unseen_alphabet(ray_session):
    from ballet_ray.stages.report import tokenizer_report
    from ballet_ray.stages.wordpiece import train_wordpiece

    df = _corpus(n=40)
    tok = train_wordpiece(rd.from_pandas(df), vocab_size=60)
    probe = pd.DataFrame({"doc_id": ["a", "b"],
                          "text": ["walk Zürich", "walking"]})
    got = tokenizer_report(rd.from_pandas(probe), tok)
    assert got == _reference(probe, tok)
    assert got["unk_rate"] > 0 and got["doc_unk_fraction"] == 0.5


@pytest.mark.slow
def test_report_cli_with_tokenizer_artifact(tmp_path, ray_session):
    import json
    import os
    import subprocess
    import sys as _sys

    from ballet_ray.stages.wordpiece import train_wordpiece
    from ballet_ray.state.persist import save_artifact

    df = _corpus(n=60)
    df.to_parquet(tmp_path / "docs.parquet")
    tok = train_wordpiece(rd.from_pandas(df), vocab_size=60)
    art = save_artifact(tok, str(tmp_path / "wp.pkl"))

    r = subprocess.run(
        [_sys.executable, "-m", "ballet_ray", "report",
         str(tmp_path / "docs.parquet"), "--tokenizer", art],
        capture_output=True, text=True, cwd="/root/repo",
        env={**os.environ, "RAY_ADDRESS": "local", "BALLET_RAY_NUM_CPUS": "4"},
    )
    assert r.returncode == 0, r.stderr[-2000:]
    rep = json.loads(r.stdout.strip().splitlines()[-1])
    assert rep == _reference(df, tok)
