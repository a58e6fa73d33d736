"""GPT-2 two-file (vocab.json / merges.txt) tokenizer interop: export →
load roundtrip preserves encode/decode exactly for both BPE families;
malformed or inconsistent files fail loudly."""

import json
import os

import pytest
import ray.data as rd

from ballet_ray.stages.bpe import BpeTokenizer, train_bpe
from ballet_ray.stages.bytebpe import ByteBpeTokenizer, train_byte_bpe
from ballet_ray.stages.tokenizer_io import export_bpe_files, load_bpe_files

DOCS = [
    "the quick brown fox jumps over the lazy dog",
    "pack my box with five dozen liquor jugs",
    "héllo wörld — unicode naïveté 日本語 test",
    "the the the repeated repeated words words words",
]
SAMPLES = ["the quick naïveté 日本語", "unseen zyx!?", " leading space"]


def _corpus():
    return rd.from_items([{"doc_id": i, "text": t} for i, t in enumerate(DOCS)])


def test_bytebpe_roundtrip(tmp_path):
    tok = train_byte_bpe(_corpus(), num_merges=60)
    vpath, mpath = export_bpe_files(tok, str(tmp_path))
    # published format shape: header + "a b" lines; unescaped UTF-8 vocab
    lines = open(mpath, encoding="utf-8").read().splitlines()
    assert lines[0] == "#version: 0.2"
    assert all(len(l.split(" ")) == 2 for l in lines[1:])
    vocab = json.load(open(vpath, encoding="utf-8"))
    assert len(vocab) == tok.vocab_size() == 256 + 60
    back = load_bpe_files(str(tmp_path))          # autodetected byte-level
    assert isinstance(back, ByteBpeTokenizer)
    for s in SAMPLES:
        for w in s.split(" "):
            assert back.encode_word(w) == tok.encode_word(w)
    ids = [tok.encode_word(w) for w in SAMPLES[0].split(" ")]
    flat = [i for ws in ids for i in ws]
    assert back.decode(flat) == tok.decode(flat)


def test_charbpe_roundtrip(tmp_path):
    tok = train_bpe(_corpus(), num_merges=40)
    export_bpe_files(tok, str(tmp_path))
    back = load_bpe_files(str(tmp_path))          # autodetected char-level
    assert isinstance(back, BpeTokenizer) and not isinstance(back, ByteBpeTokenizer)
    assert back.id_to_token == tok.id_to_token
    for s in SAMPLES:
        for w in s.split(" "):
            assert back.encode_word(w) == tok.encode_word(w)


def test_inconsistent_files_fail(tmp_path):
    tok = train_byte_bpe(_corpus(), num_merges=10)
    vpath, mpath = export_bpe_files(tok, str(tmp_path))
    # reorder two merges: rebuilt ids no longer match vocab.json
    lines = open(mpath, encoding="utf-8").read().splitlines()
    lines[1], lines[2] = lines[2], lines[1]
    open(mpath, "w", encoding="utf-8").write("\n".join(lines) + "\n")
    with pytest.raises(ValueError, match="does not match"):
        load_bpe_files(str(tmp_path))
    # truncated file (count mismatch) must also refuse, whatever the path
    open(mpath, "w", encoding="utf-8").write("\n".join(lines[:-1]) + "\n")
    with pytest.raises(ValueError):
        load_bpe_files(str(tmp_path))


def test_unsupported_class_and_bad_line(tmp_path):
    with pytest.raises(TypeError):
        export_bpe_files(object(), str(tmp_path))
    os.makedirs(tmp_path / "bad", exist_ok=True)
    json.dump({"a": 0, "b": 1, "abc": 2}, open(tmp_path / "bad" / "vocab.json", "w"))
    open(tmp_path / "bad" / "merges.txt", "w").write("#version: 0.2\na b c\n")
    with pytest.raises(ValueError, match="malformed"):
        load_bpe_files(str(tmp_path / "bad"))

def test_cli_export(tmp_path):
    import subprocess
    import sys

    from ballet_ray.state.persist import save_artifact

    tok = train_byte_bpe(_corpus(), num_merges=12)
    art = str(tmp_path / "tok.pkl")
    save_artifact(tok, art)
    out = str(tmp_path / "hf")
    r = subprocess.run([sys.executable, "-m", "ballet_ray", "export-tokenizer", art, out],
                       capture_output=True, text=True, cwd="/root/repo")
    assert r.returncode == 0, r.stderr[-2000:]
    res = json.loads(r.stdout.strip().splitlines()[-1])
    assert res["ok"] is True
    assert load_bpe_files(out).encode_word("the") == tok.encode_word("the")

def test_wordpiece_vocab_txt_roundtrip(tmp_path):
    from ballet_ray.stages.tokenizer_io import (
        export_wordpiece_vocab,
        load_wordpiece_vocab,
    )
    from ballet_ray.stages.wordpiece import train_wordpiece

    tok = train_wordpiece(_corpus(), vocab_size=80)
    path = export_wordpiece_vocab(tok, str(tmp_path))
    lines = open(path, encoding="utf-8").read().splitlines()
    assert lines[0] == "[UNK]" and len(lines) == tok.vocab_size()
    back = load_wordpiece_vocab(str(tmp_path))
    assert back.id_to_piece == tok.id_to_piece
    for s in SAMPLES + ["unbreakable zzz"]:
        for w in s.split(" "):
            assert back.encode_word(w) == tok.encode_word(w)
    ids = tok.encode_word("quick")
    assert back.decode(ids) == tok.decode(ids)
    with pytest.raises(TypeError):
        export_wordpiece_vocab(object(), str(tmp_path))

def test_cli_export_wordpiece(tmp_path):
    import subprocess
    import sys

    from ballet_ray.stages.tokenizer_io import load_wordpiece_vocab
    from ballet_ray.stages.wordpiece import train_wordpiece
    from ballet_ray.state.persist import save_artifact

    tok = train_wordpiece(_corpus(), vocab_size=60)
    art = str(tmp_path / "wp.pkl")
    save_artifact(tok, art)
    out = str(tmp_path / "bert")
    r = subprocess.run([sys.executable, "-m", "ballet_ray", "export-tokenizer", art, out],
                       capture_output=True, text=True, cwd="/root/repo")
    assert r.returncode == 0, r.stderr[-2000:]
    assert json.loads(r.stdout.strip().splitlines()[-1])["ok"] is True
    assert load_wordpiece_vocab(out).encode_word("quick") == tok.encode_word("quick")

def test_unigram_vocab_roundtrip(tmp_path):
    from ballet_ray.stages.tokenizer_io import (
        export_unigram_vocab,
        load_unigram_vocab,
    )
    from ballet_ray.stages.unigram import train_unigram

    tok = train_unigram(_corpus(), vocab_size=70)
    path = export_unigram_vocab(tok, str(tmp_path))
    lines = open(path, encoding="utf-8").read().splitlines()
    assert lines[0] == "<unk>\t0" and len(lines) == tok.vocab_size()
    back = load_unigram_vocab(str(tmp_path))
    assert back.id_to_piece == tok.id_to_piece
    assert back.logp == tok.logp          # exact float64 round-trip
    for s in SAMPLES:
        for w in s.split(" "):
            assert back.encode_word(w) == tok.encode_word(w)
    # edited order must refuse
    open(path, "w", encoding="utf-8").write(
        "\n".join([lines[0]] + lines[2:] + [lines[1]]) + "\n")
    with pytest.raises(ValueError, match="order"):
        load_unigram_vocab(str(tmp_path))
