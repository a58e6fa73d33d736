"""Byte-level BPE (stages/bytebpe.py): byte-map bijection, reference-
algorithm merge parity, lossless roundtrip on arbitrary unicode (the
defining byte-level property), space-attach pretokenization, actor-pool
apply parity, artifact persistence + jobs acceptance."""

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pytest
import ray.data as rd

from ballet_ray.stages.bpe import attach_spaces
from ballet_ray.stages.bytebpe import (ByteBpeTokenizer, apply_byte_bpe,
                                       bytes_to_unicode, train_byte_bpe)

CORPUS = [
    "low low low low low",
    "lower lower",
    "newest newest newest newest newest newest",
    "widest widest widest",
]


def _ds(parts=2, corpus=CORPUS):
    return rd.from_items(
        [{"doc_id": i, "text": t} for i, t in enumerate(corpus)]
    ).repartition(parts)


def _pretokens(text):
    """Reference space-attach pretokenizer: split on ' ', the separator
    travels with the following pretoken."""
    words = text.split(" ")
    return [words[0]] + [" " + w for w in words[1:]]


def _brute_train(texts, num_merges):
    """Independent reference: textbook BPE over the byte-symbol
    pretoken-frequency dict, ties -> lexicographically smallest pair."""
    b2u = bytes_to_unicode()
    freqs = {}
    for t in texts:
        for w in _pretokens(t):
            if w:
                freqs[w] = freqs.get(w, 0) + 1
    vocab = {tuple(b2u[b] for b in w.encode("utf-8")): f for w, f in freqs.items()}
    merges = []
    for _ in range(num_merges):
        pairs = {}
        for syms, f in vocab.items():
            for p in zip(syms, syms[1:]):
                pairs[p] = pairs.get(p, 0) + f
        if not pairs:
            break
        top = max(pairs.values())
        pair = min(p for p, c in pairs.items() if c == top)
        merges.append(pair)
        new = {}
        for syms, f in vocab.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and (syms[i], syms[i + 1]) == pair:
                    out.append(syms[i] + syms[i + 1])
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            new[tuple(out)] = new.get(tuple(out), 0) + f
        vocab = new
    return merges


def test_bytes_to_unicode_bijection():
    m = bytes_to_unicode()
    assert len(m) == 256 and len(set(m.values())) == 256
    # printable latin bytes keep their own char; the rest shift past 255
    assert m[ord("A")] == "A" and m[ord("~")] == "~"
    assert all(ord(c) > 255 for b, c in m.items()
               if not (33 <= b <= 126 or 161 <= b <= 172 or 174 <= b <= 255))


def test_train_matches_reference_merges():
    tok = train_byte_bpe(_ds(), num_merges=12)
    assert tok.merges == _brute_train(CORPUS, 12)
    assert tok.vocab_size() == 256 + len(tok.merges)


def test_train_partition_invariant():
    m1 = train_byte_bpe(_ds(1), num_merges=8).merges
    m4 = train_byte_bpe(_ds(4), num_merges=8).merges
    assert m1 == m4


NASTY = [
    "hello world",
    " leading space",
    "trailing space ",
    "double  space",
    "tabs\tand\nnewlines",
    "émigré naïve façade",
    "日本語のテキスト",
    "emoji 🎉🚀 and ½ symbols ±",
    "",
    " ",
    "   ",
    "mixed 日本 and ascii ٩(̾●̮̮̃̾•̃̾)۶",
]


def test_roundtrip_lossless_any_unicode():
    # chars unseen at train time still encode (byte fallback, no UNK)
    tok = train_byte_bpe(_ds(), num_merges=20)
    for text in NASTY:
        ids = [i for w in _pretokens(text) for i in tok.encode_word(w)]
        assert tok.decode(ids) == text, repr(text)


def test_encode_never_unk():
    tok = ByteBpeTokenizer(merges=[])  # bare byte alphabet
    ids = tok.encode_word("🎉 ünïcödé")
    assert all(0 <= i < 256 for i in ids)
    assert tok.decode(ids) == "🎉 ünïcödé"


def test_attach_spaces_reconstructs_text():
    texts = pa.array(NASTY + [None])
    words = pc.split_pattern(pc.fill_null(texts, ""), " ")
    out = attach_spaces(words.combine_chunks()
                        if isinstance(words, pa.ChunkedArray) else words)
    joined = pc.binary_join(out, "")
    assert joined.to_pylist() == NASTY + [""]


def test_apply_matches_driver_encode():
    corpus = CORPUS + NASTY
    ds = _ds(3, corpus)
    tok = train_byte_bpe(ds, num_merges=15)
    got = {r["doc_id"]: (list(r["bpe_tokens"]), r["n_tok"])
           for r in apply_byte_bpe(ds, tok, concurrency=2).take_all()}
    for i, text in enumerate(corpus):
        want = [t for w in _pretokens(text) for t in tok.encode_word(w)]
        assert got[i][0] == want, repr(text)
        assert got[i][1] == len(want)
        assert tok.decode(got[i][0]) == text


def test_persist_and_jobs_acceptance(tmp_path):
    from argparse import Namespace

    from ballet_ray.state.persist import load_artifact, save_artifact

    from jobs.run import _tokenizer_fn

    tok = train_byte_bpe(_ds(), num_merges=10)
    path = str(tmp_path / "bytebpe.pkl")
    save_artifact(tok, path)
    back = load_artifact(path)
    assert back.merges == tok.merges and back.space_attach

    fn = _tokenizer_fn(Namespace(tokenizer=path), vocab=None)
    t = pa.table({"doc_id": pa.array([0, 1]),
                  "text": pa.array(["low lower", "newest widest"])})
    out = fn(t)
    want0 = [i for w in _pretokens("low lower") for i in tok.encode_word(w)]
    assert out.column("tokens").to_pylist()[0] == want0
    assert out.column("n_tok").to_pylist() == [len(want0),
                                               out.column("n_tok").to_pylist()[1]]


def test_fit_deterministic_and_null_safe():
    ds = rd.from_items([{"doc_id": 0, "text": None},
                        {"doc_id": 1, "text": "aa aa ab"}]).repartition(2)
    m1 = train_byte_bpe(ds, num_merges=5).merges
    m2 = train_byte_bpe(ds, num_merges=5).merges
    assert m1 == m2 and len(m1) > 0
