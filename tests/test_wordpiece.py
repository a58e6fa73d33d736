"""WordPiece tokenizer (Schuster & Nakajima 2012 / BERT): trainer parity
vs a brute-force reference, greedy longest-match semantics, partition
invariance, roundtrip decode, UNK rule, actor-pool apply, persistence."""

import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from ballet_ray.stages.wordpiece import (CONT, UNK_ID, WordPieceTokenizer,
                                         _word_symbols, apply_wordpiece,
                                         train_wordpiece)


def _corpus(n=300, seed=7):
    rng = np.random.default_rng(seed)
    stems = ["walk", "talk", "jump", "read", "build", "token", "data", "ray"]
    sufs = ["", "s", "ing", "ed", "er"]
    rows = []
    for i in range(n):
        words = [rng.choice(stems) + rng.choice(sufs)
                 for _ in range(int(rng.integers(4, 12)))]
        rows.append({"doc_id": f"d{i:04d}", "text": " ".join(words)})
    return pd.DataFrame(rows)


def _brute_train(word_freqs: dict, vocab_size: int):
    """Naive reference: full rescan of pair/symbol counts every merge,
    scores compared as exact Fractions."""
    from fractions import Fraction

    words = {w: list(_word_symbols(w)) for w in word_freqs}
    base = sorted({s for syms in words.values() for s in syms})
    merges = []
    n_vocab = 1 + len(base)
    while n_vocab < vocab_size:
        pair_counts, sym_counts = {}, {}
        for w, syms in words.items():
            f = word_freqs[w]
            for s in syms:
                sym_counts[s] = sym_counts.get(s, 0) + f
            for p in zip(syms, syms[1:]):
                pair_counts[p] = pair_counts.get(p, 0) + f
        if not pair_counts:
            break
        scores = {p: Fraction(c, sym_counts[p[0]] * sym_counts[p[1]])
                  for p, c in pair_counts.items()}
        top = max(scores.values())
        best = min(p for p, s in scores.items() if s == top)
        merges.append(best)
        n_vocab += 1
        a, b = best
        ab = a + (b[len(CONT):] if b.startswith(CONT) else b)
        for w, syms in words.items():
            new, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    new.append(ab)
                    i += 2
                else:
                    new.append(syms[i])
                    i += 1
            words[w] = new
    return merges, base


@pytest.fixture(scope="module")
def fitted(ray_session):
    df = _corpus()
    ds = rd.from_pandas(df).repartition(5)
    tok = train_wordpiece(ds, vocab_size=60)
    return df, tok


def test_train_matches_bruteforce(fitted):
    df, tok = fitted
    freqs: dict = {}
    for t in df.text:
        for w in t.split(" "):
            freqs[w] = freqs.get(w, 0) + 1
    merges, base = _brute_train(freqs, vocab_size=60)
    assert tok.merges == merges
    assert tok.id_to_piece[:1 + len(base)] == ["[UNK]"] + base
    assert tok.vocab_size() == 60
    # merged multi-char pieces exist and continuations carry the ## mark
    assert any(len(p) > 1 and not p.startswith(CONT)
               for p in tok.id_to_piece[1:])
    assert any(p.startswith(CONT) and len(p) > 3 for p in tok.id_to_piece)


def test_partition_invariance(fitted, ray_session):
    df, tok = fitted
    tok1 = train_wordpiece(rd.from_pandas(df).repartition(1), vocab_size=60)
    assert tok1.merges == tok.merges
    assert tok1.id_to_piece == tok.id_to_piece


def test_greedy_longest_match_rule():
    # hand-built vocab: longest-match must pick "walk" + "##ing", and
    # prefer the longest prefix even when shorter pieces also match
    tok = WordPieceTokenizer(
        merges=[("w", "##a"), ("wa", "##l"), ("wal", "##k"),
                ("##i", "##n"), ("##in", "##g")],
        base_symbols=["w", "##a", "##l", "##k", "##i", "##n", "##g"])
    p2i = tok.piece_to_id
    assert tok.encode_word("walking") == [p2i["walk"], p2i["##ing"]]
    assert tok.encode_word("walk") == [p2i["walk"]]
    # "wa" exists ("wal" too) — greedy takes the longest available prefix
    assert tok.encode_word("wal") == [p2i["wal"]]
    # uncoverable residue ('x' not in alphabet) → the WHOLE word is UNK
    assert tok.encode_word("walkx") == [UNK_ID]
    assert tok.encode_word("") == []


def test_roundtrip_and_unk(fitted):
    df, tok = fitted
    text = df.text.iloc[0]
    ids = [i for w in text.split(" ") for i in tok.encode_word(w)]
    assert UNK_ID not in ids  # corpus words are fully covered
    assert tok.decode(ids) == text
    # unseen alphabet → UNK, and decode renders it
    assert tok.encode_word("Zürich") == [UNK_ID]
    assert tok.decode([UNK_ID]) == "[UNK]"


def test_apply_matches_per_word_encode(fitted, ray_session):
    df, tok = fitted
    out = (apply_wordpiece(rd.from_pandas(df).repartition(4), tok)
           .to_pandas().set_index("doc_id").sort_index())
    for did, row in out.iterrows():
        text = df.loc[df.doc_id == did, "text"].iloc[0]
        want = [i for w in text.split(" ") for i in tok.encode_word(w)]
        assert list(row["wp_tokens"]) == want
        assert row["n_tok"] == len(want)
    # actor-pool path produces the same thing
    out2 = (apply_wordpiece(rd.from_pandas(df).repartition(4), tok,
                            concurrency=2)
            .to_pandas().set_index("doc_id").sort_index())
    assert (out2["wp_tokens"].map(list) == out["wp_tokens"].map(list)).all()


def test_persist_roundtrip(fitted, tmp_path):
    _, tok = fitted
    from ballet_ray.state.persist import load_artifact, save_artifact

    p = save_artifact(tok, str(tmp_path / "wp.pkl"))
    tok2 = load_artifact(p, expect_class="WordPieceTokenizer")
    assert tok2.id_to_piece == tok.id_to_piece
    assert tok2.encode_word("walking") == tok.encode_word("walking")
