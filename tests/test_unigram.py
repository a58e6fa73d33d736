"""Unigram-LM tokenizer (Kudo 2018): Viterbi optimality, partition
invariance, roundtrip decode, coverage, persistence."""

import itertools
import math

import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from ballet_ray.stages.unigram import (UNK_ID, WORD_MARK, UnigramTokenizer,
                                       apply_unigram, train_unigram)


def _corpus(n=400, seed=3):
    rng = np.random.default_rng(seed)
    stems = ["walk", "talk", "jump", "read", "build", "token", "data", "ray"]
    sufs = ["", "s", "ing", "ed", "er"]
    rows = []
    for i in range(n):
        words = [rng.choice(stems) + rng.choice(sufs)
                 for _ in range(int(rng.integers(4, 12)))]
        rows.append({"doc_id": f"d{i:04d}", "text": " ".join(words)})
    return pd.DataFrame(rows)


@pytest.fixture(scope="module")
def fitted(ray_session):
    df = _corpus()
    ds = rd.from_pandas(df).repartition(5)
    tok = train_unigram(ds, vocab_size=80, max_piece_len=6, seed_size=500,
                        em_rounds=2)
    return df, tok


def test_train_shape_and_morphemes(fitted):
    df, tok = fitted
    assert tok.vocab_size() <= 81  # vocab_size incl. UNK slot (alphabet may floor it)
    assert tok.id_to_piece[UNK_ID] == "<unk>"
    # every training character is in the vocab (coverage guarantee)
    chars = {c for t in df.text for w in t.split(" ") for c in WORD_MARK + w}
    assert chars <= set(tok.logp)
    # probabilities form a (sub)distribution
    assert sum(math.exp(v) for v in tok.logp.values()) <= 1.0 + 1e-6
    # multi-char pieces were learned (the corpus is built from 8 stems)
    assert any(len(p) > 2 for p in tok.logp)


def test_viterbi_matches_bruteforce(fitted):
    _, tok = fitted

    def brute(word):
        w = WORD_MARK + word
        L = len(w)
        best, best_ids = -math.inf, [UNK_ID] * L
        # all compositions of L into pieces of len <= max_piece_len
        def rec(i, score, ids):
            nonlocal best, best_ids
            if i == L:
                if score > best:
                    best, best_ids = score, list(ids)
                return
            for j in range(i + 1, min(L, i + tok.max_piece_len) + 1):
                lp = tok.logp.get(w[i:j])
                if lp is None:
                    if j - i != 1:
                        continue
                    lp = -20.0
                ids.append(tok.piece_to_id.get(w[i:j], UNK_ID))
                rec(j, score + lp, ids)
                ids.pop()
        rec(0, 0.0, [])
        return best, best_ids

    rng = np.random.default_rng(11)
    alphabet = [p for p in tok.logp if len(p) == 1 and p != WORD_MARK]
    for _ in range(25):
        word = "".join(rng.choice(alphabet, size=int(rng.integers(2, 9))))
        ids = tok.encode_word(word)
        bscore, bids = brute(word)
        score = sum(tok.logp.get(tok.id_to_piece[i], -20.0) for i in ids)
        assert math.isclose(score, bscore, rel_tol=1e-9), word
        assert len(ids) == len(bids) or math.isclose(score, bscore)


def test_partition_invariance(ray_session):
    df = _corpus(n=150, seed=9)
    kw = dict(vocab_size=60, max_piece_len=5, seed_size=400, em_rounds=1)
    t1 = train_unigram(rd.from_pandas(df).repartition(1), **kw)
    t7 = train_unigram(rd.from_pandas(df).repartition(7), **kw)
    assert t1.id_to_piece == t7.id_to_piece
    for p in t1.logp:
        assert math.isclose(t1.logp[p], t7.logp[p], rel_tol=1e-9, abs_tol=1e-12)


def test_apply_roundtrip_and_compression(fitted):
    df, tok = fitted
    ds = rd.from_pandas(df).repartition(4)
    out = apply_unigram(ds, tok, concurrency=2).to_pandas()
    assert set(out.columns) == {"doc_id", "uni_tokens", "n_tok"}
    m = out.set_index("doc_id")
    for _, row in df.iterrows():
        ids = m.loc[row.doc_id, "uni_tokens"]
        assert m.loc[row.doc_id, "n_tok"] == len(ids)
        # no UNK on in-alphabet text, and decode inverts encode
        assert UNK_ID not in set(ids)
        assert tok.decode(ids) == row.text
    # subword model beats char-level: fewer tokens than characters
    n_chars = sum(len(w) for t in df.text for w in t.split(" "))
    assert m.n_tok.sum() < 0.8 * n_chars


def test_unk_and_empty_edges(fitted):
    _, tok = fitted
    ids = tok.encode_word("walké")  # é never seen in training
    assert UNK_ID in ids
    assert tok.encode_word("") == [tok.piece_to_id[WORD_MARK]]
    ds = rd.from_pandas(pd.DataFrame({"doc_id": ["a"], "text": [None]}))
    out = apply_unigram(ds, tok).to_pandas()
    assert out.n_tok.iloc[0] in (0, 1)  # null text -> empty/degenerate doc


def test_persist_roundtrip(fitted, tmp_path):
    _, tok = fitted
    from ballet_ray.state.persist import load_artifact, save_artifact

    p = str(tmp_path / "uni.pkl")
    save_artifact(tok, p)
    tok2 = load_artifact(p, expect_class="UnigramTokenizer")
    assert tok2.id_to_piece == tok.id_to_piece
    assert tok2.encode_word("walking") == tok.encode_word("walking")


def test_validation():
    import ray.data as rd
    df = pd.DataFrame({"doc_id": ["a"], "text": ["x"]})
    with pytest.raises(ValueError):
        train_unigram(rd.from_pandas(df), shrink=1.5)
    with pytest.raises(ValueError):
        train_unigram(rd.from_pandas(df), vocab_size=1)
