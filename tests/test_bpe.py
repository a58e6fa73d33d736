"""Trainable BPE tokenizer (stages/bpe.py): reference-algorithm parity,
deterministic fit, actor-pool apply, memoized encode."""

import numpy as np
import pytest
import ray.data as rd

from ballet_ray.stages.bpe import EOW, BpeTokenizer, apply_bpe, train_bpe

CORPUS = [
    "low low low low low",
    "lower lower",
    "newest newest newest newest newest newest",
    "widest widest widest",
]


def _brute_train(texts, num_merges):
    """Independent reference: the textbook Sennrich et al. algorithm over a
    word-frequency dict, ties -> lexicographically smallest pair."""
    freqs = {}
    for t in texts:
        for w in t.split(" "):
            if w:
                freqs[w] = freqs.get(w, 0) + 1
    vocab = {tuple(w) + (EOW,): f for w, f in freqs.items()}
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


def _ds(parts=2):
    return rd.from_items(
        [{"doc_id": i, "text": t} for i, t in enumerate(CORPUS)]
    ).repartition(parts)


def test_train_matches_reference_merges():
    tok = train_bpe(_ds(), num_merges=10)
    assert tok.merges == _brute_train(CORPUS, 10)


def test_train_partition_invariant():
    t1 = train_bpe(_ds(1), num_merges=8)
    t2 = train_bpe(_ds(4), num_merges=8)
    assert t1.merges == t2.merges
    assert t1.id_to_token == t2.id_to_token


def test_encode_word_greedy_lowest_rank():
    tok = train_bpe(_ds(), num_merges=10)
    # a trained word must round-trip through its own merges: the encoded
    # pieces concatenate back to word + EOW
    for w in ("low", "newest", "widest", "lower"):
        ids = tok.encode_word(w)
        assert all(i != 0 for i in ids)  # no UNK on seen words
        assert "".join(tok.id_to_token[i] for i in ids) == w + EOW
    # unseen chars -> UNK
    assert 0 in tok.encode_word("zzz")


def test_apply_bpe_dataset_and_actor_pool():
    tok = train_bpe(_ds(), num_merges=10)
    out1 = apply_bpe(_ds(3), tok).to_pandas().set_index("doc_id").sort_index()
    out2 = apply_bpe(_ds(2), tok, concurrency=2).to_pandas().set_index("doc_id").sort_index()
    for i, text in enumerate(CORPUS):
        exp = [tid for w in text.split(" ") for tid in tok.encode_word(w)]
        assert list(out1.loc[i, "bpe_tokens"]) == exp
        assert list(out2.loc[i, "bpe_tokens"]) == exp
        assert out1.loc[i, "n_tok"] == len(exp)


def test_compression_monotone_in_merges():
    few = train_bpe(_ds(), num_merges=2)
    many = train_bpe(_ds(), num_merges=30)
    n_few = apply_bpe(_ds(), few).to_pandas()["n_tok"].sum()
    n_many = apply_bpe(_ds(), many).to_pandas()["n_tok"].sum()
    assert n_many <= n_few  # more merges never lengthen the encoding


def test_tokenizer_pickles():
    import pickle

    tok = train_bpe(_ds(), num_merges=5)
    tok2 = pickle.loads(pickle.dumps(tok))
    assert tok2.encode_word("newest") == tok.encode_word("newest")


def test_decode_roundtrip():
    tok = train_bpe(_ds(), num_merges=15)
    text = "newest lower low widest"
    ids = [t for w in text.split(" ") for t in tok.encode_word(w)]
    assert tok.decode(ids) == text


def test_encoder_memo_cap_resets_without_changing_output():
    from ballet_ray.stages.bpe import BpeEncoder
    import pyarrow as pa

    tok = train_bpe(_ds(), num_merges=10)
    enc = BpeEncoder(tokenizer=tok, memo_cap=2)  # force resets every batch
    batch = pa.table({"doc_id": list(range(len(CORPUS))), "text": CORPUS})
    out1 = enc(batch)
    assert len(enc._memo) <= 6  # distinct words of the corpus
    out2 = enc(batch)  # memo over cap -> reset happens, results identical
    assert out1.equals(out2)
