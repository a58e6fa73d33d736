"""Interpolated bigram-LM perplexity scoring (text.bigram_logprob_scores)."""

import numpy as np
import pytest
import ray.data as rd

from ballet_ray.stages.text import bigram_logprob_scores

DOCS = [
    ("a", "the cat sat on the mat"),
    ("b", "the cat sat on the mat again"),
    ("c", "mat the on sat cat the"),   # same words, shuffled order
    ("d", "one"),                       # single word: no bigrams
    ("e", "x y x y x y"),
]
LAM, ALPHA = 0.8, 0.5


def _brute():
    uni, bi, T = {}, {}, 0
    for _, t in DOCS:
        w = t.split(" ")
        T += len(w)
        for x in w:
            uni[x] = uni.get(x, 0) + 1
        for i in range(len(w) - 1):
            bi[(w[i], w[i + 1])] = bi.get((w[i], w[i + 1]), 0) + 1
    V = len(uni)
    denom = T + ALPHA * V

    out = {}
    for i, t in DOCS:
        w = t.split(" ")
        ls = [
            np.log(LAM * bi.get((w[j], w[j + 1]), 0) / uni[w[j]]
                   + (1 - LAM) * (uni[w[j + 1]] + ALPHA) / denom)
            for j in range(len(w) - 1)
        ]
        tot = float(np.sum(ls)) if ls else 0.0
        mean = tot / len(ls) if ls else 0.0
        out[i] = (tot, mean, float(np.exp(-mean)))
    return out


def _ds(parts=3):
    return rd.from_items([{"doc_id": i, "text": t} for i, t in DOCS]).repartition(parts)


def test_matches_brute_force():
    got = bigram_logprob_scores(_ds(), round_to=None).to_pandas().set_index("doc_id")
    exp = _brute()
    for k, (tot, mean, ppl) in exp.items():
        assert got.loc[k, "logprob"] == pytest.approx(tot, abs=1e-10)
        assert got.loc[k, "mean_logprob"] == pytest.approx(mean, abs=1e-10)
        assert got.loc[k, "ppl"] == pytest.approx(ppl, abs=1e-10)


def test_single_word_doc():
    got = bigram_logprob_scores(_ds(2), round_to=None).to_pandas().set_index("doc_id")
    assert got.loc["d", "logprob"] == 0.0
    assert got.loc["d", "mean_logprob"] == 0.0
    assert got.loc["d", "ppl"] == 1.0


def test_fluency_signal():
    # the shuffled-word doc must score strictly worse (higher perplexity)
    # than the doc whose bigrams the corpus has seen twice
    got = bigram_logprob_scores(_ds(), round_to=None).to_pandas().set_index("doc_id")
    assert got.loc["c", "ppl"] > got.loc["a", "ppl"]


def test_bigram_cap_backoff():
    # with max_bigrams=1 only the most frequent bigram ships; every other
    # pair backs off to (1-lam)*p_uni — still deterministic and finite,
    # and the kept bigram's contribution stays exact
    full = bigram_logprob_scores(_ds(), round_to=None).to_pandas().set_index("doc_id")
    capped = bigram_logprob_scores(_ds(), round_to=None, max_bigrams=1
                                   ).to_pandas().set_index("doc_id")
    assert np.isfinite(capped["logprob"]).all()
    # doc e is wall-to-wall "x y"/"y x": the top bigram corpus-wide is one
    # of its pairs, so its capped score is >= pure-backoff but <= full
    assert capped.loc["e", "logprob"] <= full.loc["e", "logprob"] + 1e-12


from hypothesis import given, settings, strategies as st

_word = st.sampled_from(["a", "bb", "ccc", "dd", "e"])
_text = st.lists(_word, min_size=1, max_size=10).map(" ".join)


@settings(max_examples=10, deadline=None)
@given(docs=st.lists(_text, min_size=1, max_size=8), parts=st.integers(1, 3))
def test_property_matches_brute(docs, parts):
    rows = [(f"d{i}", t) for i, t in enumerate(docs)]
    ds = rd.from_items([{"doc_id": i, "text": t} for i, t in rows]).repartition(parts)
    got = bigram_logprob_scores(ds, lam=LAM, alpha=ALPHA, round_to=None
                                ).to_pandas().set_index("doc_id")

    uni, bi, T = {}, {}, 0
    for _, t in rows:
        w = t.split(" ")
        T += len(w)
        for x in w:
            uni[x] = uni.get(x, 0) + 1
        for j in range(len(w) - 1):
            bi[(w[j], w[j + 1])] = bi.get((w[j], w[j + 1]), 0) + 1
    denom = T + ALPHA * len(uni)
    for i, t in rows:
        w = t.split(" ")
        ls = [np.log(LAM * bi.get((w[j], w[j + 1]), 0) / uni[w[j]]
                     + (1 - LAM) * (uni[w[j + 1]] + ALPHA) / denom)
              for j in range(len(w) - 1)]
        tot = float(np.sum(ls)) if ls else 0.0
        assert got.loc[i, "logprob"] == pytest.approx(tot, abs=1e-10)


def test_block_of_single_word_docs_regression():
    """bincount with an empty weights array returns int64 — a block whose
    docs are all single words (no valid pairs) must not crash the divide
    or flip the logprob schema (found by hypothesis)."""
    ds = rd.from_items(
        [{"doc_id": f"d{i}", "text": t}
         for i, t in enumerate(["ccc", "bb", "bb e ccc", "e e a"])]
    ).repartition(2)  # block 0 = two single-word docs
    got = bigram_logprob_scores(ds, round_to=None).to_pandas()
    assert len(got) == 4 and got["logprob"].dtype == np.float64
    single = got.set_index("doc_id").loc[["d0", "d1"]]
    assert (single["logprob"] == 0.0).all() and (single["ppl"] == 1.0).all()
