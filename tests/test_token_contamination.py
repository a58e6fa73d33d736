"""find_contaminated_tokens (stages/dedup.py): token-level benchmark
decontamination — brute-force reference parity, planted overlap, fraction
math, empty-eval and short-doc edges."""

import numpy as np
import pytest
import ray.data as rd

from ballet_ray.stages.dedup import find_contaminated_tokens

RNG = np.random.default_rng(7)


def _brute(corpus, eval_rows, n):
    """Independent reference: python-set membership over tuple windows."""
    ev = set()
    for toks in eval_rows.values():
        for i in range(max(len(toks) - n + 1, 0)):
            ev.add(tuple(toks[i:i + n]))
    out = {}
    for did, toks in corpus.items():
        wins = [tuple(toks[i:i + n]) for i in range(max(len(toks) - n + 1, 0))]
        hits = sum(w in ev for w in wins)
        if hits:
            out[did] = (hits, len(wins), hits / len(wins))
    return out


def _make(n_eval=6, n_corpus=30, overlap_every=3, seed_len=40, n=8):
    eval_rows = {i: RNG.integers(0, 50, seed_len).tolist() for i in range(n_eval)}
    corpus = {}
    for j in range(n_corpus):
        did = 100 + j
        toks = RNG.integers(0, 50, seed_len).tolist()
        if j % overlap_every == 0:
            # splice a contaminated n-gram run from an eval doc
            src = eval_rows[j % n_eval]
            toks[5:5 + n + 4] = src[10:10 + n + 4]
        corpus[did] = toks
    return corpus, eval_rows


def test_matches_brute_reference():
    n = 8
    corpus, eval_rows = _make(n=n)
    cds = rd.from_items([{"doc_id": k, "tokens": v} for k, v in corpus.items()]).repartition(4)
    eds = rd.from_items([{"doc_id": k, "tokens": v} for k, v in eval_rows.items()]).repartition(2)
    got = {r["doc_id"]: (r["n_hits"], r["n_windows"], r["hit_frac"])
           for r in find_contaminated_tokens(cds, eds, n=n, with_fraction=True).take_all()}
    want = _brute(corpus, eval_rows, n)
    assert got == want
    assert len(got) >= 10  # the plant actually bites


def test_exact_copy_fully_contaminated():
    toks = list(range(100))
    cds = rd.from_items([{"doc_id": 1, "tokens": toks},
                         {"doc_id": 2, "tokens": list(range(200, 300))}])
    eds = rd.from_items([{"doc_id": 0, "tokens": toks}])
    out = find_contaminated_tokens(cds, eds, n=16, with_fraction=True).take_all()
    assert len(out) == 1 and out[0]["doc_id"] == 1
    assert out[0]["hit_frac"] == 1.0 and out[0]["n_windows"] == 100 - 16 + 1


def test_empty_eval_and_short_docs():
    cds = rd.from_items([{"doc_id": 1, "tokens": [1, 2, 3]},       # shorter than n
                         {"doc_id": 2, "tokens": list(range(40))}])
    eds = rd.from_items([{"doc_id": 0, "tokens": [7, 8]}])          # no windows at all
    assert find_contaminated_tokens(cds, eds, n=16).take_all() == []
