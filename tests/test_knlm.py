"""Interpolated Kneser–Ney trigram LM (knlm.kn_logprob_scores) vs an
independent pure-Python reference implementation of Chen & Goodman's
interpolated KN with Ney discounts."""

import numpy as np
import pytest
import ray.data as rd

from ballet_ray.stages.knlm import kn_logprob_scores

DOCS = [
    ("a", "the cat sat on the mat"),
    ("b", "the cat sat on the mat again and again"),
    ("c", "mat the on sat cat the"),       # same words, shuffled order
    ("d", "one"),                          # single word: one BOS-context position
    ("e", "x y x y x y x y"),
    ("f", "the cat sat on the mat"),       # exact repeat lifts trigram counts
    ("g", ""),                             # empty text: one '' position
]
ALPHA = 0.5
BOS = "<s>"


def _brute(docs=DOCS, order=3, discount="ney", prune=1):
    """Independent dict-based fit + score (no shared code with the stage):
    generic-order interpolated KN, Ney single discount or modified-KN
    D1/D2/D3+, continuation counts derived level by level. ``prune``
    mirrors the stage's prune_min_count: level-≥2 grams with
    (continuation) count below it are dropped AFTER all statistics —
    they score as unseen (back off via γ(ctx), or 1.0 when the whole
    context was pruned away)."""
    top = {}
    for _, t in docs:
        w = [BOS] * (order - 1) + t.split(" ")
        for i in range(len(w) - order + 1):
            g = tuple(w[i:i + order])
            top[g] = top.get(g, 0) + 1

    pmods, tbl = {}, top
    for k in range(order, 1, -1):
        counts = list(tbl.values())
        nj = [sum(1 for c in counts if c == j) for j in (1, 2, 3, 4)]
        dsingle = (nj[0] / (nj[0] + 2 * nj[1])
                   if (nj[0] + 2 * nj[1]) > 0 else 0.5)
        dm = None
        if discount == "modified" and all(x > 0 for x in nj):
            y = nj[0] / (nj[0] + 2 * nj[1])
            dm = (min(max(1 - 2 * y * nj[1] / nj[0], 0.0), 1.0),
                  min(max(2 - 3 * y * nj[2] / nj[1], 0.0), 2.0),
                  min(max(3 - 4 * y * nj[3] / nj[2], 0.0), 3.0))
        ctx_tot, ctx_n1, ctx_n2, ctx_n3, ctx_n = {}, {}, {}, {}, {}
        for g, c in tbl.items():
            ctx = g[:-1]
            ctx_tot[ctx] = ctx_tot.get(ctx, 0) + c
            ctx_n[ctx] = ctx_n.get(ctx, 0) + 1
            key = ctx_n1 if c == 1 else (ctx_n2 if c == 2 else ctx_n3)
            key[ctx] = key.get(ctx, 0) + 1
        pmods[k] = (dsingle, dm, dict(tbl), ctx_tot, ctx_n,
                    ctx_n1, ctx_n2, ctx_n3)
        nxt = {}
        for g in tbl:
            nxt[g[1:]] = nxt.get(g[1:], 0) + 1
        tbl = nxt
    cw = tbl                      # level-1 continuation counts, keys (w,)
    nb = sum(cw.values())
    vocab = len(cw)
    denom = nb + ALPHA * (vocab + 1.0)

    # prune: drop low-count grams from the LOOKUP tables only (stats above
    # were computed from the full tables); a context whose every gram was
    # pruned loses its γ entry too (scores as unseen context, γ = 1)
    kept_ctx = {k: {g[:-1] for g, c in pmods[k][2].items() if c >= prune}
                for k in pmods}

    def p(gram):
        acc = (cw.get(gram[-1:], 0) + ALPHA) / denom
        for k in range(2, order + 1):
            d, dm, tb, ct, cn, c1, c2, c3 = pmods[k]
            sfx = gram[order - k:]
            ctx = sfx[:-1]
            if ctx in kept_ctx[k]:
                c = tb.get(sfx, 0)
                if c < prune:
                    c = 0
                if dm is None:
                    pk = max(c - d, 0.0) / ct[ctx]
                    gk = d * cn[ctx] / ct[ctx]
                else:
                    dc = dm[0] if c == 1 else (dm[1] if c == 2 else dm[2])
                    pk = max(c - dc, 0.0) / ct[ctx]
                    gk = (dm[0] * c1.get(ctx, 0) + dm[1] * c2.get(ctx, 0)
                          + dm[2] * c3.get(ctx, 0)) / ct[ctx]
            else:
                pk, gk = 0.0, 1.0
            acc = pk + gk * acc
        return acc

    out = {}
    for i, t in docs:
        w = [BOS] * (order - 1) + t.split(" ")
        ls = [np.log(p(tuple(w[j:j + order])))
              for j in range(len(w) - order + 1)]
        tot = float(np.sum(ls))
        mean = tot / len(ls)
        out[i] = (tot, mean, float(np.exp(-mean)))
    return out


def _rep_docs():
    """Corpus engineered so counts-of-counts n1..n4 are all populated at
    every level (the modified-discount estimates are non-degenerate)."""
    rng = np.random.RandomState(7)
    words = [f"t{j}" for j in range(8)]
    return [(f"m{i}", " ".join(rng.choice(words, 7))) for i in range(50)]


def _ds(parts=3):
    return rd.from_items(
        [{"doc_id": i, "text": t} for i, t in DOCS]).repartition(parts)


@pytest.mark.parametrize("order", [2, 3, 5])
def test_matches_brute_force(order):
    got = kn_logprob_scores(
        _ds(), order=order, round_to=None).to_pandas().set_index("doc_id")
    exp = _brute(order=order)
    for key, (tot, mean, ppl) in exp.items():
        assert got.loc[key, "logprob"] == pytest.approx(tot, abs=1e-10), key
        assert got.loc[key, "mean_logprob"] == pytest.approx(mean, abs=1e-10)
        assert got.loc[key, "ppl"] == pytest.approx(ppl, abs=1e-10)


@pytest.mark.parametrize("order", [2, 3])
def test_modified_discounts_match_brute(order):
    docs = _rep_docs()
    ds = rd.from_items(
        [{"doc_id": i, "text": t} for i, t in docs]).repartition(4)
    got = kn_logprob_scores(ds, order=order, discount="modified",
                            round_to=None).to_pandas().set_index("doc_id")
    exp = _brute(docs, order=order, discount="modified")
    for key, (tot, mean, ppl) in exp.items():
        assert got.loc[key, "logprob"] == pytest.approx(tot, abs=1e-9), key
        assert got.loc[key, "ppl"] == pytest.approx(ppl, abs=1e-9)
    # guard against vacuity: on this corpus modified must actually differ
    # from the single-discount model (counts-of-counts are non-degenerate)
    ney = _brute(docs, order=order, discount="ney")
    assert any(abs(exp[k][0] - ney[k][0]) > 1e-9 for k in exp)


def test_partition_invariance():
    a = kn_logprob_scores(_ds(1), round_to=None).to_pandas().set_index("doc_id").sort_index()
    b = kn_logprob_scores(_ds(7), round_to=None).to_pandas().set_index("doc_id").sort_index()
    for col in ("logprob", "mean_logprob", "ppl"):
        np.testing.assert_allclose(a[col].to_numpy(), b[col].to_numpy(),
                                   rtol=0, atol=1e-12)


def test_non_binding_caps_identical():
    base = kn_logprob_scores(_ds(), round_to=None).to_pandas().set_index("doc_id").sort_index()
    capped = kn_logprob_scores(
        _ds(), round_to=None, max_ngrams=10_000,
        max_vocab=10_000).to_pandas().set_index("doc_id").sort_index()
    np.testing.assert_array_equal(base["logprob"].to_numpy(),
                                  capped["logprob"].to_numpy())


def test_binding_trigram_cap_backs_off_not_crashes():
    # cap keeps only the 3 most frequent trigrams; scores stay finite and
    # docs whose grams all survive are unchanged
    capped = kn_logprob_scores(
        _ds(), round_to=None, max_ngrams=3).to_pandas().set_index("doc_id")
    assert np.isfinite(capped["logprob"].to_numpy()).all()
    assert (capped["ppl"].to_numpy() > 0).all()


def test_fluent_beats_shuffled():
    # doc a (seen fluent trigrams, reinforced by doc f) must out-score the
    # shuffled-word doc c — the CCNet motivation for the filter
    got = kn_logprob_scores(_ds(), round_to=None).to_pandas().set_index("doc_id")
    assert got.loc["a", "ppl"] < got.loc["c", "ppl"]


def test_single_and_empty_docs():
    got = kn_logprob_scores(_ds(), round_to=None).to_pandas().set_index("doc_id")
    # single word doc scores exactly one position (BOS BOS -> w)
    assert got.loc["d", "logprob"] != 0.0
    assert got.loc["d", "mean_logprob"] == pytest.approx(
        got.loc["d", "logprob"], abs=1e-12)
    # empty text scores one '' position, still finite
    assert np.isfinite(got.loc["g", "logprob"])


def test_null_text_rows():
    ds = rd.from_items([{"doc_id": "a", "text": "x y z"},
                        {"doc_id": "n", "text": None}]).repartition(2)
    got = kn_logprob_scores(ds, round_to=None).to_pandas().set_index("doc_id")
    assert got.loc["n", "logprob"] == 0.0
    assert got.loc["n", "ppl"] == 1.0


def test_keep_cols_carried():
    ds = rd.from_items([{"doc_id": "a", "text": "x y", "lang": "en"},
                        {"doc_id": "b", "text": "y x", "lang": "de"}])
    got = kn_logprob_scores(ds, keep_cols=["lang"]).to_pandas().set_index("doc_id")
    assert got.loc["a", "lang"] == "en" and got.loc["b", "lang"] == "de"


def test_prune_identity_at_one():
    base = kn_logprob_scores(_ds(), round_to=None).to_pandas() \
        .set_index("doc_id").sort_index()
    pruned = kn_logprob_scores(
        _ds(), round_to=None,
        prune_min_count=1).to_pandas().set_index("doc_id").sort_index()
    np.testing.assert_array_equal(base["logprob"].to_numpy(),
                                  pruned["logprob"].to_numpy())


@pytest.mark.parametrize("order,prune", [(2, 2), (3, 2), (3, 3)])
def test_prune_matches_brute(order, prune):
    # pruned model == brute reference with the same rule: kept grams keep
    # their exact (full-stats) probabilities, pruned grams back off via
    # gamma(ctx) (or 1.0 when the whole context was pruned). Uses the
    # non-degenerate corpus: on DOCS at order 2 n2=0 makes D exactly 1,
    # and singleton pruning is then provably a no-op (max(1-D,0)=0 and a
    # singleton-only context's gamma = D*n/n = 1) — vacuous as a test.
    docs = _rep_docs()
    ds = rd.from_items(
        [{"doc_id": i, "text": t} for i, t in docs]).repartition(4)
    got = kn_logprob_scores(
        ds, order=order, round_to=None,
        prune_min_count=prune).to_pandas().set_index("doc_id")
    exp = _brute(docs, order=order, prune=prune)
    for key, (tot, mean, ppl) in exp.items():
        assert got.loc[key, "logprob"] == pytest.approx(tot, abs=1e-10), key
        assert got.loc[key, "ppl"] == pytest.approx(ppl, abs=1e-10), key
    # non-vacuity: pruning must actually change at least one doc's score
    base = _brute(docs, order=order)
    assert any(abs(exp[k][0] - base[k][0]) > 1e-9 for k in exp)


def test_task_pool_matches_actor_pool():
    # concurrency=None (plain task map) must agree bit-for-bit with the
    # default autoscaling actor pool
    a = kn_logprob_scores(_ds(), round_to=None).to_pandas() \
        .set_index("doc_id").sort_index()
    b = kn_logprob_scores(_ds(), round_to=None, concurrency=None) \
        .to_pandas().set_index("doc_id").sort_index()
    for col in ("logprob", "mean_logprob", "ppl"):
        np.testing.assert_array_equal(a[col].to_numpy(), b[col].to_numpy())


def test_kn_string_fallback_matches_hash_path(monkeypatch):
    """Force the whole-model string/dict fallback (as a real 64-bit hash
    collision would) and check scores are IDENTICAL to the hash path —
    the bit-exactness guarantee the collision design rests on."""
    import pandas as pd
    import ray.data as rd

    import ballet_ray.stages.knlm as knlm

    docs = pd.DataFrame({
        "doc_id": list(range(8)),
        "text": ["the cat sat on the mat", "the cat ran", "a dog sat",
                 "the mat sat on the cat", "dogs and cats", None, "",
                 "the the the"],
    })
    ds = rd.from_pandas(docs).repartition(3)
    fast = knlm.kn_logprob_scores(ds, round_to=None).to_pandas().sort_values(
        "doc_id").reset_index(drop=True)

    monkeypatch.setattr(knlm, "_collect_level", lambda *a, **k: None)
    slow = knlm.kn_logprob_scores(ds, round_to=None).to_pandas().sort_values(
        "doc_id").reset_index(drop=True)
    for c in ("logprob", "mean_logprob", "ppl"):
        assert (fast[c].to_numpy() == slow[c].to_numpy()).all(), c


def test_kn_fully_pruned_level_backs_off(ray_session=None):
    """prune_min_count above every gram count empties the level tables —
    scoring must back off through the defaults (γ=1 → unigram floor), not
    crash on the schema-less empty collect."""
    import numpy as np
    import pandas as pd
    import ray.data as rd

    import ballet_ray.stages.knlm as knlm

    df = pd.DataFrame({"doc_id": [1, 2], "text": ["a b c d", "e f g h"]})
    out = knlm.kn_logprob_scores(
        rd.from_pandas(df), prune_min_count=99, round_to=None
    ).to_pandas().sort_values("doc_id")
    assert len(out) == 2 and (out["ppl"] > 0).all()
    # all levels pruned -> pure unigram-floor model: every word scores the
    # same, so both docs (4 words each, disjoint vocab) tie exactly
    assert out["logprob"].iloc[0] == out["logprob"].iloc[1]
