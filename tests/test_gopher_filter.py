"""gopher_quality_filter: the complete published Gopher rule set as one
fused pass — each rule individually drops its planted violator while the
good document survives every rule."""

import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd

from ballet_ray.stages.text import GOPHER_THRESHOLDS, gopher_quality_filter

RNG = np.random.RandomState(11)
VOCAB = ["apple", "river", "stone", "cloud", "tiger", "metal", "grain",
         "light", "sound", "patch", "field", "crane", "lemon", "brick"]


def _good(i=0, n=80):
    # ~80 distinct-ish mid-length words + stop words, multi-line
    words = RNG.choice(VOCAB, n).tolist()
    words[0] = f"doc{i}"
    lines = [" ".join(words[j:j + 16]) + " with the others"
             for j in range(0, n, 16)]
    return "\n".join(lines)


def _keep(texts, **kw):
    ds = rd.from_items([{"doc_id": i, "text": t}
                        for i, t in enumerate(texts)])
    return sorted(gopher_quality_filter(ds, **kw)
                  .to_pandas()["doc_id"].tolist())


def test_good_doc_survives(ray_session):
    assert _keep([_good()]) == [0]


@pytest.mark.parametrize("bad,rule", [
    ("short with the text.", "min_words"),
    (" ".join(["of to be"] * 40), "min_mean_word_len"),
    (" ".join(["absolutely-enormous-hyphenated-construction"] * 60)
     + " with the", "max_mean_word_len"),
    (_good() + " " + " ".join(["#"] * 30), "max_symbol_word_ratio"),
    ("\n".join("- bullet with the point " + w for w in VOCAB * 5),
     "max_bullet_line_frac"),
    ("\n".join(" ".join(RNG.choice(VOCAB, 12)) + " with the end..."
               for _ in range(10)), "max_ellipsis_line_frac"),
    (_good() + "\n" + " ".join(["12345"] * 40), "min_alpha_word_frac"),
    (" ".join(RNG.choice(VOCAB, 80)), "min_stop_hits"),
    ("\n".join([_good(1)] + [" ".join(RNG.choice(VOCAB, 10))] * 2
               + ["repeated line with the words"] * 6), "max_dup_line_frac"),
    (_good(2) + ("\n\n" + _good(3)) + ("\n\n" + _good(3)) * 2,
     "max_dup_para_frac"),
])
def test_each_rule_drops_its_violator(ray_session, bad, rule):
    kept = _keep([_good(9), bad])
    assert kept == [0], f"rule {rule} did not drop the violator"


def test_ngram_rules(ray_session):
    # top-2-gram dominance: the same bigram over and over
    bad = " ".join(["quick brown"] * 40) + " with the"
    assert _keep([_good(4), bad]) == [0]
    # disabled via overrides -> survives the ngram rule (and the word dup
    # rules don't apply at the word level in this preset)
    kept = _keep([bad], overrides={"max_top_ngram_frac": {},
                                   "max_dup_ngram_frac": {},
                                   "min_mean_word_len": None})
    assert kept == [0]


def test_emit_signals_and_overrides(ray_session):
    ds = rd.from_items([{"doc_id": 0, "text": _good(7)}])
    df = gopher_quality_filter(ds, emit_signals=True).to_pandas()
    for c in ("words_ws", "mean_word_len", "dup_line_frac", "stop_hits",
              "top_2gram_frac", "dup_10gram_frac"):
        assert c in df.columns
    with pytest.raises(KeyError):
        gopher_quality_filter(ds, overrides={"nope": 1}).to_pandas()


def test_thresholds_table_is_published_set():
    assert GOPHER_THRESHOLDS["min_words"] == 50
    assert GOPHER_THRESHOLDS["max_dup_ngram_frac"][10] == 0.10


def test_fineweb_filter_rules(ray_session):
    from ballet_ray.stages.text import fineweb_quality_filter

    good = "\n".join(
        f"A decent sentence number {j} with plenty of characters here."
        for j in range(6))
    no_punct = "\n".join(
        f"line {j} never terminates with punctuation at all here today"
        for j in range(6))
    shorty = "\n".join(["tiny line."] * 5 + [good.split("\n")[0]])
    dup_chars = "\n".join(
        ["An identical long line that repeats and repeats itself here."] * 4
        + [f"A unique closing sentence number {j}." for j in range(2)])
    ds = rd.from_items([
        {"doc_id": 0, "text": good},
        {"doc_id": 1, "text": no_punct},   # punct_line_frac = 0
        {"doc_id": 2, "text": shorty},     # short_line_frac = 5/6 >= 0.67
        {"doc_id": 3, "text": dup_chars},  # dup_line_char_frac >= 0.1
    ])
    kept = sorted(fineweb_quality_filter(ds).to_pandas()["doc_id"])
    assert kept == [0]
    # disabling rules via overrides
    kept2 = sorted(fineweb_quality_filter(
        ds, overrides={"min_punct_line_frac": None,
                       "max_short_line_frac": None,
                       "max_dup_line_char_frac": None})
        .to_pandas()["doc_id"])
    assert kept2 == [0, 1, 2, 3]
    df = fineweb_quality_filter(ds, emit_signals=True).to_pandas()
    assert {"punct_line_frac", "dup_line_char_frac",
            "short_line_frac"} <= set(df.columns)
    with pytest.raises(KeyError):
        fineweb_quality_filter(ds, overrides={"zzz": 1}).to_pandas()
