"""GopherSignals (Rae et al. 2021 §A1.1 structural rules): hand-computed
expectations per signal, null/empty handling, partition invariance."""

import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd

from ballet_ray.feature import Feature
from ballet_ray.pipeline import FeatureEngineeringPipeline
from ballet_ray.stages.text import GOPHER_STOP_WORDS, GopherSignals


def _sig(texts):
    t = pa.table({"text": texts})
    return GopherSignals().transform_table(t, ["text"]).to_pandas()


def test_line_and_char_repetition():
    # 8 lines, dup "alpha line one." (15 ch) and "- bullet a" (10 ch)
    doc = ("alpha line one.\nalpha line one.\nbeta two\n\n"
           "- bullet a\n- bullet a\nwaiting...\n…")
    r = _sig([doc]).iloc[0]
    assert r.n_lines == 8
    assert r.dup_line_frac == pytest.approx(1 - 6 / 8)
    # chars: 15+15+8+0+10+10+10+1=69 total, 44 distinct
    assert r.dup_line_char_frac == pytest.approx(1 - 44 / 69)
    assert r.dup_para_frac == 0.0 and r.dup_para_char_frac == 0.0


def test_paragraph_repetition():
    doc = "para one here\n\npara two here\n\npara one here"
    r = _sig([doc]).iloc[0]
    assert r.dup_para_frac == pytest.approx(1 - 2 / 3)
    assert r.dup_para_char_frac == pytest.approx(1 - 26 / 39)


def test_bullet_ellipsis_symbols_alpha():
    doc = ("- first bullet\n* second bullet\n• third bullet\n"
           "drifting off...\nplain line\nanother one…")
    r = _sig([doc]).iloc[0]
    assert r.bullet_line_frac == pytest.approx(3 / 6)
    assert r.ellipsis_line_frac == pytest.approx(2 / 6)
    # symbols: one "..." + one "…" over 15 whitespace words
    assert r.symbol_word_ratio == pytest.approx(2 / 15)
    # non-alpha words: "-" "*" "•" -> 12/15 alpha
    assert r.alpha_word_frac == pytest.approx(12 / 15)


def test_stop_hits_word_boundaries():
    assert _sig(["the cat"]).iloc[0].stop_hits == 1
    assert _sig(["theme other"]).iloc[0].stop_hits == 0  # no bare 'the'
    full = " ".join(GOPHER_STOP_WORDS)
    assert _sig([full.upper()]).iloc[0].stop_hits == 8  # case-insensitive
    assert _sig(["To be, that is."]).iloc[0].stop_hits == 3


def test_null_and_empty():
    df = _sig(["", None])
    assert (df.n_lines == 1).all()
    # the single empty line counts as a short line; everything else is 0
    assert (df.short_line_frac == 1.0).all()
    assert (df.drop(columns=["n_lines", "short_line_frac"]).to_numpy()
            == 0).all()


def test_dataset_partition_invariance(ray_session):
    rng = np.random.RandomState(7)
    docs = []
    for i in range(50):
        lines = [f"doc {i} line {j} with the words" for j in range(5)]
        lines += [lines[0]] * (i % 3)  # varying duplication
        docs.append({"doc_id": i, "text": "\n".join(lines)})
    pipe = FeatureEngineeringPipeline([Feature("text", GopherSignals())])
    a = (pipe.fit_transform(rd.from_items(docs))
         .to_pandas().sort_values("doc_id").reset_index(drop=True))
    b = (pipe.fit_transform(rd.from_items(docs).repartition(11))
         .to_pandas().sort_values("doc_id").reset_index(drop=True))
    assert a.equals(b)
    assert a.loc[1, "dup_line_frac"] == pytest.approx(1 - 5 / 6)
    assert (a["stop_hits"] == 2).all()  # 'the' + 'with'
