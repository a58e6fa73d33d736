"""DSIR importance resampling (stages/dsir.py) — brute-force parity in
both hash modes, partition invariance, Gumbel-top-k selection parity."""

import hashlib

import numpy as np
import pytest
import ray.data as rd

from ballet_ray.stages.dsir import dsir_log_weights, dsir_resample

RAW = [
    ("a", "the cat sat on the mat"),
    ("b", "dogs bark loud"),
    ("c", "the cat ran"),
    ("d", "stocks fell sharply today"),
    ("e", "cat cat cat"),
    ("f", "one"),
]
TGT = [("t1", "the cat sat"), ("t2", "a cat ran fast")]
B, ALPHA = 97, 1.0


def _grams(text):
    w = text.split(" ")
    return w + [f"{w[i]} {w[i + 1]}" for i in range(len(w) - 1)]


def _bucket_md5(g):
    return int(hashlib.md5(g.encode()).hexdigest()[:8], 16) % B


def _brute_logw(bucket_fn):
    def counts(corpus):
        c = np.zeros(B)
        for _, t in corpus:
            for g in _grams(t):
                c[bucket_fn(g)] += 1
        return c

    ct, cr = counts(TGT), counts(RAW)
    lam = (
        np.log(ct + ALPHA) - np.log(ct.sum() + ALPHA * B)
        - np.log(cr + ALPHA) + np.log(cr.sum() + ALPHA * B)
    )
    return {i: sum(lam[bucket_fn(g)] for g in _grams(t)) for i, t in RAW}


def _ds(rows, parts):
    return rd.from_items([{"doc_id": i, "text": t} for i, t in rows]).repartition(parts)


def test_logw_matches_brute_md5():
    out = dsir_log_weights(_ds(RAW, 3), _ds(TGT, 2), buckets=B, alpha=ALPHA,
                           method="md5", round_to=None).to_pandas()
    exp = _brute_logw(_bucket_md5)
    got = dict(zip(out["doc_id"], out["logw"]))
    assert set(got) == set(exp)
    for k in exp:
        assert got[k] == pytest.approx(exp[k], abs=1e-12)


def test_logw_matches_brute_siphash():
    from ballet_ray.functions.partition import stable_hash_array

    def bucket_sip(g):
        return int(stable_hash_array(np.asarray([g], dtype=object))[0] % np.uint64(B))

    out = dsir_log_weights(_ds(RAW, 2), _ds(TGT, 1), buckets=B, alpha=ALPHA,
                           method="siphash", round_to=None).to_pandas()
    exp = _brute_logw(bucket_sip)
    got = dict(zip(out["doc_id"], out["logw"]))
    for k in exp:
        assert got[k] == pytest.approx(exp[k], abs=1e-12)


def test_partition_invariance():
    a = dsir_log_weights(_ds(RAW, 1), _ds(TGT, 1), buckets=B, method="md5",
                         round_to=None).to_pandas().set_index("doc_id")["logw"]
    b = dsir_log_weights(_ds(RAW, 4), _ds(TGT, 2), buckets=B, method="md5",
                         round_to=None).to_pandas().set_index("doc_id")["logw"]
    for k in a.index:
        assert a[k] == pytest.approx(b[k], abs=1e-12)


def test_resample_gumbel_topk_parity():
    out = dsir_resample(_ds(RAW, 3), _ds(TGT, 2), k=3, buckets=B,
                        salt="s7", method="md5", round_to=None).to_pandas()
    logw = _brute_logw(_bucket_md5)

    def gumbel(i):
        u = (int(hashlib.md5(("s7" + str(i)).encode()).hexdigest()[:8], 16) + 0.5) / 2.0**32
        return -np.log(-np.log(u))

    keys = sorted(((logw[i] + gumbel(i), i) for i in logw), reverse=True)
    assert list(out["doc_id"]) == [i for _, i in keys[:3]]
    assert list(out["key"]) == pytest.approx([k for k, _ in keys[:3]], abs=1e-12)


def test_single_word_and_repeat_docs():
    # "one" has 1 unigram / 0 bigrams; "cat cat cat" exercises repeated grams
    out = dsir_log_weights(_ds(RAW, 2), _ds(TGT, 1), buckets=B, method="md5",
                           round_to=None).to_pandas()
    got = dict(zip(out["doc_id"], out["logw"]))
    lamf = _brute_logw(_bucket_md5)["f"]
    assert got["f"] == pytest.approx(lamf, abs=1e-12)
    # repeated grams count with multiplicity: e = 3×λ(cat) + 2×λ(cat cat)
    assert got["e"] == pytest.approx(_brute_logw(_bucket_md5)["e"], abs=1e-12)


def test_empty_target_clear_error():
    raw = _ds(RAW, 2)
    empty = raw.filter(lambda r: False)
    with pytest.raises(ValueError, match="target corpus is empty"):
        dsir_log_weights(raw, empty, buckets=B, method="md5").materialize()


def test_bad_method_eager_error():
    with pytest.raises(ValueError, match="method"):
        dsir_log_weights(_ds(RAW, 1), _ds(TGT, 1), buckets=B, method="sha1")


from hypothesis import given, settings, strategies as st

_word = st.sampled_from(["cat", "dog", "sun", "run", "big", "sky"])
_text = st.lists(_word, min_size=1, max_size=8).map(" ".join)


@settings(max_examples=10, deadline=None)
@given(
    raw=st.lists(_text, min_size=2, max_size=10),
    tgt=st.lists(_text, min_size=1, max_size=4),
    parts=st.integers(1, 3),
)
def test_property_matches_brute(raw, tgt, parts):
    raw_rows = [(f"r{i}", t) for i, t in enumerate(raw)]
    tgt_rows = [(f"t{i}", t) for i, t in enumerate(tgt)]
    out = dsir_log_weights(_ds(raw_rows, parts), _ds(tgt_rows, 1),
                           buckets=31, alpha=0.7, method="md5",
                           round_to=None).to_pandas()
    got = dict(zip(out["doc_id"], out["logw"]))

    def counts(corpus):
        c = np.zeros(31)
        for _, t in corpus:
            for g in _grams(t):
                c[_bucket31(g)] += 1
        return c

    def _bucket31(g):
        return int(hashlib.md5(g.encode()).hexdigest()[:8], 16) % 31

    ct, cr = counts(tgt_rows), counts(raw_rows)
    lam = (np.log(ct + 0.7) - np.log(ct.sum() + 0.7 * 31)
           - np.log(cr + 0.7) + np.log(cr.sum() + 0.7 * 31))
    for i, t in raw_rows:
        exp = sum(lam[_bucket31(g)] for g in _grams(t))
        assert got[i] == pytest.approx(exp, abs=1e-10)


def test_block_of_null_texts_schema_regression():
    """A block of all-NULL texts yields no grams at all; the logw column
    must stay float64 (empty-weights bincount returns int64 and would
    flip the schema). Empty STRINGS are different: split("") gives one
    ""-gram, which scores normally."""
    import pandas as pd
    import ray.data as rd

    raw = rd.from_pandas(pd.DataFrame({
        "doc_id": ["e0", "e1", "d0", "d1"],
        "text": pd.array([None, None, "a b a", "b c"], dtype="string"),
    })).repartition(2)  # block 0 = the two null docs
    tgt = rd.from_items([{"doc_id": "t0", "text": "a b c"}])
    got = dsir_log_weights(raw, tgt).to_pandas().set_index("doc_id")
    assert len(got) == 4 and got["logw"].dtype == np.float64
    assert got.loc["e0", "logw"] == 0.0 and got.loc["e1", "logw"] == 0.0
