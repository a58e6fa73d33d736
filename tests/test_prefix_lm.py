"""prefix_lm_split (stages/sequences.py): reference parity in both hash
modes, concat inverse, rate/short-row edges, repartition invariance."""

import hashlib

import numpy as np
import pytest
import ray.data as rd

from ballet_ray.functions.hashing import splitmix64
from ballet_ray.functions.partition import stable_hash_array
from ballet_ray.stages.sequences import prefix_lm_split

RNG = np.random.default_rng(41)


def _rows(n=40):
    return [{"doc_id": i,
             "tokens": RNG.integers(0, 1000, RNG.integers(0, 30)).astype(np.int32).tolist()}
            for i in range(n)]


def _uniforms(ids, method):
    if method == "md5":
        hx = [hashlib.md5(str(k).encode()).hexdigest() for k in ids]
        return ([int(h[:8], 16) / 2 ** 32 for h in hx],
                [int(h[8:16], 16) / 2 ** 32 for h in hx])
    h = stable_hash_array(np.asarray(ids))
    return (h / 2.0 ** 64).tolist(), (splitmix64(h) / 2.0 ** 64).tolist()


@pytest.mark.parametrize("method", ["siphash", "md5"])
def test_matches_reference(method):
    rows = _rows()
    us, ua = _uniforms([r["doc_id"] for r in rows], method)
    got = {r["doc_id"]: (list(r["inputs"]), list(r["targets"]))
           for r in prefix_lm_split(rd.from_items(rows).repartition(4),
                                    rate=0.6, method=method).take_all()}
    for r, s, a in zip(rows, us, ua):
        toks = list(r["tokens"])
        L = len(toks)
        if s < 0.6 and L >= 2:
            c = 1 + int(a * (L - 1))
            want = (toks[:c], toks[c:])
            assert 1 <= c <= L - 1
        else:
            want = (toks, [])
        assert got[r["doc_id"]] == want, r["doc_id"]


def test_concat_inverse_and_invariance():
    rows = _rows(30)
    out = prefix_lm_split(rd.from_items(rows).repartition(5), rate=1.0).take_all()
    src = {r["doc_id"]: list(r["tokens"]) for r in rows}
    for r in out:
        assert list(r["inputs"]) + list(r["targets"]) == src[r["doc_id"]]
        if len(src[r["doc_id"]]) >= 2:
            assert r["n_in"] >= 1 and r["n_tgt"] >= 1  # both sides non-empty
    a = sorted((r["doc_id"], list(r["inputs"])) for r in out)
    b = sorted((r["doc_id"], list(r["inputs"])) for r in
               prefix_lm_split(rd.from_items(rows).repartition(1), rate=1.0).take_all())
    assert a == b
    with pytest.raises(ValueError):
        prefix_lm_split(rd.from_items(rows), rate=-0.1)
