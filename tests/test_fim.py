"""fim_transform (stages/sequences.py): per-row python-reference parity in
both hash modes, repartition invariance, rate edges, segment conservation,
empty/short docs."""

import hashlib

import numpy as np
import pytest
import ray.data as rd

from ballet_ray.functions.hashing import splitmix64
from ballet_ray.functions.partition import stable_hash_array
from ballet_ray.stages.sequences import fim_transform

RNG = np.random.default_rng(11)


def _rows(n=40, max_len=25):
    return [{"doc_id": i,
             "tokens": RNG.integers(0, 1000, RNG.integers(0, max_len)).astype(np.int32).tolist()}
            for i in range(n)]


def _uniforms(ids, method):
    if method == "md5":
        hx = [hashlib.md5(str(k).encode()).hexdigest() for k in ids]
        return ([int(h[:8], 16) / 2 ** 32 for h in hx],
                [int(h[8:16], 16) / 2 ** 32 for h in hx],
                [int(h[16:24], 16) / 2 ** 32 for h in hx])
    h = stable_hash_array(np.asarray(ids))
    h2 = splitmix64(h)
    h3 = splitmix64(h2)
    return (h / 2.0 ** 64).tolist(), (h2 / 2.0 ** 64).tolist(), (h3 / 2.0 ** 64).tolist()


def _reference(rows, rate, method):
    ids = [r["doc_id"] for r in rows]
    us, ua, ub = _uniforms(ids, method)
    out = {}
    for r, s, a_, b_ in zip(rows, us, ua, ub):
        toks = list(r["tokens"])
        if s < rate:
            L = len(toks)
            A, B = int(a_ * (L + 1)), int(b_ * (L + 1))
            u, v = min(A, B), max(A, B)
            toks = [-1] + toks[:u] + [-2] + toks[v:] + [-3] + toks[u:v]
        out[r["doc_id"]] = toks
    return out


@pytest.mark.parametrize("method", ["siphash", "md5"])
def test_matches_reference(method):
    rows = _rows()
    got = {r["doc_id"]: (list(r["tokens"]), r["n_tok"])
           for r in fim_transform(rd.from_items(rows).repartition(4),
                                  rate=0.5, method=method).take_all()}
    want = _reference(rows, 0.5, method)
    for did, toks in want.items():
        assert got[did] == (toks, len(toks)), did
    n_sel = sum(len(w) - len(r["tokens"]) == 3
                for w, r in zip(want.values(), rows))
    assert 0 < n_sel < len(rows)  # both branches exercised


def test_repartition_invariant():
    rows = _rows(30)
    a = sorted((r["doc_id"], list(r["tokens"])) for r in
               fim_transform(rd.from_items(rows).repartition(1), rate=0.7).take_all())
    b = sorted((r["doc_id"], list(r["tokens"])) for r in
               fim_transform(rd.from_items(rows).repartition(6), rate=0.7).take_all())
    assert a == b


def test_rate_edges_and_conservation():
    rows = _rows(20)
    noop = fim_transform(rd.from_items(rows), rate=0.0).take_all()
    assert {r["doc_id"]: list(r["tokens"]) for r in noop} == \
           {r["doc_id"]: list(r["tokens"]) for r in rows}
    allt = fim_transform(rd.from_items(rows), rate=1.0).take_all()
    by_id = {r["doc_id"]: r for r in allt}
    for r in rows:
        out = list(by_id[r["doc_id"]]["tokens"])
        assert out.count(-1) == out.count(-2) == out.count(-3) == 1
        assert out[0] == -1
        # payload multiset conserved and segment order re-derivable
        i_suf, i_mid = out.index(-2), out.index(-3)
        rebuilt = out[i_mid + 1:] + out[i_suf + 1:i_mid]  # middle + suffix
        assert out[1:i_suf] + rebuilt == list(r["tokens"])
    with pytest.raises(ValueError):
        fim_transform(rd.from_items(rows), rate=1.5)


def test_empty_doc():
    out = fim_transform(rd.from_items([{"doc_id": 0, "tokens": []}]), rate=1.0).take_all()
    assert list(out[0]["tokens"]) == [-1, -2, -3] and out[0]["n_tok"] == 3
