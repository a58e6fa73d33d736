"""span_corruption (stages/sequences.py): per-row python-reference parity
(same keyed-gap derivation, scalar hashing), T5 layout invariants,
segmentation uniformity sanity, repartition invariance, short-doc edges."""

import numpy as np
import pytest
import ray.data as rd

from ballet_ray.functions.hashing import mix
from ballet_ray.functions.partition import stable_hash_array
from ballet_ray.stages.sequences import span_corruption

RNG = np.random.default_rng(23)


def _rows(n=40, max_len=60):
    return [{"doc_id": i,
             "tokens": RNG.integers(0, 1000, RNG.integers(0, max_len)).astype(np.int32).tolist()}
            for i in range(n)]


def _ref_segment(m, k, h, salt):
    keys = [int(mix(np.uint64(h), np.uint64(g), np.uint64(salt))) for g in range(m - 1)]
    cut_gaps = sorted(sorted(range(m - 1), key=lambda g: (keys[g], g))[:k - 1])
    bounds = [0] + [c + 1 for c in cut_gaps] + [m]
    return [bounds[i + 1] - bounds[i] for i in range(k)]


def _reference(rows, density, mean_span, seed):
    out = {}
    for r in rows:
        toks = list(r["tokens"])
        L = len(toks)
        if L < 2:
            out[r["doc_id"]] = (toks, [])
            continue
        h = int(mix(stable_hash_array(np.asarray([r["doc_id"]]))[0], np.uint64(seed)))
        nn = int(np.clip(np.round(L * density), 1, max(L - 1, 1)))
        ns = max(int(np.round(nn / mean_span)), 1)
        ns = min(ns, nn, max(L - nn, 1))
        p = _ref_segment(L - nn, ns, h, seed * 2 + 1)
        q = _ref_segment(nn, ns, h, seed * 2 + 2)
        inp, tgt, pos = [], [], 0
        for k in range(ns):
            inp += toks[pos:pos + p[k]] + [-(k + 1)]
            tgt += [-(k + 1)] + toks[pos + p[k]:pos + p[k] + q[k]]
            pos += p[k] + q[k]
        tgt.append(-(ns + 1))
        out[r["doc_id"]] = (inp, tgt)
    return out


def test_matches_reference():
    rows = _rows()
    got = {r["doc_id"]: (list(r["inputs"]), list(r["targets"]), r["n_in"], r["n_tgt"])
           for r in span_corruption(rd.from_items(rows).repartition(4),
                                    noise_density=0.15, mean_span_len=3.0,
                                    seed=99).take_all()}
    want = _reference(rows, 0.15, 3.0, 99)
    for did, (inp, tgt) in want.items():
        gi, gt, ni, nt = got[did]
        assert gi == inp and gt == tgt, did
        assert ni == len(inp) and nt == len(tgt)


def test_t5_layout_invariants():
    rows = _rows(25, 80)
    out = span_corruption(rd.from_items(rows), noise_density=0.3,
                          mean_span_len=2.0).take_all()
    src = {r["doc_id"]: list(r["tokens"]) for r in rows}
    for r in out:
        toks = src[r["doc_id"]]
        L = len(toks)
        if L < 2:
            assert list(r["inputs"]) == toks and list(r["targets"]) == []
            continue
        inp, tgt = list(r["inputs"]), list(r["targets"])
        ns = sum(1 for x in inp if x < 0)
        # sentinel sequences: inputs end each keep-span, targets lead each
        # noise-span, terminal closes the targets
        assert [x for x in inp if x < 0] == [-(k + 1) for k in range(ns)]
        assert [x for x in tgt if x < 0] == [-(k + 1) for k in range(ns + 1)]
        assert tgt[-1] == -(ns + 1)
        # splice inverse: inputs+targets reconstruct the original tokens
        rebuilt = []
        segs = {}
        cur, key = [], 0
        for x in tgt[:-1]:
            if x < 0:
                if cur:
                    segs[key] = cur
                key, cur = x, []
            else:
                cur.append(x)
        segs[key] = cur
        for x in inp:
            if x < 0:
                rebuilt += segs.get(x, [])
            else:
                rebuilt.append(x)
        assert rebuilt == toks, r["doc_id"]
        # every span on both sides >= 1 token (T5's each->=1 rule)
        for s in segs.values():
            assert len(s) >= 1


def test_density_and_span_stats():
    rows = [{"doc_id": i, "tokens": RNG.integers(0, 9, 200).astype(np.int32).tolist()}
            for i in range(300)]
    out = span_corruption(rd.from_items(rows), noise_density=0.15,
                          mean_span_len=3.0).take_all()
    noise = sum(r["n_tgt"] - (sum(1 for x in r["targets"] if x < 0)) for r in out)
    spans = sum(sum(1 for x in r["targets"] if x < 0) - 1 for r in out)
    total = 200 * 300
    assert abs(noise / total - 0.15) < 0.01          # exact by construction
    assert abs(noise / spans - 3.0) < 0.2            # mean span length


def test_repartition_invariant_and_edges():
    rows = _rows(30)
    a = sorted((r["doc_id"], list(r["inputs"]), list(r["targets"]))
               for r in span_corruption(rd.from_items(rows).repartition(1)).take_all())
    b = sorted((r["doc_id"], list(r["inputs"]), list(r["targets"]))
               for r in span_corruption(rd.from_items(rows).repartition(6)).take_all())
    assert a == b
    out = span_corruption(rd.from_items(
        [{"doc_id": 0, "tokens": []}, {"doc_id": 1, "tokens": [5]},
         {"doc_id": 2, "tokens": [5, 6]}])).take_all()
    by = {r["doc_id"]: r for r in out}
    assert list(by[0]["inputs"]) == [] and list(by[0]["targets"]) == []
    assert list(by[1]["inputs"]) == [5] and list(by[1]["targets"]) == []
    assert by[2]["n_tgt"] > 0  # two tokens: one noise, one keep
    with pytest.raises(ValueError):
        span_corruption(rd.from_items(rows), noise_density=1.5)
