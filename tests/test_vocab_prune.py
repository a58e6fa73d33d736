"""fit_vocab_prune / apply_vocab_prune (stages/sequences.py): brute
reference parity, deterministic tie-break at the cap, OOV→UNK, edges."""

import numpy as np
import ray.data as rd

from ballet_ray.stages.sequences import apply_vocab_prune, fit_vocab_prune

RNG = np.random.default_rng(31)


def _rows(n=50):
    # zipf-ish ids so the top-k cap bites and ties exist
    return [{"doc_id": i,
             "tokens": (RNG.zipf(1.5, RNG.integers(1, 30)) % 40).astype(np.int32).tolist()}
            for i in range(n)]


def test_matches_brute_reference():
    rows = _rows()
    ds = rd.from_items(rows).repartition(4)
    kept, new = fit_vocab_prune(ds, keep=8)
    # brute: count, sort by (count desc, id asc), take 8, rank 1..8
    cnt = {}
    for r in rows:
        for t in r["tokens"]:
            cnt[t] = cnt.get(t, 0) + 1
    top = sorted(cnt, key=lambda t: (-cnt[t], t))[:8]
    want_map = {t: i + 1 for i, t in enumerate(top)}
    assert dict(zip(kept.tolist(), new.tolist())) == want_map

    got = {r["doc_id"]: (list(r["tokens"]), r["n_unk"])
           for r in apply_vocab_prune(ds, kept, new).take_all()}
    for r in rows:
        want = [want_map.get(t, 0) for t in r["tokens"]]
        assert got[r["doc_id"]] == (want, want.count(0)), r["doc_id"]


def test_partition_invariant_and_edges():
    rows = _rows(30)
    k1, n1 = fit_vocab_prune(rd.from_items(rows).repartition(1), keep=5)
    k6, n6 = fit_vocab_prune(rd.from_items(rows).repartition(6), keep=5)
    assert k1.tolist() == k6.tolist() and n1.tolist() == n6.tolist()
    # keep larger than the live vocab: identity-shaped dense remap, no UNK
    ds = rd.from_items([{"doc_id": 0, "tokens": [3, 3, 7]},
                        {"doc_id": 1, "tokens": []}])
    kept, new = fit_vocab_prune(ds, keep=100)
    out = {r["doc_id"]: (list(r["tokens"]), r["n_unk"])
           for r in apply_vocab_prune(ds, kept, new).take_all()}
    assert out[0] == ([1, 1, 2], 0)   # 3 is more frequent -> rank 1
    assert out[1] == ([], 0)
