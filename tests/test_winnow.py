"""Winnowing fingerprints (text.winnow_fingerprints)."""

import numpy as np
import ray.data as rd

from ballet_ray.functions.hashing import splitmix64
from ballet_ray.functions.partition import stable_hash_array
from ballet_ray.stages.text import winnow_fingerprints

K, W = 3, 4


def _brute(text):
    words = text.split(" ")
    if len(words) < K:
        return []
    wh = stable_hash_array(np.asarray(words, dtype=object))
    PRIME = np.uint64(1099511628211)
    n_kg = len(words) - K + 1
    acc = np.zeros(n_kg, np.uint64)
    with np.errstate(over="ignore"):
        for j in range(K):
            acc = acc * PRIME + wh[j: j + n_kg]
    kg = splitmix64(acc)
    w = min(W, n_kg)
    sel = set()
    out = []
    for s in range(n_kg - w + 1):
        win = kg[s: s + w]
        mn = win.min()
        # rightmost minimum
        pos = s + (w - 1 - int(np.argmin(win[::-1])))
        if pos not in sel:
            sel.add(pos)
            out.append(int(np.int64(kg[pos])))
    # document order of selected positions
    return [int(np.int64(kg[p])) for p in sorted(sel)]


def _ds(rows, parts=3):
    return rd.from_items([{"doc_id": i, "text": t} for i, t in rows]).repartition(parts)


def test_matches_brute():
    rows = [
        ("a", "the quick brown fox jumps over the lazy dog again and again"),
        ("b", "alpha beta gamma delta epsilon zeta eta theta iota"),
        ("c", "x y"),                      # shorter than k -> empty
        ("d", "one two three"),            # exactly k words -> one k-gram
    ]
    out = winnow_fingerprints(_ds(rows), k=K, window=W).to_pandas().set_index("doc_id")
    for i, t in rows:
        assert list(out.loc[i, "fingerprints"]) == _brute(t)
        assert out.loc[i, "n_fp"] == len(_brute(t))


def test_shared_run_guarantee():
    # any shared run of >= window + k - 1 words must share a fingerprint
    shared = "p q r s t u v w"  # 8 words >= W + K - 1 = 6
    rows = [
        ("a", "one two three " + shared + " four five"),
        ("b", "nine eight " + shared + " seven six five four"),
    ]
    out = winnow_fingerprints(_ds(rows, 2), k=K, window=W).to_pandas().set_index("doc_id")
    fa, fb = set(out.loc["a", "fingerprints"]), set(out.loc["b", "fingerprints"])
    assert fa & fb


def test_partition_invariance():
    rows = [(f"d{i}", " ".join(f"w{(i * 7 + j) % 13}" for j in range(20))) for i in range(12)]
    a = winnow_fingerprints(_ds(rows, 1), k=K, window=W).to_pandas().set_index("doc_id")
    b = winnow_fingerprints(_ds(rows, 6), k=K, window=W).to_pandas().set_index("doc_id")
    for i, _ in rows:
        assert list(a.loc[i, "fingerprints"]) == list(b.loc[i, "fingerprints"])


def test_density():
    # winnowing keeps roughly 2/(w+1) of k-gram hashes on random text
    rng = np.random.RandomState(3)
    text = " ".join(f"t{v}" for v in rng.randint(0, 10_000, 2000))
    out = winnow_fingerprints(_ds([("a", text)], 1), k=K, window=W).to_pandas()
    frac = out["n_fp"].iloc[0] / (2000 - K + 1)
    assert 0.2 <= frac <= 0.6  # 2/(W+1) = 0.4 ± slack


def test_similarity_pairs():
    from ballet_ray.stages.text import winnow_similarity_pairs

    shared = " ".join(f"s{j}" for j in range(12))
    rows = [
        ("a", "one two three " + shared + " four five"),
        ("b", "nine eight " + shared + " seven six"),
        ("c", " ".join(f"u{j}" for j in range(20))),  # unrelated
    ]
    out = winnow_similarity_pairs(_ds(rows, 2), k=K, window=W,
                                  min_shared=1).to_pandas()
    got = {tuple(sorted((r["id_a"], r["id_b"]))) for _, r in out.iterrows()}
    assert ("a", "b") in got
    assert all("c" not in p for p in got)


def test_similarity_threshold_filters():
    from ballet_ray.stages.text import winnow_similarity_pairs

    long = " ".join(f"p{j}" for j in range(30))
    rows = [
        ("a", long),
        ("b", long),                      # identical -> many shared fingerprints
        ("c", "z z2 z3 p0 p1 p2 x9 y8"),  # small overlap with the long docs
    ]
    hi = winnow_similarity_pairs(_ds(rows, 2), k=K, window=W,
                                 min_shared=3).to_pandas()
    got = {tuple(sorted((r["id_a"], r["id_b"]))) for _, r in hi.iterrows()}
    assert got == {("a", "b")}
