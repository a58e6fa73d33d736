"""Deterministic, vectorized 64-bit hashing (splitmix64 over fnv1a-style mixes).

Pure functions of their integer inputs — no RNG state — so any shard of the
synthetic corpus can be regenerated independently (needed for resume tests,
FIXTURES.md §A) and so partitioning decisions are reproducible across runs
and cluster sizes.
"""

from __future__ import annotations

import numpy as np

_U64 = np.uint64
_MASK = _U64(0xFFFFFFFFFFFFFFFF)


def _splitmix64_inplace(z: np.ndarray, t: np.ndarray) -> None:
    """splitmix64 finalizer on a uint64 working buffer (t = same-shape
    scratch). Same math as the expression form, but two buffers instead of
    ~eight temporaries — the hash is memory-bandwidth-bound at corpus
    batch sizes."""
    z += _U64(0x9E3779B97F4A7C15)
    np.right_shift(z, _U64(30), out=t)
    z ^= t
    z *= _U64(0xBF58476D1CE4E5B9)
    np.right_shift(z, _U64(27), out=t)
    z ^= t
    z *= _U64(0x94D049BB133111EB)
    np.right_shift(z, _U64(31), out=t)
    z ^= t


def splitmix64(x: np.ndarray | int) -> np.ndarray:
    """Vectorized splitmix64 finalizer. Accepts/returns uint64."""
    z = np.asarray(x, dtype=_U64)
    if z.ndim == 0:  # scalar path: keep 0-d semantics, cost is irrelevant
        with np.errstate(over="ignore"):
            z = (z + _U64(0x9E3779B97F4A7C15)) & _MASK
            z = ((z ^ (z >> _U64(30))) * _U64(0xBF58476D1CE4E5B9)) & _MASK
            z = ((z ^ (z >> _U64(27))) * _U64(0x94D049BB133111EB)) & _MASK
            return z ^ (z >> _U64(31))
    z = z.copy()
    t = np.empty_like(z)
    with np.errstate(over="ignore"):
        _splitmix64_inplace(z, t)
    return z


def mix(*parts: np.ndarray | int) -> np.ndarray:
    """Combine any number of integer arrays/scalars into one uint64 hash.
    Bit-identical to the expression form ``acc = splitmix64((p ^ acc) *
    FNV_PRIME)`` per part, but with in-place buffers for array inputs (the
    hash is bandwidth-bound at corpus batch sizes)."""
    arrs = [np.asarray(p, dtype=_U64) for p in parts]
    if all(a.ndim == 0 for a in arrs):  # scalar path: original expression
        acc = _U64(0xCBF29CE484222325)
        with np.errstate(over="ignore"):
            for a in arrs:
                acc = splitmix64((a ^ acc) * _U64(0x100000001B3) & _MASK)
        return acc
    shape = np.broadcast_shapes(*(a.shape for a in arrs))
    acc = np.full(shape, _U64(0xCBF29CE484222325))
    scratch = np.empty_like(acc)
    with np.errstate(over="ignore"):
        for a in arrs:
            np.bitwise_xor(a, acc, out=acc)
            acc *= _U64(0x100000001B3)
            _splitmix64_inplace(acc, scratch)
    return acc


def hash_strings(values, seed: int = 0) -> np.ndarray:
    """Stable uint64 hash of an array-like of strings (fnv1a, vectorized enough).

    Used for hash-bucket partitioning of string entity keys; must be
    identical across processes (unlike Python's salted ``hash``).
    """
    out = np.empty(len(values), dtype=_U64)
    s = _U64(seed)
    for i, v in enumerate(values):
        h = _U64(0xCBF29CE484222325) ^ s
        with np.errstate(over="ignore"):
            for b in v.encode("utf-8"):
                h = ((h ^ _U64(b)) * _U64(0x100000001B3)) & _MASK
        out[i] = h
    return splitmix64(out)
