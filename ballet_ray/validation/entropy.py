"""Entropy / mutual-information / conditional-MI estimation, numpy-only.

Reimplements the estimator semantics of the reference's validation kernel
(ballet/validation/entropy.py) without scipy/sklearn (absent here):

- mixed discrete/continuous datasets: per-column discreteness heuristics
  (integral dtype; near-integer floats; max repeat count > 20; unique
  fraction < 0.05 — ballet/validation/entropy.py:65-99);
- discrete part: Shannon entropy of the empirical joint pmf (:199-225);
- continuous part: the Kraskov–Stögbauer–Grassberger (KSG) k-NN estimator,
  k=3, Chebyshev metric (:228-270; Kraskov et al., Phys. Rev. E 69, 2004):
      H(c) = ψ(n) − mean_i ψ(n_i + 1) + log c_d + d · mean_i log ε_i
  with ε_i twice the distance to the k-th neighbor and n_i the number of
  points strictly within ε_i/2 (self included);
- mixture: H(x) = H(d) + Σ_v p(v)·H(c | d=v) (:273-322);
- results clamped non-negative (ballet/util/__init__.py:150-165).

k-NN search is a chunked numpy brute force — the estimator is only ever run
on driver-side samples of ≤ ~10⁴ rows (the reference notes "this will be
slow" for the same reason, ballet/validation/entropy.py:189).

digamma is a 6-term asymptotic series with upward recurrence (no scipy).
"""

from __future__ import annotations

import numpy as np

N_NEIGHBORS = 3
DISC_COL_UNIQUE_COUNT_THRESH = 20
DISC_COL_UNIQUE_FRACTION_THRESH = 0.05
_CHUNK = 512


def digamma(x):
    """Vectorized digamma via recurrence + asymptotic expansion."""
    x = np.asarray(x, dtype=np.float64).copy()
    out = np.zeros_like(x)
    # recurrence psi(x) = psi(x+1) - 1/x until x >= 6
    for _ in range(8):
        small = x < 6
        if not small.any():
            break
        out[small] -= 1.0 / x[small]
        x[small] += 1.0
    inv = 1.0 / x
    inv2 = inv * inv
    out += (
        np.log(x)
        - 0.5 * inv
        - inv2 * (1.0 / 12 - inv2 * (1.0 / 120 - inv2 * (1.0 / 252 - inv2 / 240)))
    )
    return out


def asarray2d(a) -> np.ndarray:
    a = np.asarray(a)
    if a.ndim == 1:
        a = a[:, None]
    return a


def _nonneg(v: float) -> float:
    return float(v) if v > 0 else 0.0


def _is_column_disc(col: np.ndarray) -> bool:
    if issubclass(col.dtype.type, np.integer):
        return True
    if np.allclose(col - col.astype(np.int64), 0):
        return True
    uniq, counts = np.unique(col, return_counts=True)
    if counts.max() > DISC_COL_UNIQUE_COUNT_THRESH:
        return True
    if uniq.size / col.size < DISC_COL_UNIQUE_FRACTION_THRESH:
        return True
    return False


def _disc_mask(x: np.ndarray) -> np.ndarray:
    return np.array([_is_column_disc(x[:, j]) for j in range(x.shape[1])])


def _cheb_kth_and_counts(c: np.ndarray, k: int):
    """Chebyshev distance of each row to its k-th nearest neighbor
    (excluding self), chunked brute force. Returns the full sorted-distance
    machinery lazily: a function giving k-th distances and a counter of
    points strictly within per-row radii."""
    n = len(c)

    def kth_distance(kk: int) -> np.ndarray:
        d = np.empty(n)
        for lo in range(0, n, _CHUNK):
            hi = min(lo + _CHUNK, n)
            block = np.max(
                np.abs(c[lo:hi, None, :] - c[None, :, :]), axis=2
            )  # (chunk, n)
            # exclude self by inflating the diagonal
            for i in range(lo, hi):
                block[i - lo, i] = np.inf
            d[lo:hi] = np.partition(block, kk - 1, axis=1)[:, kk - 1]
        return d

    return kth_distance


def _count_strictly_within(x: np.ndarray, radius: np.ndarray) -> np.ndarray:
    """# points of x strictly within radius_i of row i (self included)."""
    n = len(x)
    out = np.empty(n, dtype=np.int64)
    for lo in range(0, n, _CHUNK):
        hi = min(lo + _CHUNK, n)
        block = np.max(np.abs(x[lo:hi, None, :] - x[None, :, :]), axis=2)
        out[lo:hi] = (block < radius[lo:hi, None]).sum(axis=1)
    return out


def _compute_epsilon(x: np.ndarray) -> np.ndarray:
    """Twice the Chebyshev distance to the k-th neighbor over the continuous
    columns; -inf when every column is discrete. Bumps k while any distance
    is zero (mirrors the reference's duplicate-row guard)."""
    x = asarray2d(x)
    n = x.shape[0]
    mask = _disc_mask(x)
    if mask.all():
        return np.full(n, -np.inf)
    c = x[:, ~mask].astype(np.float64)
    kth = _cheb_kth_and_counts(c, N_NEIGHBORS)
    k = N_NEIGHBORS
    d = np.zeros(n)
    while not np.all(d) and k < n:
        d = kth(k)
        k += 1
    return 2.0 * d


def _disc_entropy(x: np.ndarray) -> float:
    x = asarray2d(x)
    _, counts = np.unique(x, axis=0, return_counts=True)
    p = counts / counts.sum()
    return float(-(p * np.log(p)).sum())


def _cont_entropy(x: np.ndarray, epsilon: np.ndarray) -> float:
    x = asarray2d(x).astype(np.float64)
    n, d = x.shape
    if n <= 1:
        return 0.0
    nx = _count_strictly_within(x, epsilon / 2.0)
    # chebyshev unit-ball volume = 1 → log c_d = 0
    return float(
        -np.mean(digamma(nx + 1)) + digamma(np.array([n]))[0] + d * np.mean(np.log(epsilon))
    )


def _entropy(x: np.ndarray, epsilon: np.ndarray) -> float:
    x = asarray2d(x)
    n, d = x.shape
    if n <= 1 or d == 0:
        return 0.0
    mask = _disc_mask(x)
    if mask.all():
        return _disc_entropy(x)
    if not mask.any():
        return _cont_entropy(x, epsilon)
    disc = asarray2d(x[:, mask])
    cont = asarray2d(x[:, ~mask])
    events, counts = np.unique(disc, axis=0, return_counts=True)
    p = counts / counts.sum()
    h_c_d = 0.0
    for pv, ev in zip(p, events):
        sel = np.all(disc == ev, axis=1)
        h_c_d += pv * _cont_entropy(cont[sel], epsilon[sel])
    return _disc_entropy(disc) + h_c_d


def estimate_entropy(x) -> float:
    x = asarray2d(x)
    return _nonneg(_entropy(x, _compute_epsilon(x)))


def estimate_mutual_information(x, y) -> float:
    """I(x;y) = H(x) + H(y) − H(x,y), shared epsilon from the joint."""
    x, y = asarray2d(x), asarray2d(y)
    xy = np.concatenate([x, y], axis=1)
    eps = _compute_epsilon(xy)
    return _nonneg(_entropy(x, eps) + _entropy(y, eps) - _entropy(xy, eps))


def estimate_conditional_information(x, y, z) -> float:
    """I(x;y|z) = H(x,z) + H(y,z) − H(x,y,z) − H(z), shared epsilon."""
    x, y, z = asarray2d(x), asarray2d(y), asarray2d(z)
    xz = np.concatenate([x, z], axis=1)
    yz = np.concatenate([y, z], axis=1)
    xyz = np.concatenate([x, y, z], axis=1)
    eps = _compute_epsilon(xyz)
    return _nonneg(
        _entropy(xz, eps) + _entropy(yz, eps) - _entropy(xyz, eps) - _entropy(z, eps)
    )
