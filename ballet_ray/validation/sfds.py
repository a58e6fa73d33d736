"""Readable SFDS oracle — a short, unoptimized implementation of the
streaming-feature-selection loop (Li, Wu, Li & Ding, "Group Feature
Selection with Streaming Features", ICDM 2013), kept as a human-checkable
cross-reference for the production ``GFSSFAccepter``/``GFSSFPruner``
(reference keeps the same oracle for the same purpose,
ballet/validation/sfds.py:46-90).

The loop: for each arriving feature f, accept if its (conditional)
information gain clears the λ threshold either against all selected
features or in exchange against one of them; after accepting, prune any
selected feature made redundant by f.
"""

from __future__ import annotations

import numpy as np

from ballet_ray.validation.entropy import (
    asarray2d,
    estimate_conditional_information,
    estimate_entropy,
    estimate_mutual_information,
)


def _concat(F: list[np.ndarray]):
    return np.concatenate(F, axis=1) if F else None


def _info(a, b, c=None) -> float:
    if c is None:
        return estimate_mutual_information(a, b)
    return estimate_conditional_information(a, b, c)


def _adjust(l1: float, l2: float, F: list[np.ndarray]) -> tuple[float, float]:
    if not F:
        return l1, l2
    return l1 / len(F), l2 / sum(f.shape[1] for f in F)


def sfds_accept(F: list[np.ndarray], f: np.ndarray, y: np.ndarray, l1: float, l2: float) -> bool:
    qf = f.shape[1]
    l1, l2 = _adjust(l1, l2, F)
    if _info(f, y, _concat(F)) > l1 + l2 * qf:
        return True
    for i, g in enumerate(F):
        z = _concat(F[:i] + F[i + 1 :])
        if _info(f, y, z) - _info(g, y, z) > l1 + l2 * (qf - g.shape[1]):
            return True
    return False


def sfds_prune(F: list[np.ndarray], f: np.ndarray, y: np.ndarray, l1: float, l2: float) -> list[np.ndarray]:
    kept = []
    for i, g in enumerate(F):
        z = _concat(F[:i] + F[i + 1 :] + [f])
        if _info(g, y, z) >= l1 + l2 * g.shape[1]:
            kept.append(g)
    return kept


def sfds(stream, y, l1: float = 0.0, l2: float = 0.0, l_adj: float = 64.0) -> list[int]:
    """Run the streaming loop over ``stream`` (iterable of matrices);
    returns the INDICES of the selected features (order of survival)."""
    y = asarray2d(y)
    if l1 <= 0 or l2 <= 0:
        hy = estimate_entropy(y)
        l1 = l1 if l1 > 0 else hy / l_adj
        l2 = l2 if l2 > 0 else hy / l_adj
    F: list[np.ndarray] = []
    idx: list[int] = []
    for i, f in enumerate(stream):
        f = asarray2d(f)
        if sfds_accept(F, f, y, l1, l2):
            kept = sfds_prune(F, f, y, l1, l2)
            idx = [idx[j] for j, g in enumerate(F) if any(g is k for k in kept)]
            F = kept
            F.append(f)
            idx.append(i)
    return idx
