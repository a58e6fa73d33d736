"""Vectorized numpy window kernels over (key, order)-sorted arrays.

These power the engine's keyed/windowed operators (lag, lead, rolling,
ffill, sessionize — SURVEY.md §2.2 SingleLagger/LagImputer and §2.8).
All kernels assume the input arrays are already sorted by
``(entity_key, order_key)``; group boundaries are derived from integer key
codes. Everything is O(n) numpy — no per-row Python, no per-group pandas
objects — so a hash-bucket partition containing millions of small groups
is processed in a handful of array ops.
"""

from __future__ import annotations

import numpy as np


def group_codes(keys: np.ndarray) -> np.ndarray:
    """Integer code per row, equal within a contiguous group (sorted input)."""
    if len(keys) == 0:
        return np.empty(0, dtype=np.int64)
    change = np.empty(len(keys), dtype=bool)
    change[0] = True
    change[1:] = keys[1:] != keys[:-1]
    return np.cumsum(change) - 1


def group_starts(codes: np.ndarray) -> np.ndarray:
    """For each row, the index of the first row of its group."""
    if len(codes) == 0:
        return np.empty(0, dtype=np.int64)
    idx = np.arange(len(codes), dtype=np.int64)
    is_start = np.empty(len(codes), dtype=bool)
    is_start[0] = True
    is_start[1:] = codes[1:] != codes[:-1]
    start_idx = np.where(is_start, idx, 0)
    return np.maximum.accumulate(start_idx)


def lag(values: np.ndarray, codes: np.ndarray, k: int = 1) -> np.ndarray:
    """shift(k) within groups. k>0 looks back (leading NaNs per group,
    matching reference SingleLagger golden output, tests/eng/test_ts.py:29-37);
    k<0 is lead."""
    n = len(values)
    out = np.full(n, np.nan, dtype=np.float64)
    a = np.asarray(values, dtype=np.float64)
    if k == 0 or n == 0:
        return a.copy() if k == 0 else out
    if k > 0:
        out[k:] = a[:-k]
        bad = codes[k:] != codes[:-k]
        out[k:][bad] = np.nan
    else:
        m = -k
        out[:-m] = a[m:]
        bad = codes[m:] != codes[:-m]
        out[:-m][bad] = np.nan
    return out


def rolling_mean(values: np.ndarray, starts: np.ndarray, window: int) -> np.ndarray:
    """Trailing window mean (current row + window-1 preceding, min_periods=1),
    clipped at the group start — matches SQL
    ``AVG(x) OVER (PARTITION BY k ORDER BY ts ROWS BETWEEN w-1 PRECEDING AND CURRENT ROW)``."""
    n = len(values)
    if n == 0:
        return np.empty(0, dtype=np.float64)
    a = np.asarray(values, dtype=np.float64)
    nanmask = np.isnan(a)
    a0 = np.where(nanmask, 0.0, a)
    cs = np.concatenate([[0.0], np.cumsum(a0)])
    cn = np.concatenate([[0], np.cumsum(~nanmask)])
    idx = np.arange(n, dtype=np.int64)
    w0 = np.maximum(starts, idx - window + 1)
    s = cs[idx + 1] - cs[w0]
    c = cn[idx + 1] - cn[w0]
    with np.errstate(invalid="ignore", divide="ignore"):
        out = s / c
    out[c == 0] = np.nan
    return out


def rolling_sum(values: np.ndarray, starts: np.ndarray, window: int) -> np.ndarray:
    """Trailing window sum with the same framing as :func:`rolling_mean`."""
    n = len(values)
    if n == 0:
        return np.empty(0, dtype=np.float64)
    a = np.where(np.isnan(np.asarray(values, dtype=np.float64)), 0.0, values).astype(np.float64)
    cs = np.concatenate([[0.0], np.cumsum(a)])
    idx = np.arange(n, dtype=np.int64)
    w0 = np.maximum(starts, idx - window + 1)
    return cs[idx + 1] - cs[w0]


def ffill(values: np.ndarray, starts: np.ndarray) -> np.ndarray:
    """Per-group forward fill (reference LagImputer, ballet/eng/missing.py:12-17)."""
    n = len(values)
    a = np.asarray(values, dtype=np.float64)
    if n == 0:
        return a
    idx = np.arange(n, dtype=np.int64)
    valid = ~np.isnan(a)
    last_valid = np.maximum.accumulate(np.where(valid, idx, -1))
    out = np.full(n, np.nan)
    ok = last_valid >= starts
    out[ok] = a[last_valid[ok]]
    return out


def sessionize(ts_us: np.ndarray, codes: np.ndarray, gap_us: int) -> np.ndarray:
    """Session index per row within its group: a new session starts at the
    group's first row and whenever ts - previous ts > gap."""
    n = len(ts_us)
    if n == 0:
        return np.empty(0, dtype=np.int64)
    t = np.asarray(ts_us, dtype=np.int64)
    boundary = np.empty(n, dtype=bool)
    boundary[0] = True
    boundary[1:] = (codes[1:] != codes[:-1]) | ((t[1:] - t[:-1]) > gap_us)
    sid = np.cumsum(boundary)
    starts = group_starts(codes)
    return sid - sid[starts]


def cum_count(codes: np.ndarray) -> np.ndarray:
    """0-based occurrence index of each row within its group (sorted input)."""
    n = len(codes)
    if n == 0:
        return np.empty(0, dtype=np.int64)
    idx = np.arange(n, dtype=np.int64)
    return idx - group_starts(codes)


def ewm_mean(values: np.ndarray, codes: np.ndarray, alpha: float, carry_in: float | None = None) -> np.ndarray:
    """Per-group exponentially weighted mean, pandas ``ewm(alpha=a,
    adjust=False).mean()`` semantics: y_0 = x_0, y_i = (1-a)·y_{i-1} + a·x_i.

    The recursion is evaluated in closed form over renormalization blocks:
    within a block, y_i = r^{d_i+1}·carry + (segment cumsum of x_j·r^{-j})
    · a·r^{i}, where segments reset at group starts. Block length is
    capped so r^{-B} stays far from float64 overflow, making the whole
    scan O(n) vectorized with ceil(n/B) python iterations. Input is
    assumed null-free (mask or ffill upstream).

    ``carry_in``: the entity's EWM value just before row 0 — row 0 is then
    treated as a continuation (y_0 = r·carry_in + a·x_0), which is how the
    hot-slice path stitches a time-sliced entity back together exactly.
    """
    n = len(values)
    out = np.empty(n, np.float64)
    if n == 0:
        return out
    r = 1.0 - alpha
    if r <= 0.0:  # alpha == 1 -> y = x
        return values.astype(np.float64)
    B = max(8, min(512, int(600.0 / max(1e-12, -np.log(r)))))
    x = values.astype(np.float64)
    new_grp = np.empty(n, bool)
    new_grp[0] = True
    new_grp[1:] = codes[1:] != codes[:-1]
    carry = 0.0
    carry_valid = False
    if carry_in is not None:
        new_grp[0] = False
        carry = float(carry_in)
        carry_valid = True
    for lo in range(0, n, B):
        hi = min(n, lo + B)
        xs = x[lo:hi]
        ng = new_grp[lo:hi].copy()
        m = hi - lo
        j = np.arange(m, dtype=np.float64)
        rj = r**j          # r^{j}
        rij = r ** (-j)    # r^{-j}
        t = xs * rij
        cs = np.cumsum(t)
        # segment base: cumsum just before the segment start
        seg_start = np.maximum.accumulate(np.where(ng, np.arange(m), 0))
        base = np.where(seg_start > 0, cs[np.maximum(seg_start - 1, 0)], 0.0)
        seg_sum = (cs - base) * rj  # Σ x_j r^{i-j} over the segment
        d = np.arange(m) - seg_start                      # offset within segment
        y = alpha * seg_sum
        # pandas adjust=False: the FIRST element of each group is x itself
        # (weight 1, not alpha); fold that in by correcting segments that
        # START a group: replace the alpha-weighted first term with full x
        first_idx = seg_start
        first_is_group_head = ng[first_idx]
        head_x = xs[first_idx]
        corr = np.where(first_is_group_head, (1.0 - alpha) * head_x * (r**d), 0.0)
        y = y + corr
        # carry-in for the one segment continuing from the previous block
        if carry_valid and not ng[0]:
            cont = seg_start == 0
            y = np.where(cont, y + carry * (r ** (d + 1)), y)
        out[lo:hi] = y
        carry = out[hi - 1]
        carry_valid = True  # y is always defined at hi-1
    return out
