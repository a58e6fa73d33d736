"""Keyed / windowed transforms: lag, lead, rolling, ffill, sessionize.

Reference semantics: SingleLagger = per-group shift(k) with leading NaNs
(ballet/eng/ts.py:13-22, golden tests/eng/test_ts.py:19-37); multi-lag =
horizontal union of laggers (ballet/eng/ts.py:25-41); LagImputer = per-group
ffill (ballet/eng/missing.py:12-17); rolling/sessionize per SURVEY.md §2.8.

Execution model (NOT the reference's groupby.apply): ALL keyed transforms of
a pipeline sharing the same (entity key, order key) run in ONE co-partition
pass — hash-bucket the entities into B buckets (functions/partition.py),
``groupby(bucket).map_groups`` with batch_format="pyarrow", sort each bucket
once by (key, order), compute every window column with O(n) vectorized numpy
kernels (functions/windows_np.py), and append the columns to the Arrow
table. One shuffle, no per-entity Python, no pandas.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ballet_ray.functions import windows_np as wnp
from ballet_ray.functions.partition import BUCKET_COL, bucketize, sort_table
from ballet_ray.transformer import Transform


class KeyedTransform(Transform):
    """Base for transforms needing (entity_key, order_by) co-partitioning.

    ``transform_sorted(values_table, codes, starts, cols)`` receives the
    bucket table already sorted by (key, order) plus precomputed group codes
    and group-start indices; returns {output_name: np.ndarray}.

    ``lookback`` / ``lookahead``: how many preceding / following rows of the
    same entity the transform needs for exact results — used by the skew
    path to carry boundary rows across time-sliced sub-partitions of hot
    entities.
    """

    lookback: int = 0
    lookahead: int = 0

    def __init__(self, key: str, order_by=None):
        self.key = key
        if order_by is None:
            self.order_by: tuple[str, ...] = ()
        elif isinstance(order_by, str):
            self.order_by = (order_by,)
        else:
            self.order_by = tuple(order_by)

    def partition_spec(self) -> tuple[str, tuple[str, ...]]:
        return (self.key, self.order_by)

    def transform_sorted(
        self, table: pa.Table, codes: np.ndarray, starts: np.ndarray, cols: list[str]
    ) -> dict[str, np.ndarray]:
        raise NotImplementedError

    # KeyedTransforms are executed by the pipeline's keyed pass; direct
    # transform_table would lose cross-batch group boundaries.
    def transform_table(self, table: pa.Table, cols: list[str]) -> pa.Table:
        tbl = sort_table(table, [self.key, *self.order_by])
        codes = wnp.group_codes(tbl.column(self.key).to_numpy(zero_copy_only=False))
        starts = wnp.group_starts(codes)
        out = self.transform_sorted(tbl, codes, starts, cols)
        return pa.table({k: pa.array(v) for k, v in out.items()})


def _vals(table: pa.Table, c: str) -> np.ndarray:
    return table.column(c).to_numpy(zero_copy_only=False).astype(np.float64)


def _ts_us_col(col) -> np.ndarray:
    """Timestamp/numeric column → int64 MICROSECONDS (a raw int64 cast of
    timestamp[ns] would silently be nanoseconds)."""
    if pa.types.is_timestamp(col.type):
        col = col.cast(pa.timestamp("us"))
    return col.cast(pa.int64()).to_numpy(zero_copy_only=False)


class Lag(KeyedTransform):
    """shift(k) within each entity ordered by ``order_by`` (k<0 = lead)."""

    def __init__(self, k: int, key: str, order_by=None):
        super().__init__(key, order_by)
        self.k = k
        self.lookback = max(k, 0)
        self.lookahead = max(-k, 0)

    def transform_sorted(self, table, codes, starts, cols):
        return {
            f"{c}_lag{self.k}" if self.k >= 0 else f"{c}_lead{-self.k}": wnp.lag(
                _vals(table, c), codes, self.k
            )
            for c in cols
        }

    def output_names(self, cols):
        suf = f"_lag{self.k}" if self.k >= 0 else f"_lead{-self.k}"
        return [f"{c}{suf}" for c in cols]


class MultiLag(KeyedTransform):
    """Several lags in one pass (reference make_multi_lagger, ballet/eng/ts.py:25-41)."""

    def __init__(self, lags: list[int], key: str, order_by=None):
        super().__init__(key, order_by)
        self.lags = list(lags)
        self.lookback = max([k for k in lags if k > 0], default=0)
        self.lookahead = max([-k for k in lags if k < 0], default=0)

    def transform_sorted(self, table, codes, starts, cols):
        out = {}
        for c in cols:
            v = _vals(table, c)
            for k in self.lags:
                name = f"{c}_lag{k}" if k >= 0 else f"{c}_lead{-k}"
                out[name] = wnp.lag(v, codes, k)
        return out

    def output_names(self, cols):
        return [
            f"{c}_lag{k}" if k >= 0 else f"{c}_lead{-k}" for c in cols for k in self.lags
        ]


class Difference(KeyedTransform):
    """x − lag_k(x) within each entity (skits DifferenceTransformer parity,
    reference re-export ballet/eng/external/skits.py; period-k differencing
    for seasonal series). First k rows of each entity → NaN."""

    def __init__(self, k: int, key: str, order_by=None):
        super().__init__(key, order_by)
        if k < 1:
            raise ValueError("difference period must be >= 1")
        self.k = k
        self.lookback = k

    def transform_sorted(self, table, codes, starts, cols):
        out = {}
        for c in cols:
            v = _vals(table, c)
            out[f"{c}_diff{self.k}"] = v - wnp.lag(v, codes, self.k)
        return out

    def output_names(self, cols):
        return [f"{c}_diff{self.k}" for c in cols]


class RollingMean(KeyedTransform):
    def __init__(self, window: int, key: str, order_by=None):
        super().__init__(key, order_by)
        self.window = window
        self.lookback = window - 1

    def transform_sorted(self, table, codes, starts, cols):
        return {
            f"{c}_rmean{self.window}": wnp.rolling_mean(_vals(table, c), starts, self.window)
            for c in cols
        }

    def output_names(self, cols):
        return [f"{c}_rmean{self.window}" for c in cols]


class RollingSum(KeyedTransform):
    def __init__(self, window: int, key: str, order_by=None):
        super().__init__(key, order_by)
        self.window = window
        self.lookback = window - 1

    def transform_sorted(self, table, codes, starts, cols):
        return {
            f"{c}_rsum{self.window}": wnp.rolling_sum(_vals(table, c), starts, self.window)
            for c in cols
        }

    def output_names(self, cols):
        return [f"{c}_rsum{self.window}" for c in cols]


class FFill(KeyedTransform):
    """Per-entity forward fill (reference LagImputer, ballet/eng/missing.py:12-17)."""

    def transform_sorted(self, table, codes, starts, cols):
        return {f"{c}_ffill": wnp.ffill(_vals(table, c), starts) for c in cols}

    def output_names(self, cols):
        return [f"{c}_ffill" for c in cols]


class Sessionize(KeyedTransform):
    """Gap-based session index per entity; cols = [timestamp col].

    session increments when ts - previous ts > gap (first row of an entity
    is session 0) — SURVEY.md §2.8."""

    def __init__(self, gap_seconds: float, key: str, order_by=None):
        super().__init__(key, order_by)
        self.gap_us = int(gap_seconds * 1_000_000)
        self.lookback = 1

    def transform_sorted(self, table, codes, starts, cols):
        ts = _ts_us_col(table.column(cols[0]))
        return {"session_id": wnp.sessionize(ts, codes, self.gap_us)}

    def output_names(self, cols):
        return ["session_id"]


class CumCount(KeyedTransform):
    """0-based occurrence index of the row within its entity."""

    def transform_sorted(self, table, codes, starts, cols):
        return {"cum_count": wnp.cum_count(codes)}

    def output_names(self, cols):
        return ["cum_count"]


class EwmMean(KeyedTransform):
    """Per-entity exponentially weighted mean (pandas ``ewm(alpha,
    adjust=False).mean()`` — the classic decayed-memory ts feature the
    skits family lacks). Evaluated by a renormalized closed-form scan
    (``wnp.ewm_mean``): O(n) vectorized, no per-group Python. Input is
    assumed null-free (mask/ffill upstream).

    Hot-entity time slices are exact: the recursion's slice carry is an
    affine map (y_out = r^n·y_in + local partial), so the slice summary
    pre-pass composes per-slice (n, partial, head_ewm) prefixes and the
    sliced kernel runs ``wnp.ewm_mean(..., carry_in=prior_ewm)``."""

    def __init__(self, alpha: float, key: str, order_by=None):
        super().__init__(key, order_by)
        self.alpha = float(alpha)

    def transform_sorted(self, table, codes, starts, cols):
        return {
            f"{c}_ewm": wnp.ewm_mean(_vals(table, c), codes, self.alpha) for c in cols
        }

    def output_names(self, cols):
        return [f"{c}_ewm" for c in cols]


class CumSum(KeyedTransform):
    """Per-entity running sum (skits IntegratedTransformer parity —
    reference re-export ballet/eng/external/skits.py). NaN contributes 0.

    Hot-entity time slices are exact: the carry summary accumulates each
    prior slice's column sums (``prior_sums``), and the sliced kernel
    (``transform_sorted_carried``) offsets its local cumsum by them."""

    carry_prefix = True

    def transform_sorted_carried(self, table, cols, prior_rows, prior_sums):
        out = {}
        for c in cols:
            v = _vals(table, c)
            cs = np.cumsum(np.where(np.isnan(v), 0.0, v))
            out[f"{c}_cumsum"] = cs + prior_sums.get(c, 0.0)
        return out

    def transform_sorted(self, table, codes, starts, cols):
        n = len(codes)
        counts = np.diff(np.append(starts, n))
        out = {}
        for c in cols:
            v = _vals(table, c)
            cs = np.cumsum(np.where(np.isnan(v), 0.0, v))
            prev = np.concatenate([[0.0], cs[:-1]])
            base = np.repeat(prev[starts], counts)
            out[f"{c}_cumsum"] = cs - base
        return out

    def output_names(self, cols):
        return [f"{c}_cumsum" for c in cols]


def make_seasonal_lagger(period: int, key: str, order_by=None) -> "Lag":
    """skits SeasonalTransformer: the value one season (period rows) back."""
    return Lag(period, key, order_by)


def make_autoregressive(num_lags: int, key: str, order_by=None) -> "MultiLag":
    """skits AutoregressiveTransformer: lags 1..num_lags in one pass."""
    return MultiLag(list(range(1, num_lags + 1)), key, order_by)


def make_horizon(horizon: int, key: str, order_by=None) -> "MultiLag":
    """skits HorizonTransformer: the NEXT ``horizon`` values as columns
    (leads 1..horizon) — the supervised-target construction."""
    return MultiLag([-h for h in range(1, horizon + 1)], key, order_by)


def make_trend(key: str, order_by=None) -> "CumCount":
    """skits TrendTransformer: 0-based time index within the entity."""
    return CumCount(key, order_by)


class RollingMeanTime(KeyedTransform):
    """Time-range trailing mean: rows within [ts - range, ts] of the current
    row's timestamp (SQL RANGE BETWEEN ... PRECEDING AND CURRENT ROW).
    cols = [value col]; constructor takes the ts column."""

    def __init__(self, range_seconds: float, ts_col: str, key: str):
        super().__init__(key, ts_col)
        self.range_us = int(range_seconds * 1_000_000)
        self.ts_col = ts_col

    def transform_sorted(self, table, codes, starts, cols):
        ts = _ts_us_col(table.column(self.ts_col))
        out = {}
        n = len(ts)
        if n == 0:
            return {f"{c}_rtmean": np.empty(0) for c in cols}
        # ts is sorted only WITHIN groups — offset each group by a gap wider
        # than any window so a single global searchsorted stays in-group
        span = int(ts.max() - ts.min()) + self.range_us + 1
        ts_adj = ts + codes * span
        lo = np.searchsorted(ts_adj, ts_adj - self.range_us, side="left")
        lo = np.maximum(lo, starts)
        # SQL RANGE frames include PEERS of the current row (same ts)
        hi = np.searchsorted(ts_adj, ts_adj, side="right")
        for c in cols:
            v = _vals(table, c)
            cs = np.concatenate([[0.0], np.cumsum(np.where(np.isnan(v), 0.0, v))])
            cn = np.concatenate([[0], np.cumsum(~np.isnan(v))])
            s = cs[hi] - cs[lo]
            cnt = cn[hi] - cn[lo]
            with np.errstate(invalid="ignore", divide="ignore"):
                m = s / cnt
            m[cnt == 0] = np.nan
            out[f"{c}_rtmean"] = m
        return out

    def output_names(self, cols):
        return [f"{c}_rtmean" for c in cols]


def compute_carry_extended(
    narrow_sorted: pa.Table,
    t: KeyedTransform,
    cols: list[str],
    key: str,
    order_col: str,
    carry: dict | None,
) -> dict[str, np.ndarray]:
    """Compute one keyed transform over a single-entity time slice, with the
    slice's carry state (previous tail rows, following head rows, last-valid
    values, prior session/row counts) restoring exact cross-slice window
    semantics. ``narrow_sorted`` holds only the needed columns, sorted by
    the order key. Returns outputs aligned to the sorted order.

    Shared by the streaming keyed pass (apply_keyed) and the checkpointed
    backfill's per-partition path.
    """
    if getattr(t, "carry_prefix", False):
        # whole-prefix transforms (CumSum, ordered CatBoost): computed
        # directly on the slice with the carried prior row count / column
        # sums — no tail/head row extension needed
        prior_rows = carry["prior_rows"] if carry else 0
        prior_sums = carry.get("prior_sums", {}) if carry else {}
        outs = t.transform_sorted_carried(narrow_sorted, cols, prior_rows, prior_sums)
        return {k: np.asarray(v) for k, v in outs.items()}
    if isinstance(t, EwmMean):
        # affine slice carry: y continues from the entity's EWM value at
        # the slice boundary (prefix-composed in _summarize_hot_slices)
        outs = {}
        zeros = np.zeros(narrow_sorted.num_rows, dtype=np.int64)
        for c in cols:
            prior = (carry or {}).get("prior_ewm", {}).get((c, t.alpha))
            outs[f"{c}_ewm"] = wnp.ewm_mean(_vals(narrow_sorted, c), zeros, t.alpha, carry_in=prior)
        return outs
    if isinstance(t, RollingMeanTime):
        # time-range windows: extend with the previous ADJACENT slice's
        # rows inside the window range (``ttail``); slice_us >= range_us is
        # enforced by the hot plan so the window never reaches further back
        tt_ts = (carry or {}).get("ttail_ts", np.empty(0, dtype=np.int64))
        ttn = len(tt_ts)
        real_ts = _ts_us_col(narrow_sorted.column(order_col))
        ext_cols: dict = {}
        ts_all = np.concatenate([tt_ts, real_ts])
        if pa.types.is_timestamp(narrow_sorted.column(order_col).type):
            ext_cols[order_col] = pa.array(ts_all.astype("datetime64[us]"))
        else:
            ext_cols[order_col] = pa.array(ts_all)
        for c in dict.fromkeys(cols):
            if c == order_col:
                continue
            tt_v = (carry or {}).get("ttail", {}).get(c, np.full(ttn, np.nan))
            ext_cols[c] = pa.array(np.concatenate([tt_v, _vals(narrow_sorted, c)]))
        ext_tbl = pa.table(ext_cols)
        zeros = np.zeros(len(ts_all), dtype=np.int64)
        outs = t.transform_sorted(ext_tbl, zeros, zeros, cols)
        return {k: np.asarray(v)[ttn:] for k, v in outs.items()}
    n = narrow_sorted.num_rows
    tail_n = len(carry["tail_ts"]) if carry else 0
    head_n = len(carry.get("head_ts", ())) if carry else 0
    value_cols = list(dict.fromkeys(cols))
    ext_n = tail_n + n + head_n
    ext_cols: dict[str, pa.Array] = {}
    k_val = narrow_sorted.column(key)[0].as_py() if n else ""
    ext_cols[key] = pa.array(np.repeat(np.array([k_val], dtype=object), ext_n))
    real_ts = _ts_us_col(narrow_sorted.column(order_col))
    parts_ts = [real_ts]
    if carry:
        parts_ts = [carry["tail_ts"], real_ts, carry.get("head_ts", np.empty(0, dtype=np.int64))]
    ext_ts = np.concatenate(parts_ts)
    if pa.types.is_timestamp(narrow_sorted.column(order_col).type):
        ext_cols[order_col] = pa.array(ext_ts.astype("datetime64[us]"))
    else:
        ext_cols[order_col] = pa.array(ext_ts)
    for c in value_cols:
        if c == order_col:
            continue
        real = _vals(narrow_sorted, c)
        if carry:
            ext = np.concatenate(
                [
                    carry["tail"].get(c, np.full(tail_n, np.nan)),
                    real,
                    carry.get("head", {}).get(c, np.full(head_n, np.nan)),
                ]
            )
        else:
            ext = real
        ext_cols[c] = pa.array(ext)
    ext_tbl = pa.table(ext_cols)
    codes0 = np.zeros(ext_n, dtype=np.int64)
    starts0 = np.zeros(ext_n, dtype=np.int64)
    outs = t.transform_sorted(ext_tbl, codes0, starts0, cols)
    adjusted: dict[str, np.ndarray] = {}
    hi = tail_n + n
    for j, (name, arr) in enumerate(outs.items()):
        arr = np.asarray(arr)
        if isinstance(t, Sessionize):
            base = arr[tail_n - 1] if tail_n else 0
            prior = carry["prior_sessions"].get(t.gap_us, 0) if carry else 0
            adjusted[name] = (arr[tail_n:hi] - base + prior).astype(np.int64)
        elif isinstance(t, CumCount):
            prior = carry["prior_rows"] if carry else 0
            adjusted[name] = (arr[tail_n:hi] - tail_n + prior).astype(np.int64)
        elif isinstance(t, FFill):
            v = arr[tail_n:hi].astype(np.float64)
            if carry:
                lv = carry["last_valid"].get(cols[j % len(cols)])
                if lv is not None:
                    v = np.where(np.isnan(v), lv, v)
            adjusted[name] = v
        else:
            adjusted[name] = arr[tail_n:hi]
    return adjusted


def _append_outputs(tbl: pa.Table, names, outs: dict) -> pa.Table:
    for want, have in zip(names, list(outs)):
        arr = outs[have]
        tbl = tbl.append_column(
            want, arr if isinstance(arr, (pa.Array, pa.ChunkedArray)) else pa.array(arr)
        )
    return tbl


def _summarize_hot_slices(ds, transforms, key, order_by, hot_plan, hot_ids, w_max, gaps,
                          range_us: int = 0):
    """Narrow pre-pass over hot entities only: one summary row per
    (key, time-slice) with the tail rows, last non-null values, internal
    session-boundary counts, per-column sums (whole-prefix transforms),
    time-window tail rows (``range_us`` > 0, for RollingMeanTime) and row
    count — everything the main pass needs to make sliced windows exact
    across slice boundaries."""
    import pickle

    import pandas as pd

    value_cols = sorted({c for _, cols, _ in transforms for c in cols})
    ewm_specs = sorted({(c, t.alpha) for t, cols, _ in transforms if isinstance(t, EwmMean) for c in cols})
    order_col = order_by[0]
    narrow_cols = [key, *dict.fromkeys([*order_by, *value_cols])]

    hot_keys = np.array(list(hot_plan))

    def keep_hot_and_slice(t: pa.Table) -> pa.Table:
        keys = t.column(key).to_numpy(zero_copy_only=False)
        # hot sets are tiny; == comparisons beat np.isin on object/string
        # key arrays by a wide margin
        if len(hot_keys) <= 8:
            m = np.zeros(len(keys), dtype=bool)
            for hk in hot_keys:
                m |= keys == hk
        else:
            m = np.isin(keys, hot_keys)
        t = t.filter(pa.array(m))
        if t.num_rows == 0:
            return t.append_column("__slice_id", pa.array(np.empty(0, dtype=np.int64)))
        keys = t.column(key).to_numpy(zero_copy_only=False)
        ts = _ts_us_col(t.column(order_col))
        sid = np.zeros(len(keys), dtype=np.int64)
        for k, (t0, slice_us) in hot_plan.items():
            mk = keys == k
            if mk.any():
                sid[mk] = hot_ids[k] * 1_000_000 + np.maximum((ts[mk] - t0) // slice_us, 0)
        return t.append_column("__slice_id", pa.array(sid))

    narrow = ds.select_columns(narrow_cols).map_batches(keep_hot_and_slice, batch_format="pyarrow")

    def summarize(t: pa.Table) -> pa.Table:
        t = sort_table(t.drop_columns(["__slice_id"]) if False else t, [*order_by])
        k = t.column(key)[0].as_py()
        sid = int(t.column("__slice_id")[0].as_py())
        ts = _ts_us_col(t.column(order_col))
        n = t.num_rows
        tail_lo = max(0, n - w_max)
        summary = {
            "n": n,
            "first_ts": int(ts[0]),
            "last_ts": int(ts[-1]),
            "tail": {c: _vals(t, c)[tail_lo:] for c in value_cols},
            "tail_ts": ts[tail_lo:],
            "head": {c: _vals(t, c)[:w_max] for c in value_cols},
            "head_ts": ts[:w_max],
            "last_valid": {},
            "bounds": {},
        }
        for c in value_cols:
            v = _vals(t, c)
            ok = ~np.isnan(v)
            summary["last_valid"][c] = float(v[np.flatnonzero(ok)[-1]]) if ok.any() else None
            summary["col_sums"] = summary.get("col_sums", {})
            summary["col_sums"][c] = float(np.where(ok, v, 0.0).sum())
        for g in gaps:
            summary["bounds"][g] = int(((ts[1:] - ts[:-1]) > g).sum()) if n > 1 else 0
        if ewm_specs:
            summary["ewm"] = {}
            zeros = np.zeros(n, dtype=np.int64)
            for c, alpha in ewm_specs:
                v = _vals(t, c)
                y = wnp.ewm_mean(v, zeros, alpha)
                head_last = float(y[-1])
                r = 1.0 - alpha
                # pure-recursion partial (carry-in 0) = head-form last value
                # minus the extra (1-a)·r^{n-1}·x_0 the head weighting adds
                partial = head_last - (1.0 - alpha) * (r ** (n - 1)) * float(v[0])
                summary["ewm"][(c, alpha)] = (n, partial, head_last)
        if range_us:
            t0, slice_us = hot_plan[k]
            local = sid % 1_000_000
            nominal_end = t0 + (local + 1) * slice_us
            keep = ts >= nominal_end - range_us
            summary["ttail_ts"] = ts[keep]
            summary["ttail"] = {c: _vals(t, c)[keep] for c in value_cols}
        return pa.table({"key": [k], "slice_id": [sid], "blob": [pickle.dumps(summary)]})

    rows = narrow.groupby("__slice_id").map_groups(summarize, batch_format="pyarrow").to_pandas()

    carries: dict[int, dict] = {}
    rows["hot_idx"] = rows["slice_id"] // 1_000_000
    for _, grp in rows.groupby("hot_idx"):
        grp = grp.sort_values("slice_id")
        summaries = [(int(r["slice_id"]), pickle.loads(r["blob"])) for _, r in grp.iterrows()]
        # forward pass: lookback carries
        run_tail = {c: np.empty(0) for c in value_cols}
        run_tail_ts = np.empty(0, dtype=np.int64)
        run_last_valid = {c: None for c in value_cols}
        run_rows = 0
        run_sums = {c: 0.0 for c in value_cols}
        run_ewm: dict = {}
        run_sessions = {g: 0 for g in gaps}
        prev_last_ts = None
        prev_sid = None
        prev_ttail_ts = np.empty(0, dtype=np.int64)
        prev_ttail = {c: np.empty(0) for c in value_cols}
        for sid, s in summaries:
            carries[sid] = {
                "tail": {c: run_tail[c].copy() for c in value_cols},
                "tail_ts": run_tail_ts.copy(),
                "last_valid": dict(run_last_valid),
                "prior_rows": run_rows,
                "prior_sums": dict(run_sums),
                "prior_ewm": dict(run_ewm),
                "prior_sessions": dict(run_sessions),
            }
            for spec, (n_s, partial, head_last) in s.get("ewm", {}).items():
                prev = run_ewm.get(spec)
                alpha_s = spec[1]
                run_ewm[spec] = head_last if prev is None else ((1.0 - alpha_s) ** n_s) * prev + partial
            if range_us:
                # time-window tail: only the ADJACENT previous slice can
                # fall inside the window (slice_us >= range_us enforced)
                adjacent = prev_sid is not None and sid - prev_sid == 1
                carries[sid]["ttail_ts"] = prev_ttail_ts if adjacent else np.empty(0, dtype=np.int64)
                carries[sid]["ttail"] = (
                    prev_ttail if adjacent else {c: np.empty(0) for c in value_cols}
                )
                prev_ttail_ts = s["ttail_ts"]
                prev_ttail = s["ttail"]
            entry = {g: (1 if prev_last_ts is not None and (s["first_ts"] - prev_last_ts) > g else 0) for g in gaps}
            for g in gaps:
                run_sessions[g] += s["bounds"][g] + entry[g]
            run_rows += s["n"]
            for c in value_cols:
                run_sums[c] += s["col_sums"][c]
            prev_last_ts = s["last_ts"]
            prev_sid = sid
            for c in value_cols:
                v = s["tail"][c]
                run_tail[c] = np.concatenate([run_tail[c], v])[-w_max:] if w_max else np.empty(0)
                ok = ~np.isnan(v)
                if ok.any():
                    run_last_valid[c] = float(v[np.flatnonzero(ok)[-1]])
                elif s["last_valid"][c] is not None:
                    run_last_valid[c] = s["last_valid"][c]
            run_tail_ts = np.concatenate([run_tail_ts, s["tail_ts"]])[-w_max:] if w_max else run_tail_ts
        # backward pass: lookahead carries (head rows of following slices)
        run_head = {c: np.empty(0) for c in value_cols}
        run_head_ts = np.empty(0, dtype=np.int64)
        for sid, s in reversed(summaries):
            carries[sid]["head"] = {c: run_head[c].copy() for c in value_cols}
            carries[sid]["head_ts"] = run_head_ts.copy()
            if s["n"] >= w_max:
                run_head = {c: s["head"][c][:w_max] for c in value_cols}
                run_head_ts = s["head_ts"][:w_max]
            else:
                run_head = {
                    c: np.concatenate([s["head"][c], run_head[c]])[:w_max] for c in value_cols
                }
                run_head_ts = np.concatenate([s["head_ts"], run_head_ts])[:w_max]
    return carries


def apply_keyed(
    ds,
    transforms: list[tuple[KeyedTransform, list[str], list[str]]],
    key: str,
    order_by=None,
    *,
    num_buckets: int = 64,
    skew_threshold: int | None = None,
    slice_target: int = 250_000,
    hot_sample_frac: float = 1.0,
    stats_ds=None,
):
    """Run all keyed transforms sharing (key, order_by) in ONE main shuffle.

    transforms: list of (transform, input_cols, output_names). Returns the
    dataset with all output columns appended (original columns preserved).

    Skew: when ``skew_threshold`` is set, entities with more rows than the
    threshold (found by a keys-only count pre-pass) are time-sliced into
    sub-partitions of ~``slice_target`` rows. Window correctness across
    slice boundaries is preserved exactly: a narrow summary pre-pass plus a
    driver-side prefix combine produce, per (entity, slice), the previous
    ``max(lookback)`` rows, last non-null values, prior row count and prior
    session count; each hot slice is computed on a carry-extended array and
    trimmed/offset back. Transforms that need whole-entity context
    (GroupedFunctionTransform) disable slicing for safety.
    """
    if order_by is None:
        order_by = ()
    elif isinstance(order_by, str):
        order_by = (order_by,)
    sort_keys = [key, *order_by]

    sliceable = bool(order_by) and all(
        not type(t).__name__ == "GroupedFunctionTransform"
        and getattr(t, "sliceable", True)
        for t, _, _ in transforms
    )
    # time-range windows bound how finely a hot entity may be sliced: the
    # slice must span at least the window so only the adjacent previous
    # slice's rows (the carried ``ttail``) can fall inside it
    range_us = max(
        (t.range_us for t, _, _ in transforms if isinstance(t, RollingMeanTime)), default=0
    )
    hot_plan, hot_ids, carries = {}, {}, {}
    if skew_threshold is not None and sliceable:
        from ballet_ray.stages.asof import _hot_key_plan

        # pre-passes only touch (key, order, value) columns: a caller-provided
        # narrow dataset (e.g. a column-pruned parquet read) avoids decoding
        # the payload (token lists) in the serial pre-pass phases
        pre_ds = stats_ds if stats_ds is not None else ds
        hot_plan = _hot_key_plan(
            pre_ds, key, order_by[0], skew_threshold, slice_target, sample_frac=hot_sample_frac
        )
        if range_us:
            hot_plan = {
                k: (t0, max(slice_us, range_us)) for k, (t0, slice_us) in hot_plan.items()
            }
        hot_ids = {k: i for i, k in enumerate(hot_plan)}
        if hot_plan:
            w_max = max((t.lookback for t, _, _ in transforms), default=0)
            gaps = sorted({t.gap_us for t, _, _ in transforms if isinstance(t, Sessionize)})
            carries = _summarize_hot_slices(
                pre_ds, transforms, key, order_by, hot_plan, hot_ids, max(w_max, 1), gaps,
                range_us=range_us,
            )

    order_col = order_by[0] if order_by else None

    def add_bucket(t: pa.Table) -> pa.Table:
        from ballet_ray.functions.partition import stable_hash_array

        keys = t.column(key).to_numpy(zero_copy_only=False)
        b = (stable_hash_array(keys) % np.uint64(num_buckets)).astype(np.int64)
        if hot_plan:
            ts = _ts_us_col(t.column(order_col))
            for k, (t0, slice_us) in hot_plan.items():
                mk = keys == k
                if mk.any():
                    sl = np.maximum((ts[mk] - t0) // slice_us, 0)
                    b[mk] = num_buckets + hot_ids[k] * 1_000_000 + sl
        return t.append_column(BUCKET_COL, pa.array(b))

    needed_cols = sorted(
        {c for _, cols, _ in transforms for c in cols} | {key, *order_by}
    )

    def _narrow_sorted(table: pa.Table, order_np: np.ndarray) -> pa.Table:
        """Gather ONLY the columns the kernels read, in sorted order — the
        payload (token lists etc.) is never sorted or copied."""
        cols = {}
        for c in needed_cols:
            col = table.column(c)
            if pa.types.is_timestamp(col.type):
                cols[c] = pa.array(_ts_us_col(col)[order_np].astype("datetime64[us]"))
            else:
                cols[c] = pa.array(col.to_numpy(zero_copy_only=False)[order_np])
        return pa.table(cols)

    def per_bucket(table: pa.Table) -> pa.Table:
        bucket_id = int(table.column(BUCKET_COL)[0].as_py())
        table = table.drop_columns([BUCKET_COL]).combine_chunks()
        n = table.num_rows
        import pyarrow.compute as pc

        order = pc.sort_indices(
            table.select([k for k in [key, *order_by]]),
            sort_keys=[(k, "ascending") for k in [key, *order_by]],
        ).to_numpy(zero_copy_only=False)
        inv = np.empty(n, dtype=np.int64)
        inv[order] = np.arange(n)

        if bucket_id < num_buckets or not carries:
            narrow = _narrow_sorted(table, order)
            codes = wnp.group_codes(narrow.column(key).to_numpy(zero_copy_only=False))
            starts = wnp.group_starts(codes)
            for t, cols, names in transforms:
                outs = t.transform_sorted(narrow, codes, starts, cols)
                scattered = {nm: np.asarray(v)[inv] for nm, v in outs.items()}
                table = _append_outputs(table, names, scattered)
            return table

        # hot slice: single entity, carry-extended compute on narrow arrays
        carry = carries.get(bucket_id - num_buckets, None)
        narrow = _narrow_sorted(table, order)
        for t, cols, names in transforms:
            outs = compute_carry_extended(narrow, t, cols, key, order_col, carry)
            scattered = {nm: np.asarray(v)[inv] for nm, v in outs.items()}
            table = _append_outputs(table, names, scattered)
        return table

    b = ds.map_batches(add_bucket, batch_format="pyarrow")
    return b.groupby(BUCKET_COL).map_groups(per_bucket, batch_format="pyarrow")


def grouped_rank(ds, *, group_col: str, value_col: str, num_partitions: int | None = None):
    """RANK() / PERCENT_RANK() of ``value_col`` within ``group_col``,
    fully distributed via the distinct-value route:

    1. ``groupby(group, value).count()`` — the only pass that touches
       every row, reduced to one row per DISTINCT (group, value);
    2. a per-group ordered scan over the distinct table (rank of a value
       = 1 + Σ counts of strictly smaller values) — group size is the
       group's distinct-value count, not its row count, so a hot group
       with few distinct values stays bounded;
    3. hash-join the (group, value) → (rank, percent_rank) table back.

    Exact SQL window semantics: RANK ties share the rank, PERCENT_RANK =
    (rank-1)/(n-1), 0 for single-row groups. Appends ``rank`` (int64) and
    ``percent_rank`` (float64).

    Floating value columns rank/join through a ``+0.0``-normalized shadow
    key: groupby merges ``-0.0`` with ``0.0`` but the Acero hash join does
    NOT match them, which silently dropped every ``-0.0`` row.
    """
    import pandas as pd

    from ballet_ray.stages.joins import hash_join

    user_value_col = value_col
    sch = ds.schema()
    vtype = dict(zip(sch.names, sch.types))[value_col]
    is_float = isinstance(vtype, pa.DataType) and pa.types.is_floating(vtype)
    if is_float:
        shadow = "__rank_v"

        def add_shadow(t: pa.Table, value_col=value_col) -> pa.Table:
            v = pc.add(pc.cast(t.column(value_col), pa.float64()), 0.0)
            return t.append_column(shadow, v)

        ds = ds.map_batches(add_shadow, batch_format="pyarrow")
        value_col = shadow

    cnt = ds.groupby([group_col, value_col]).count()

    # coarse-partition rank scan: hash-partition GROUPS, rank a whole
    # partition's groups in one vectorized pass (a per-group map_groups
    # pays Ray's per-group frame plumbing for every distinct group)
    from ballet_ray.functions.partition import default_coarse_parts

    n_parts = default_coarse_parts()

    def add_part(t) -> "pa.Table":
        import pyarrow as pa

        from ballet_ray.functions.partition import stable_hash_array

        h = stable_hash_array(t.column(group_col).to_numpy(zero_copy_only=False))
        return t.append_column(
            "__part", pa.array((h % np.uint64(n_parts)).astype(np.int64)))

    def ranks_part(df: pd.DataFrame) -> pd.DataFrame:
        cols = [group_col, value_col, "rank", "percent_rank"]
        if not len(df):
            return pd.DataFrame({c: [] for c in cols})
        df = df.sort_values([group_col, value_col], kind="mergesort")
        g = df[group_col].to_numpy()
        c = df["count()"].to_numpy(dtype=np.int64)
        new = np.concatenate([[True], g[1:] != g[:-1]])
        starts = np.flatnonzero(new)
        run_lens = np.diff(np.concatenate([starts, [len(g)]]))
        excl = np.concatenate([[0], np.cumsum(c)[:-1]])
        prior = excl - np.repeat(excl[starts], run_lens)
        totals = np.add.reduceat(c, starts)
        n_rep = np.repeat(totals, run_lens)
        with np.errstate(divide="ignore", invalid="ignore"):
            pct = np.where(n_rep > 1, prior / (n_rep - 1), 0.0)
        return pd.DataFrame({group_col: g, value_col: df[value_col].to_numpy(),
                             "rank": prior + 1, "percent_rank": pct})

    from ballet_ray.stages.joins import default_join_partitions, scrub_empty_blocks

    ranked = (cnt.map_batches(add_part, batch_format="pyarrow")
              .groupby("__part").map_groups(ranks_part, batch_format="pandas"))
    # pandas map_groups can emit schema-less empty blocks (empty sorted
    # ranges) that poison the join aggregator — scrub before joining
    ranked = scrub_empty_blocks(ranked)
    out = hash_join(
        ds, ranked, on=(group_col, value_col),
        num_partitions=default_join_partitions(num_partitions),
    )
    if value_col != user_value_col:
        out = out.map_batches(lambda t: t.drop_columns([value_col]),
                              batch_format="pyarrow")
    return out


def rank_buckets(ds, *, value_col: str, group_col: str | None = None,
                 cuts: tuple[float, ...] = (1.0 / 3, 2.0 / 3),
                 labels: tuple[str, ...] = ("head", "middle", "tail"),
                 out_col: str = "bucket", keep_rank: bool = False,
                 num_partitions: int | None = None):
    """Quantile-bucket labels by within-group PERCENT_RANK — the CCNet
    head/middle/tail split (Wenzek et al. 2020 §3.3: rank every document
    by LM perplexity *within its language* and cut the ranking into
    thirds; 'head' = the best-scoring third). Generic: any value column,
    any cut points, optional grouping.

    Built on :func:`grouped_rank` (exact SQL window semantics — ties
    share a rank, PERCENT_RANK = (rank−1)/(n−1)), so the whole stage
    stays one distinct-value groupby + one join; the bucket label is a
    map-side ``searchsorted`` over ``cuts``. Row i gets ``labels[k]``
    where k = #{cuts ≤ percent_rank} — i.e. ``pr < cuts[0]`` → first
    label, matching SQL ``CASE WHEN pr < c0 THEN …`` exactly.
    """
    cuts = tuple(float(c) for c in cuts)
    if len(labels) != len(cuts) + 1:
        raise ValueError("need len(labels) == len(cuts) + 1")
    if any(not 0.0 < c < 1.0 for c in cuts) or list(cuts) != sorted(set(cuts)):
        raise ValueError("cuts must be strictly increasing within (0, 1)")

    drop_group = group_col is None
    if drop_group:
        group_col = "__g"

        def add_g(t: pa.Table) -> pa.Table:
            return t.append_column("__g", pa.array(np.zeros(len(t), dtype=np.int64)))

        ds = ds.map_batches(add_g, batch_format="pyarrow")

    ranked = grouped_rank(ds, group_col=group_col, value_col=value_col,
                          num_partitions=num_partitions)
    cut_arr = np.asarray(cuts)
    lab_arr = np.asarray(labels, dtype=object)

    def label(t: pa.Table) -> pa.Table:
        pr = t.column("percent_rank").to_numpy(zero_copy_only=False)
        idx = np.searchsorted(cut_arr, pr, side="right")
        t = t.append_column(out_col, pa.array(lab_arr[idx].astype(str)))
        drop = [] if keep_rank else ["rank", "percent_rank"]
        if drop_group:
            drop.append("__g")
        return t.drop_columns(drop)

    return ranked.map_batches(label, batch_format="pyarrow")
