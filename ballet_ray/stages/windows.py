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

from ballet_ray.functions import windows_np as wnp
from ballet_ray.functions.partition import BUCKET_COL, bucketize, sort_table
from ballet_ray.transformer import Transform


class KeyedTransform(Transform):
    """Base for transforms needing (entity_key, order_by) co-partitioning.

    ``transform_sorted(values_table, codes, starts, cols)`` receives the
    bucket table already sorted by (key, order) plus precomputed group codes
    and group-start indices; returns {output_name: np.ndarray}.
    """

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


class Lag(KeyedTransform):
    """shift(k) within each entity ordered by ``order_by`` (k<0 = lead)."""

    def __init__(self, k: int, key: str, order_by: str | None = None):
        super().__init__(key, order_by)
        self.k = k

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

    def __init__(self, lags: list[int], key: str, order_by: str | None = None):
        super().__init__(key, order_by)
        self.lags = list(lags)

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


class RollingMean(KeyedTransform):
    def __init__(self, window: int, key: str, order_by: str | None = None):
        super().__init__(key, order_by)
        self.window = window

    def transform_sorted(self, table, codes, starts, cols):
        return {
            f"{c}_rmean{self.window}": wnp.rolling_mean(_vals(table, c), starts, self.window)
            for c in cols
        }

    def output_names(self, cols):
        return [f"{c}_rmean{self.window}" for c in cols]


class RollingSum(KeyedTransform):
    def __init__(self, window: int, key: str, order_by: str | None = None):
        super().__init__(key, order_by)
        self.window = window

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

    def __init__(self, gap_seconds: float, key: str, order_by: str | None = None):
        super().__init__(key, order_by)
        self.gap_us = int(gap_seconds * 1_000_000)

    def transform_sorted(self, table, codes, starts, cols):
        c = cols[0]
        ts = table.column(c).cast(pa.int64()).to_numpy(zero_copy_only=False)
        return {"session_id": wnp.sessionize(ts, codes, self.gap_us)}

    def output_names(self, cols):
        return ["session_id"]


class CumCount(KeyedTransform):
    """0-based occurrence index of the row within its entity."""

    def transform_sorted(self, table, codes, starts, cols):
        return {"cum_count": wnp.cum_count(codes)}

    def output_names(self, cols):
        return ["cum_count"]


class RollingMeanTime(KeyedTransform):
    """Time-range trailing mean: rows within [ts - range, ts] of the current
    row's timestamp (SQL RANGE BETWEEN ... PRECEDING AND CURRENT ROW).
    cols = [value col]; constructor takes the ts column."""

    def __init__(self, range_seconds: float, ts_col: str, key: str):
        super().__init__(key, ts_col)
        self.range_us = int(range_seconds * 1_000_000)
        self.ts_col = ts_col

    def transform_sorted(self, table, codes, starts, cols):
        ts = table.column(self.ts_col).cast(pa.int64()).to_numpy(zero_copy_only=False)
        out = {}
        n = len(ts)
        # window start index: first j >= group_start with ts[j] >= ts[i]-range;
        # searchsorted over the whole sorted array then clipped to group start
        # is correct because ts is sorted within groups.
        for c in cols:
            v = _vals(table, c)
            cs = np.concatenate([[0.0], np.cumsum(np.where(np.isnan(v), 0.0, v))])
            cn = np.concatenate([[0], np.cumsum(~np.isnan(v))])
            lo = np.searchsorted(ts, ts - self.range_us, side="left")
            lo = np.maximum(lo, starts)
            idx = np.arange(n)
            s = cs[idx + 1] - cs[lo]
            cnt = cn[idx + 1] - cn[lo]
            with np.errstate(invalid="ignore", divide="ignore"):
                m = s / cnt
            m[cnt == 0] = np.nan
            out[f"{c}_rtmean"] = m
        return out

    def output_names(self, cols):
        return [f"{c}_rtmean" for c in cols]


def apply_keyed(
    ds,
    transforms: list[tuple[KeyedTransform, list[str], list[str]]],
    key: str,
    order_by=None,
    *,
    num_buckets: int = 64,
):
    """Run all keyed transforms sharing (key, order_by) in ONE shuffle.

    transforms: list of (transform, input_cols, output_names). Returns the
    dataset with all output columns appended (original columns preserved).
    """
    if order_by is None:
        order_by = ()
    elif isinstance(order_by, str):
        order_by = (order_by,)
    sort_keys = [key, *order_by]

    def per_bucket(table: pa.Table) -> pa.Table:
        table = table.drop_columns([BUCKET_COL])
        tbl = sort_table(table, sort_keys)
        keys_np = tbl.column(key).to_numpy(zero_copy_only=False)
        codes = wnp.group_codes(keys_np)
        starts = wnp.group_starts(codes)
        for t, cols, names in transforms:
            outs = t.transform_sorted(tbl, codes, starts, cols)
            produced = list(outs)
            for want, have in zip(names, produced):
                arr = outs[have]
                tbl = tbl.append_column(want, pa.array(arr) if not isinstance(arr, (pa.Array, pa.ChunkedArray)) else arr)
        return tbl

    b = bucketize(ds, key, num_buckets)
    return b.groupby(BUCKET_COL).map_groups(per_bucket, batch_format="pyarrow")
