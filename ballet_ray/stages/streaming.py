"""Streaming-shaped processing: incremental per-entity state.

Ray Data is a batch engine with no event-time watermarks; for
stream-shaped workloads the guide's pattern is an ordered, partitioned
log with per-key-hash-bucket consumers holding incremental state. Two
surfaces share one incremental kernel (``_process_ordered``):

- ``streaming_window_features`` — Dataset→Dataset: rows are hash-bucketed
  by key (one vectorized map_batches), then each bucket is consumed IN
  TIME ORDER by one ``map_groups`` task that walks the bucket in chunks,
  carrying per-entity running state across chunks exactly as a streaming
  consumer would. Outputs flow worker→worker; the driver never touches a
  row (the round-trip collect of the round-1 implementation is gone).

- ``StreamingFeed`` — true online ingestion for an unbounded,
  incrementally arriving log: per-bucket Ray actors hold state ACROSS
  ``feed()`` calls (Ray actors execute calls in submission order, so
  per-bucket ordering is preserved). This is the path the batch Dataset
  API cannot express: state lives between independent feeds.

Per row the features are: session_id (gap-based), cum_count, value_lag1 —
byte-equal to the batch keyed pass on the same data (tested).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray

from ballet_ray.functions.partition import stable_hash_array
from ballet_ray.stages.windows import _ts_us_col


def _process_ordered(keys, ts: np.ndarray, vals: np.ndarray, gap_us: int, state: dict):
    """Incremental kernel: one pass over time-ordered rows, mutating
    ``state`` (key -> (last_ts, last_val, session_id, row_count)) and
    returning (session, cum_count, lag1) for the rows."""
    n = len(keys)
    session = np.empty(n, dtype=np.int64)
    cum = np.empty(n, dtype=np.int64)
    lag1 = np.full(n, np.nan)
    for i in range(n):
        s = state.get(keys[i])
        if s is None:
            session[i] = 0
            cum[i] = 0
        else:
            session[i] = s[2] + (1 if ts[i] - s[0] > gap_us else 0)
            cum[i] = s[3]
            lag1[i] = s[1]
        state[keys[i]] = (ts[i], vals[i], session[i], cum[i] + 1)
    return session, cum, lag1


def streaming_window_features(
    ds,
    *,
    key: str,
    ts_col: str,
    value_col: str,
    gap_seconds: float,
    num_buckets: int = 8,
    chunk_rows: int = 8192,
):
    """Consume a time-ordered event log incrementally through per-bucket
    streaming consumers; returns a Dataset with one output row per input
    row. Fully distributed: a vectorized bucketing map, one shuffle to
    co-locate each bucket, and a per-bucket ordered walk whose state dict
    carries across chunks — the driver never materializes data."""
    gap_us = int(gap_seconds * 1_000_000)

    def bucket(t: pa.Table) -> pa.Table:
        keys = t.column(key).to_numpy(zero_copy_only=False)
        b = (stable_hash_array(keys) % np.uint64(num_buckets)).astype(np.int32)
        return pa.table(
            {
                key: t.column(key),
                ts_col: t.column(ts_col),
                value_col: t.column(value_col),
                "__bucket": pa.array(b),
            }
        )

    bucketed = ds.map_batches(bucket, batch_format="pyarrow")

    def consume(g: pd.DataFrame) -> pd.DataFrame:
        ts = _ts_us_col(pa.Array.from_pandas(g[ts_col]))
        order = np.argsort(ts, kind="stable")  # the log's arrival order
        keys = g[key].to_numpy()[order]
        ts = ts[order]
        vals = g[value_col].to_numpy()[order].astype(np.float64)
        n = len(g)
        state: dict = {}
        sess = np.empty(n, dtype=np.int64)
        cum = np.empty(n, dtype=np.int64)
        lag1 = np.empty(n, dtype=np.float64)
        # walk the bucket in chunks, carrying state across chunk boundaries —
        # the same code path an unbounded consumer runs
        for lo in range(0, n, chunk_rows):
            hi = min(n, lo + chunk_rows)
            s, c, l1 = _process_ordered(keys[lo:hi], ts[lo:hi], vals[lo:hi], gap_us, state)
            sess[lo:hi], cum[lo:hi], lag1[lo:hi] = s, c, l1
        return pd.DataFrame(
            {
                key: keys,
                ts_col: ts.astype("datetime64[us]"),
                "session_id": sess,
                "cum_count": cum,
                "value_lag1": lag1,
            }
        )

    return bucketed.groupby("__bucket").map_groups(consume, batch_format="pandas")


@ray.remote
class _BucketStateActor:
    """Incremental per-entity window state for one key-hash bucket; state
    persists across ``process`` calls (i.e. across feeds)."""

    def __init__(self, gap_us: int):
        self.gap_us = gap_us
        self.state: dict = {}

    def process(self, keys: np.ndarray, ts: np.ndarray, vals: np.ndarray):
        return _process_ordered(keys, ts, vals, self.gap_us, self.state)

    def n_entities(self) -> int:
        return len(self.state)


class StreamingFeed:
    """Online ingestion of an unbounded log: feed() any number of
    time-ordered Arrow tables; per-entity state persists across feeds in
    per-bucket actors. Per-bucket ordering holds because Ray actors run
    calls in submission order and each bucket maps to exactly one actor."""

    def __init__(self, *, key: str, ts_col: str, value_col: str, gap_seconds: float, num_buckets: int = 8):
        self.key, self.ts_col, self.value_col = key, ts_col, value_col
        self.num_buckets = num_buckets
        gap_us = int(gap_seconds * 1_000_000)
        self.actors = [_BucketStateActor.remote(gap_us) for _ in range(num_buckets)]

    def feed(self, table: pa.Table) -> pa.Table:
        """Ingest one time-ordered slice of the log; returns the slice's
        feature rows (same order as the input)."""
        keys = table.column(self.key).to_numpy(zero_copy_only=False)
        ts = _ts_us_col(table.column(self.ts_col))
        vals = table.column(self.value_col).to_numpy(zero_copy_only=False).astype(np.float64)
        b = (stable_hash_array(keys) % np.uint64(self.num_buckets)).astype(np.int64)
        pending, slots = [], []
        for bk in range(self.num_buckets):
            m = np.flatnonzero(b == bk)
            if not len(m):
                continue
            pending.append(self.actors[bk].process.remote(keys[m], ts[m], vals[m]))
            slots.append(m)
        n = len(keys)
        sess = np.empty(n, dtype=np.int64)
        cum = np.empty(n, dtype=np.int64)
        lag1 = np.empty(n, dtype=np.float64)
        for m, (s, c, l1) in zip(slots, ray.get(pending)):
            sess[m], cum[m], lag1[m] = s, c, l1
        return pa.table(
            {
                self.key: table.column(self.key),
                self.ts_col: table.column(self.ts_col),
                "session_id": pa.array(sess),
                "cum_count": pa.array(cum),
                "value_lag1": pa.array(lag1),
            }
        )
