"""Streaming bucket-actor stage must equal the batch keyed pass."""

import numpy as np
import pandas as pd
import ray.data as rd

from ballet_ray.stages.streaming import streaming_window_features
from ballet_ray.stages.windows import CumCount, Lag, Sessionize, apply_keyed


def test_streaming_equals_batch(sf_dir):
    ds = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["user_id", "ts", "value"])
    stream = streaming_window_features(
        ds, key="user_id", ts_col="ts", value_col="value", gap_seconds=1800, num_buckets=4
    ).to_pandas()

    batch = apply_keyed(
        ds,
        [
            (Sessionize(1800, key="user_id", order_by="ts"), ["ts"], ["session_id"]),
            (CumCount(key="user_id", order_by="ts"), [], ["cum_count"]),
            (Lag(1, key="user_id", order_by="ts"), ["value"], ["value_lag1"]),
        ],
        "user_id",
        "ts",
        num_buckets=4,
    ).to_pandas()

    s = stream.sort_values(["user_id", "ts"]).reset_index(drop=True)
    b = batch.sort_values(["user_id", "ts"]).reset_index(drop=True)
    assert len(s) == len(b)
    assert (s["session_id"].to_numpy() == b["session_id"].to_numpy()).all()
    assert (s["cum_count"].to_numpy() == b["cum_count"].to_numpy()).all()
    assert np.allclose(s["value_lag1"].to_numpy(), b["value_lag1"].to_numpy(), equal_nan=True)


def test_streaming_state_persists_across_calls():
    """Feeding the log in two chunks must give the same result as one feed —
    the actor state genuinely carries across batches."""
    t0 = pd.Timestamp("2024-01-01")
    df = pd.DataFrame(
        {
            "user_id": [1, 1, 1, 1],
            "ts": t0 + pd.to_timedelta([0, 10, 7200, 7210], "s"),
            "value": [1.0, 2.0, 3.0, 4.0],
        }
    )
    out = streaming_window_features(
        rd.from_pandas(df), key="user_id", ts_col="ts", value_col="value",
        gap_seconds=1800, num_buckets=2,
    ).to_pandas().sort_values("ts")
    assert out["session_id"].tolist() == [0, 0, 1, 1]
    assert out["cum_count"].tolist() == [0, 1, 2, 3]
    assert np.allclose(out["value_lag1"].to_numpy(), [np.nan, 1.0, 2.0, 3.0], equal_nan=True)


def test_streaming_feed_incremental_across_feeds():
    """True online ingestion: two sequential feeds must equal one feed —
    per-entity state genuinely persists in the bucket actors."""
    import pyarrow as pa

    from ballet_ray.stages.streaming import StreamingFeed

    t0 = pd.Timestamp("2024-01-01")
    df = pd.DataFrame(
        {
            "user_id": [1, 2, 1, 2, 1, 1],
            "ts": t0 + pd.to_timedelta([0, 5, 10, 20, 7200, 7210], "s"),
            "value": [1.0, 10.0, 2.0, 20.0, 3.0, 4.0],
        }
    )
    whole = StreamingFeed(key="user_id", ts_col="ts", value_col="value", gap_seconds=1800, num_buckets=2)
    one = whole.feed(pa.Table.from_pandas(df)).to_pandas()

    split = StreamingFeed(key="user_id", ts_col="ts", value_col="value", gap_seconds=1800, num_buckets=2)
    a = split.feed(pa.Table.from_pandas(df.iloc[:3])).to_pandas()
    b = split.feed(pa.Table.from_pandas(df.iloc[3:])).to_pandas()
    two = pd.concat([a, b], ignore_index=True)

    for c in ("session_id", "cum_count"):
        assert one[c].tolist() == two[c].tolist()
    assert np.allclose(one["value_lag1"], two["value_lag1"], equal_nan=True)
    assert one["session_id"].tolist() == [0, 0, 0, 0, 1, 1]
    assert one["cum_count"].tolist() == [0, 0, 1, 1, 2, 3]
