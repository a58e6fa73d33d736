"""Sharded-Bloom streaming exact dedup (stages/streaming_dedup.py)."""

import numpy as np
import ray
import ray.data as rd

from ballet_ray.stages.streaming_dedup import (
    _BloomCore,
    make_bloom_index,
    streaming_exact_dedup,
)


def test_bloom_core_semantics():
    b = _BloomCore(bits=1 << 16, k=7)
    h = np.array([10, 20, 10, 30, 20], dtype=np.uint64)
    fresh = b.check_and_add(h)
    # first occurrence of each distinct hash is fresh, repeats are not
    assert list(fresh) == [True, True, False, True, False]
    # nothing is fresh on the second call — no false negatives ever
    assert not b.check_and_add(h).any()
    assert b.check_and_add(np.array([99], dtype=np.uint64)).all()


def test_bloom_state_roundtrip():
    a = _BloomCore(bits=1 << 16, k=5)
    a.check_and_add(np.arange(100, dtype=np.uint64))
    b = _BloomCore(bits=1 << 16, k=5)
    b.restore(a.state())
    assert not b.check_and_add(np.arange(100, dtype=np.uint64)).any()
    assert b.check_and_add(np.array([1000], dtype=np.uint64)).all()


def test_streaming_dedup_end_to_end():
    # 300 rows over 100 distinct contents, spread across partitions
    rows = [{"i": i, "text": f"content-{i % 100}"} for i in range(300)]
    ds = rd.from_items(rows).repartition(4)
    handles = make_bloom_index(3, bits=1 << 22)
    out = streaming_exact_dedup(ds, col="text", handles=handles).to_pandas()
    assert sorted(out["text"].unique()) == sorted(out["text"])  # unique survivors
    assert set(out["text"]) == {f"content-{j}" for j in range(100)}  # complete


def test_index_persists_across_datasets():
    handles = make_bloom_index(2, bits=1 << 22)
    day1 = rd.from_items([{"text": f"d-{i}"} for i in range(50)]).repartition(2)
    day2 = rd.from_items(
        [{"text": f"d-{i}"} for i in range(40, 90)]  # 10 overlap
    ).repartition(2)
    out1 = streaming_exact_dedup(day1, col="text", handles=handles).to_pandas()
    out2 = streaming_exact_dedup(day2, col="text", handles=handles).to_pandas()
    assert len(out1) == 50
    assert set(out2["text"]) == {f"d-{i}" for i in range(50, 90)}  # only the new 40
    # replay of day1 is fully suppressed
    again = streaming_exact_dedup(day1, col="text", handles=handles).to_pandas()
    assert len(again) == 0


def test_job_resume_via_state_blobs():
    handles = make_bloom_index(2, bits=1 << 22)
    ds = rd.from_items([{"text": f"r-{i}"} for i in range(30)])
    streaming_exact_dedup(ds, col="text", handles=handles).materialize()
    blobs = ray.get([h.state.remote() for h in handles])
    # "job restart": fresh actors restored from the checkpointed bitsets
    fresh = make_bloom_index(2, bits=1 << 22)
    ray.get([h.restore.remote(b) for h, b in zip(fresh, blobs)])
    out = streaming_exact_dedup(ds, col="text", handles=fresh).to_pandas()
    assert len(out) == 0


def test_no_duplicate_survives_even_with_tiny_filter():
    # an undersized filter may DROP uniques (false positives) but must
    # never let a duplicate through (false negatives are impossible)
    rows = [{"text": f"t-{i % 60}"} for i in range(240)]
    ds = rd.from_items(rows).repartition(4)
    handles = make_bloom_index(2, bits=1 << 10, k=4)  # deliberately tiny
    out = streaming_exact_dedup(ds, col="text", handles=handles).to_pandas()
    assert out["text"].is_unique
    assert len(out) <= 60


def test_concurrent_callers_unique_survivors():
    # threaded shards + core lock: hammer one index from many parallel
    # map tasks; survivors must still be globally unique
    rows = [{"text": f"c-{i % 500}"} for i in range(20_000)]
    ds = rd.from_items(rows).repartition(16)
    handles = make_bloom_index(4, bits=1 << 22)
    out = streaming_exact_dedup(ds, col="text", handles=handles).to_pandas()
    assert out["text"].is_unique
    assert set(out["text"]) == {f"c-{j}" for j in range(500)}
