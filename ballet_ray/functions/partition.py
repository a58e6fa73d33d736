"""Hash-bucket co-partitioning — the engine's shuffle workhorse.

Keyed/windowed operators and as-of joins need every row of an entity in one
place. Instead of ``groupby(entity)`` (one pandas group per entity — ruinous
per-group overhead with billions of small entities), we bucket entities with
a *stable* hash into B buckets and run ``groupby(bucket).map_groups`` with a
fully vectorized kernel per bucket. B bounds the shuffle fan-in; hot keys are
handled above this layer (see stages/asof.py).

The hash must be identical across processes and runs (Python's builtin
``hash`` is salted), so we use polars' fixed-seed vectorized hash (Rust,
~0.07 µs/row on strings — 5× pandas' cython object hash, 20× on ints;
measured on 4M keys) with pandas' siphash ``hash_array`` as the fallback
for dtypes polars can't ingest. Both are deterministic across processes
for a fixed library version — which is what partitioning and the
hash-priority sampling modes need on a homogeneous cluster.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

BUCKET_COL = "__bucket"


def default_coarse_parts(requested: int | None = None) -> int:
    """Partition count for the coarse GROUP kernels (stratified/weighted
    sample merge, ts-features entities, winnow fp buckets, grouped_rank):
    enough tasks to use the cluster, floor 64 so one task never holds more
    than ~1/64 of a pruned group table. Unlike join aggregators (capped at
    32 actors — joins.default_join_partitions), these are plain groupby
    shuffle partitions: more is safe, and the result is partition-count
    independent (the group hash decides placement, never the winners)."""
    if requested is not None:
        return requested
    try:
        import ray

        cpus = int(ray.cluster_resources().get("CPU", 32))
    except Exception:
        cpus = 32
    return max(64, 2 * cpus)


def hash_backend() -> str:
    """Identity of the vectorized hash :func:`stable_hash_array` resolves
    to in this environment. Persisted hash-derived state (Bloom bitsets,
    fitted split/sample artifacts) is stamped with this tag so a restore
    under a DIFFERENT backend — whose hashes do not line up bit-for-bit —
    fails loudly instead of silently losing replay suppression or leaking
    test rows into train (the r4 md5→siphash default flip was breaking in
    exactly this way)."""
    try:
        import polars  # noqa: F401

        return "polars-siphash-v0"
    except Exception:
        return "pandas-hasharray-v0"


def stable_hash_array(values) -> np.ndarray:
    """Deterministic uint64 hash of an arbitrary array-like (vectorized)."""
    arr = np.asarray(values)
    if arr.dtype.kind in ("U", "S"):
        arr = arr.astype(object)
    try:
        import polars as pl

        return pl.Series(arr).hash(seed=0).to_numpy().astype(np.uint64, copy=False)
    except BaseException:
        # BaseException: polars raises pyo3 PanicException (NOT an
        # Exception subclass) on object arrays of unhashable elements
        return pd.util.hash_array(arr, categorize=False)


def add_bucket_column(batch: pa.Table, key: str, num_buckets: int, *, salt: np.ndarray | None = None) -> pa.Table:
    """Append ``__bucket = stable_hash(key) % B`` to an Arrow batch."""
    col = batch.column(key)
    h = stable_hash_array(col.to_numpy(zero_copy_only=False))
    b = (h % np.uint64(num_buckets)).astype(np.int32)
    if salt is not None:
        b = (b + salt) % np.int32(num_buckets)
    return batch.append_column(BUCKET_COL, pa.array(b))


def bucketize(ds, key: str, num_buckets: int):
    """Add the bucket column to a Dataset (stateless map_batches, zero-copy)."""
    return ds.map_batches(
        lambda t, k=key, n=num_buckets: add_bucket_column(t, k, n),
        batch_format="pyarrow",
    )


def sort_table(table: pa.Table, keys: list[str]) -> pa.Table:
    """Sort an Arrow table by the given columns ascending (nulls last)."""
    return table.sort_by([(k, "ascending") for k in keys])
