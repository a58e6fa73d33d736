"""Mergeable sketches: approximate distinct counting at scale.

Pattern (ray_guide: "Aggregation at scale"): each batch emits ONE
serialized sketch row; a second tiny stage merges them — sketches are
designed to be mergeable, so the shuffle carries bytes, not rows.

KMV (k-minimum-values) estimator: keep the k smallest 64-bit hashes of
the values; distinct ≈ (k-1) / max_kept_normalized. Standard error
≈ 1/√(k-2) (Bar-Yossef et al. 2002) — k=1024 gives ~3%.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ballet_ray.functions.partition import stable_hash_array

_MAX = float(2**64)


def _kmv_sketch(values: np.ndarray, k: int) -> np.ndarray:
    h = np.unique(stable_hash_array(values))
    return h[:k] if len(h) > k else h


def _kmv_estimate(h: np.ndarray, k: int) -> float:
    if len(h) < k:
        return float(len(h))  # exact below sketch capacity
    return (k - 1) / (float(h[k - 1]) / _MAX)


def approx_distinct(ds, col: str, *, k: int = 1024) -> float:
    """Approximate COUNT(DISTINCT col) with one streaming pass; the shuffle
    carries ≤ k uint64 values per batch. Merging is a worker-side
    tree-reduce (per-block partial merge via map_batches, then one grouped
    merge) — the driver receives exactly one ≤k-value sketch, never the
    per-batch sketch stream."""

    def partial(t: pa.Table) -> pa.Table:
        vals = t.column(col).to_numpy(zero_copy_only=False)
        sk = _kmv_sketch(vals, k)
        return pa.table({"g": pa.array([0], type=pa.int8()),
                         "sketch": pa.array([sk.astype(np.uint64).tobytes()])})

    def merge_blobs(blobs) -> bytes:
        merged = np.array([], dtype=np.uint64)
        for blob in blobs:
            sk = np.frombuffer(blob, dtype=np.uint64)
            merged = np.unique(np.concatenate([merged, sk]))[:k]
        return merged.tobytes()

    def combine(t: pa.Table) -> pa.Table:
        return pa.table({"g": pa.array([0], type=pa.int8()),
                         "sketch": pa.array([merge_blobs(t.column("sketch").to_pylist())])})

    parts = ds.select_columns([col]).map_batches(partial, batch_format="pyarrow")
    # per-block combine shrinks each block to one row before the final
    # single-group reduce
    combined = parts.map_batches(combine, batch_format="pyarrow")
    import pandas as pd

    def final(g: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"sketch": [merge_blobs(g["sketch"])]})

    out = combined.groupby("g").map_groups(final, batch_format="pandas").take(1)
    merged = np.frombuffer(out[0]["sketch"], dtype=np.uint64)
    return _kmv_estimate(merged, k)


def approx_distinct_per_group(ds, col: str, by: str, *, k: int = 256):
    """Approximate per-group distinct counts: per-batch per-group sketches →
    grouped merge → estimate. Returns a pandas DataFrame (by, approx_nd)."""
    import pandas as pd

    def partial(t: pa.Table) -> pa.Table:
        groups = t.column(by).to_numpy(zero_copy_only=False)
        vals = t.column(col).to_numpy(zero_copy_only=False)
        uniq = np.unique(groups)
        rows_g, rows_s = [], []
        for g in uniq:
            sk = _kmv_sketch(vals[groups == g], k)
            rows_g.append(g)
            rows_s.append(sk.astype(np.uint64).tobytes())
        return pa.table({by: pa.array(rows_g), "sketch": pa.array(rows_s)})

    def merge_group(g: pd.DataFrame) -> pd.DataFrame:
        merged = np.array([], dtype=np.uint64)
        for blob in g["sketch"]:
            sk = np.frombuffer(blob, dtype=np.uint64)
            merged = np.unique(np.concatenate([merged, sk]))[:k]
        return pd.DataFrame({by: [g[by].iloc[0]], "approx_nd": [_kmv_estimate(merged, k)]})

    out = (
        ds.select_columns([by, col])
        .map_batches(partial, batch_format="pyarrow")
        .groupby(by)
        .map_groups(merge_group, batch_format="pandas")
    )
    return out.to_pandas()
