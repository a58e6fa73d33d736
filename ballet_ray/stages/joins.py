"""Equi-joins: broadcast (small side) and partitioned hash (both large).

- ``broadcast_join``: the small side is collected to a plain dict of numpy
  arrays, ``ray.put`` once, and each map task looks rows up vectorized —
  no shuffle. Correct choice for dimension tables (category dicts,
  nation/region, model vocabularies).
- ``hash_join``: both sides large → Ray Data's native hash-partitioned
  ``Dataset.join`` with an explicit partition count.
- ``semi_join_filter`` / ``anti_join_filter``: broadcast the key set and
  filter inside ``map_batches``.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray


def default_join_partitions(requested: int | None = None) -> int:
    """Pick a hash-join partition count that cannot starve the cluster.

    Ray's hash-shuffle join runs one aggregator actor per partition; asking
    for more partitions than cores on a small cluster deadlocks the
    streaming executor (observed at 16 partitions on 4 CPUs). Default to
    half the cluster CPUs, capped at 32 — callers running on a real
    multi-node cluster should pass an explicit count sized to the data.
    """
    if requested is not None:
        return requested
    try:
        cpus = int(ray.cluster_resources().get("CPU", 4))
    except Exception:
        cpus = 4
    return max(2, min(32, cpus // 2))


def _small_side_to_frame(small) -> pd.DataFrame:
    if isinstance(small, pd.DataFrame):
        return small
    if isinstance(small, pa.Table):
        return small.to_pandas()
    # assume a Dataset
    return small.to_pandas()


def broadcast_join(
    ds,
    small,
    *,
    key: str,
    right_key: str | None = None,
    value_cols: list[str] | None = None,
    how: str = "left",
):
    """Join a Dataset against a small in-memory side without a shuffle.

    The small side is shipped via the object store once (``ray.put``) and
    merged into each Arrow batch with a pandas hash merge on the two key
    columns only (payload columns never convert to pandas).
    """
    right_key = right_key or key
    sdf = _small_side_to_frame(small)
    if value_cols is None:
        value_cols = [c for c in sdf.columns if c != right_key]
    sdf = sdf[[right_key] + value_cols].drop_duplicates(subset=[right_key])
    ref = ray.put(sdf)

    def merge(t: pa.Table) -> pa.Table:
        small_df = ray.get(ref)
        keys = pd.DataFrame({key: t.column(key).to_numpy(zero_copy_only=False)})
        m = keys.merge(
            small_df, how="left", left_on=key, right_on=right_key, sort=False
        )
        if how == "inner":
            mask = ~m[value_cols[0]].isna() if value_cols else np.ones(len(m), bool)
            sel = pa.array(mask.to_numpy())
            t = t.filter(sel)
            m = m[mask.to_numpy()]
        for c in value_cols:
            t = t.append_column(c, pa.Array.from_pandas(m[c]))
        return t

    return ds.map_batches(merge, batch_format="pyarrow")


def hash_join(left, right, *, on, right_on=None, how: str = "inner", num_partitions: int = 32):
    """Large-large equi-join via Ray Data's hash-partitioned Dataset.join."""
    on = (on,) if isinstance(on, str) else tuple(on)
    right_on = (right_on,) if isinstance(right_on, str) else (tuple(right_on) if right_on else None)
    return left.join(
        right,
        join_type=how,
        num_partitions=num_partitions,
        on=on,
        right_on=right_on,
    )


def semi_join_filter(ds, keys, *, key: str, invert: bool = False):
    """Keep (or drop) rows whose key is in the broadcast key set."""
    arr = np.asarray(list(keys) if not isinstance(keys, np.ndarray) else keys)
    ref = ray.put(arr)

    def flt(t: pa.Table) -> pa.Table:
        kset = ray.get(ref)
        mask = np.isin(t.column(key).to_numpy(zero_copy_only=False), kset)
        if invert:
            mask = ~mask
        return t.filter(pa.array(mask))

    return ds.map_batches(flt, batch_format="pyarrow")
