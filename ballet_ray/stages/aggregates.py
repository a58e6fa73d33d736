"""Per-entity aggregation feature generators — native minimal subsets of
the reference's two heaviest external re-exports:

- ``extract_ts_features``: tsfresh-FeatureAugmenter-shaped per-entity time
  series features (reference re-export ballet/eng/external/tsfresh.py:1-6;
  SURVEY §2.3 maps it to ``groupby(entity).map_groups(extract_fn)``). One
  row per entity, a curated set of the classic tsfresh primitives,
  computed with numpy kernels inside one grouped pass.

- ``dfs_aggregate_features``: featuretools-DFS-shaped one-level
  aggregation features across a parent←child relationship (reference
  re-export ballet/eng/external/featuretools.py:1-6): per parent key,
  count/sum/mean/min/max/std of child value columns, joined back onto the
  parent table (broadcast — the aggregate is one row per parent key).

Both are pre-aggregated: the child/event table is reduced per-batch where
possible and shuffles only (key, partial aggregate) rows.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

_TS_FEATURES = (
    "mean",
    "std",
    "min",
    "max",
    "median",
    "abs_energy",
    "mean_abs_change",
    "count_above_mean",
    "n",
)


def extract_ts_features(
    ds,
    *,
    key: str,
    order_by,
    value_col: str,
    features: tuple = _TS_FEATURES,
):
    """One row per entity with the selected series features of
    ``value_col`` ordered by ``order_by``. Order only matters for
    mean_abs_change; the rest are order-free reductions."""
    order_by = [order_by] if isinstance(order_by, str) else list(order_by)
    unknown = set(features) - set(_TS_FEATURES)
    if unknown:
        raise ValueError(f"unknown ts features: {sorted(unknown)}")

    def per_entity(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(order_by)
        x = g[value_col].to_numpy(dtype=np.float64)
        x = x[~np.isnan(x)]
        row: dict = {key: g[key].iloc[0]}
        n = len(x)
        for f in features:
            if f == "n":
                row[f"{value_col}_n"] = n
            elif f == "mean":
                row[f"{value_col}_mean"] = x.mean() if n else np.nan
            elif f == "std":
                row[f"{value_col}_std"] = x.std() if n else np.nan
            elif f == "min":
                row[f"{value_col}_min"] = x.min() if n else np.nan
            elif f == "max":
                row[f"{value_col}_max"] = x.max() if n else np.nan
            elif f == "median":
                row[f"{value_col}_median"] = float(np.median(x)) if n else np.nan
            elif f == "abs_energy":
                row[f"{value_col}_abs_energy"] = float((x * x).sum())
            elif f == "mean_abs_change":
                row[f"{value_col}_mean_abs_change"] = (
                    float(np.abs(np.diff(x)).mean()) if n > 1 else np.nan
                )
            elif f == "count_above_mean":
                row[f"{value_col}_count_above_mean"] = int((x > x.mean()).sum()) if n else 0
        return pd.DataFrame([row])

    cols = sorted({key, *order_by, value_col})
    return ds.select_columns(cols).groupby(key).map_groups(per_entity, batch_format="pandas")


_DFS_AGGS = ("count", "sum", "mean", "min", "max", "std")


def dfs_aggregate_features(
    parent,
    child,
    *,
    parent_key: str,
    child_key: str | None = None,
    value_cols: list[str],
    aggs: tuple = ("count", "sum", "mean"),
    fill_missing: float | None = 0.0,
):
    """One-level deep-feature-synthesis: per parent key, aggregate the
    child's value columns and broadcast-join the (one row per key) result
    onto the parent. Parents without children get ``fill_missing`` (None →
    null). Column names: ``<child_col>_<agg>`` plus ``child_count``."""
    from ray.data.aggregate import Count, Max, Mean, Min, Std, Sum

    child_key = child_key or parent_key
    unknown = set(aggs) - set(_DFS_AGGS)
    if unknown:
        raise ValueError(f"unknown dfs aggs: {sorted(unknown)}")

    agg_objs, out_cols = [], []
    if "count" in aggs:
        agg_objs.append(Count(alias_name="child_count"))
        out_cols.append("child_count")
    makers = {"sum": Sum, "mean": Mean, "min": Min, "max": Max}
    for c in value_cols:
        for a in aggs:
            if a == "count":
                continue
            name = f"{c}_{a}"
            if a == "std":
                agg_objs.append(Std(c, ddof=0, alias_name=name))
            else:
                agg_objs.append(makers[a](c, alias_name=name))
            out_cols.append(name)

    stats = (
        child.select_columns([child_key] + value_cols)
        .groupby(child_key)
        .aggregate(*agg_objs)
    )
    from ballet_ray.stages.joins import broadcast_join

    joined = broadcast_join(
        parent, stats, key=parent_key, right_key=child_key, value_cols=out_cols
    )
    if fill_missing is None:
        return joined

    def fill(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        for c in out_cols:
            i = t.column_names.index(c)
            col = t.column(c)
            t = t.set_column(i, c, pc.fill_null(col, fill_missing))
        return t

    return joined.map_batches(fill, batch_format="pyarrow")
