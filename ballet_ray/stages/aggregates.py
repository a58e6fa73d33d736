"""Per-entity aggregation feature generators — native minimal subsets of
the reference's two heaviest external re-exports:

- ``extract_ts_features``: tsfresh-FeatureAugmenter-shaped per-entity time
  series features (reference re-export ballet/eng/external/tsfresh.py:1-6;
  SURVEY §2.3 maps it to ``groupby(entity).map_groups(extract_fn)``). One
  row per entity, a curated set of the classic tsfresh primitives.

- ``dfs_aggregate_features``: featuretools-DFS-shaped aggregation features
  across a parent←child relationship (reference re-export
  ballet/eng/external/featuretools.py:1-6): per parent key,
  count/sum/mean/min/max/std of child value columns, joined back onto the
  parent table. ``dfs_two_hop`` composes it for depth-2 DFS
  (grandparent←parent←child).

Skew safety (the 100 TB story): both generators are bounded-per-task.

- ``dfs_aggregate_features`` pre-reduces every batch with a pandas combiner so
  the groupby shuffle ships only (key, partial) rows — a hot parent key
  contributes ONE partial row per batch, never its raw children.
- ``extract_ts_features`` takes a ``skew_threshold``: entities above it
  (found by a mergeable count pre-pass) leave the whole-group path and get
  dedicated scale passes — mergeable moment partials for
  mean/std/min/max/abs_energy/n, a broadcast-mean second pass for
  count_above_mean, the hot-sliced keyed ``Difference`` machinery for
  mean_abs_change, and exact distributed bucket-selection for the median.
  Non-hot entities keep the single-shuffle whole-group path, whose group
  size is bounded by the threshold (runtime-guarded).
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


def _per_entity_stats(x: np.ndarray, features) -> dict:
    """Whole-series kernel (non-hot path); x already NaN-filtered."""
    row: dict = {}
    n = len(x)
    for f in features:
        if f == "n":
            row["n"] = n
        elif f == "mean":
            row["mean"] = x.mean() if n else np.nan
        elif f == "std":
            row["std"] = x.std() if n else np.nan
        elif f == "min":
            row["min"] = x.min() if n else np.nan
        elif f == "max":
            row["max"] = x.max() if n else np.nan
        elif f == "median":
            row["median"] = float(np.median(x)) if n else np.nan
        elif f == "abs_energy":
            row["abs_energy"] = float((x * x).sum())
        elif f == "mean_abs_change":
            row["mean_abs_change"] = float(np.abs(np.diff(x)).mean()) if n > 1 else np.nan
        elif f == "count_above_mean":
            row["count_above_mean"] = int((x > x.mean()).sum()) if n else 0
    return row


def _grouped_count(ds, key: str):
    """Mergeable per-key row count: per-batch pandas combiner → grouped
    Sum. The shuffle ships one (key, partial) row per batch per key."""
    from ray.data.aggregate import Sum

    def partial(t: pa.Table) -> pa.Table:
        k = t.column(key).to_numpy(zero_copy_only=False)
        g = pd.DataFrame({key: k, "__cnt": np.ones(len(k), dtype=np.int64)}).groupby(
            key, sort=False
        )["__cnt"].sum()
        return pa.Table.from_pandas(g.reset_index(), preserve_index=False)

    return (
        ds.select_columns([key])
        .map_batches(partial, batch_format="pyarrow")
        .groupby(key)
        .aggregate(Sum("__cnt", alias_name="__cnt"))
    )


def _hot_base_stats(hot_ds, key: str, value_col: str) -> pd.DataFrame:
    """Mergeable moment partials for the hot entities: per-batch pandas
    combiner → grouped Sum/Min/Max → derived mean/std/energy on the (one
    row per hot key) result."""
    from ray.data.aggregate import Max, Min, Sum

    def partial(t: pa.Table) -> pa.Table:
        k = t.column(key).to_numpy(zero_copy_only=False)
        x = t.column(value_col).to_numpy(zero_copy_only=False).astype(np.float64)
        ok = ~np.isnan(x)
        df = pd.DataFrame(
            {
                key: k,
                "__n": ok.astype(np.int64),
                "__s": np.where(ok, x, 0.0),
                "__ss": np.where(ok, x * x, 0.0),
                "__mn": np.where(ok, x, np.inf),
                "__mx": np.where(ok, x, -np.inf),
            }
        )
        g = df.groupby(key, sort=False).agg(
            {"__n": "sum", "__s": "sum", "__ss": "sum", "__mn": "min", "__mx": "max"}
        )
        return pa.Table.from_pandas(g.reset_index(), preserve_index=False)

    agg = (
        hot_ds.map_batches(partial, batch_format="pyarrow")
        .groupby(key)
        .aggregate(
            Sum("__n", alias_name="__n"),
            Sum("__s", alias_name="__s"),
            Sum("__ss", alias_name="__ss"),
            Min("__mn", alias_name="__mn"),
            Max("__mx", alias_name="__mx"),
        )
        .to_pandas()  # one row per HOT key — tiny by construction
    )
    n = agg["__n"].to_numpy().astype(np.float64)
    s = agg["__s"].to_numpy()
    ss = agg["__ss"].to_numpy()
    with np.errstate(invalid="ignore", divide="ignore"):
        mean = s / n
        var = np.maximum(ss / n - mean * mean, 0.0)
    out = pd.DataFrame(
        {
            key: agg[key],
            "n": agg["__n"].astype(np.int64),
            "mean": np.where(n > 0, mean, np.nan),
            "std": np.where(n > 0, np.sqrt(var), np.nan),
            "min": np.where(n > 0, agg["__mn"].to_numpy(), np.nan),
            "max": np.where(n > 0, agg["__mx"].to_numpy(), np.nan),
            "abs_energy": ss,
        }
    )
    return out


def _hot_count_above_mean(hot_ds, key: str, value_col: str, means: dict) -> dict:
    """Second mergeable pass with the (tiny) hot-key means broadcast in the
    task closure: per-batch partial counts of value > mean(key) → Sum."""
    from ray.data.aggregate import Sum

    def partial(t: pa.Table, means=means) -> pa.Table:
        k = t.column(key).to_numpy(zero_copy_only=False)
        x = t.column(value_col).to_numpy(zero_copy_only=False).astype(np.float64)
        mu = pd.Series(k).map(means).to_numpy(dtype=np.float64)
        above = (x > mu).astype(np.int64)  # NaN compares False, like SQL
        g = pd.DataFrame({key: k, "__a": above}).groupby(key, sort=False)["__a"].sum()
        return pa.Table.from_pandas(g.reset_index(), preserve_index=False)

    agg = (
        hot_ds.map_batches(partial, batch_format="pyarrow")
        .groupby(key)
        .aggregate(Sum("__a", alias_name="__a"))
        .to_pandas()
    )
    return dict(zip(agg[key], agg["__a"].astype(np.int64)))


def _hot_mean_abs_change(hot_ds, key: str, order_by: list, value_col: str,
                         skew_threshold: int, slice_target: int) -> dict:
    """Order-dependent |x - lag(x)| via the hot-sliced keyed Difference
    pass (exact across time-slice boundaries by carried state), then a
    mergeable Sum/count reduction."""
    from ray.data.aggregate import Sum

    from ballet_ray.stages.windows import Difference, apply_keyed

    t = Difference(1, key, tuple(order_by))
    dcol = t.output_names([value_col])[0]
    diffd = apply_keyed(
        hot_ds,
        [(t, [value_col], [dcol])],
        key,
        tuple(order_by),
        skew_threshold=skew_threshold,
        slice_target=slice_target,
    )

    def partial(t_: pa.Table) -> pa.Table:
        k = t_.column(key).to_numpy(zero_copy_only=False)
        d = t_.column(dcol).to_numpy(zero_copy_only=False).astype(np.float64)
        ok = ~np.isnan(d)
        g = pd.DataFrame(
            {key: k, "__sd": np.where(ok, np.abs(d), 0.0), "__nd": ok.astype(np.int64)}
        ).groupby(key, sort=False).agg({"__sd": "sum", "__nd": "sum"})
        return pa.Table.from_pandas(g.reset_index(), preserve_index=False)

    agg = (
        diffd.select_columns([key, dcol])
        .map_batches(partial, batch_format="pyarrow")
        .groupby(key)
        .aggregate(Sum("__sd", alias_name="__sd"), Sum("__nd", alias_name="__nd"))
        .to_pandas()
    )
    out = {}
    for _, r in agg.iterrows():
        out[r[key]] = float(r["__sd"] / r["__nd"]) if r["__nd"] > 0 else np.nan
    return out


def _hot_median(hot_ds, key: str, value_col: str, base: pd.DataFrame,
                collect_cap: int = 500_000, buckets: int = 256, max_iters: int = 12) -> dict:
    """Exact per-key median for hot entities by distributed bucket
    selection: iteratively histogram each key's value range (mergeable
    per-batch partial counts → grouped Sum), locate the bucket(s) holding
    the two middle ranks, and either narrow the range or — once the
    candidate bucket is under ``collect_cap`` rows OR its width shrinks to
    float resolution (duplicate-heavy data) — collect just that range as
    DISTINCT (value, count) partials and select exactly by rank. Never
    materializes a hot entity."""
    from ray.data.aggregate import Sum

    state = {}
    for _, r in base.iterrows():
        n = int(r["n"])
        if n == 0:
            state[r[key]] = None  # all-null → NaN median
            continue
        state[r[key]] = {
            "lo": float(r["min"]),
            "hi": float(r["max"]),
            "n": n,
            "r1": (n - 1) // 2,
            "r2": n // 2,
            "below": 0,  # count of values < lo across the whole series
            "done": None,
        }
    result = {k: np.nan for k in state}
    active = {k: v for k, v in state.items() if v is not None}

    for _ in range(max_iters):
        active = {k: v for k, v in active.items() if v["done"] is None}
        if not active:
            break
        # degenerate range → every in-range value equals lo
        for k, st in list(active.items()):
            if st["hi"] <= st["lo"]:
                result[k] = st["lo"]
                st["done"] = True
        active = {k: v for k, v in active.items() if v["done"] is None}
        if not active:
            break
        edges = {
            k: np.linspace(st["lo"], st["hi"], buckets + 1) for k, st in active.items()
        }

        def hist_partial(t: pa.Table, edges=edges) -> pa.Table:
            k = t.column(key).to_numpy(zero_copy_only=False)
            x = t.column(value_col).to_numpy(zero_copy_only=False).astype(np.float64)
            frames = []
            for kk, e in edges.items():
                m = (k == kk) & ~np.isnan(x)
                if not m.any():
                    continue
                xv = x[m]
                inr = (xv >= e[0]) & (xv <= e[-1])
                b = np.clip(np.searchsorted(e, xv[inr], side="right") - 1, 0, buckets - 1)
                cnt = np.bincount(b, minlength=buckets)
                nz = np.flatnonzero(cnt)
                frames.append(
                    pd.DataFrame({key: kk, "__b": nz, "__c": cnt[nz].astype(np.int64)})
                )
            if not frames:
                return pa.table(
                    {key: pa.array([], type=t.column(key).type),
                     "__b": pa.array([], type=pa.int64()),
                     "__c": pa.array([], type=pa.int64())}
                )
            return pa.Table.from_pandas(pd.concat(frames, ignore_index=True), preserve_index=False)

        hist = (
            hot_ds.map_batches(hist_partial, batch_format="pyarrow")
            .groupby([key, "__b"])
            .aggregate(Sum("__c", alias_name="__c"))
            .to_pandas()  # ≤ hot_keys × buckets rows
        )
        collect_ranges = {}
        for kk, st in active.items():
            sub = hist[hist[key] == kk].sort_values("__b")
            cnt = np.zeros(buckets, dtype=np.int64)
            cnt[sub["__b"].to_numpy()] = sub["__c"].to_numpy()
            cum = np.concatenate([[0], np.cumsum(cnt)])
            e = edges[kk]
            # both middle ranks, relative to values >= lo (st["below"] are smaller)
            need = [st["r1"] - st["below"], st["r2"] - st["below"]]
            bsel = [int(np.searchsorted(cum, q, side="right") - 1) for q in need]
            b_lo, b_hi = min(bsel), max(bsel)
            span = int(cum[b_hi + 1] - cum[b_lo])
            width = float(e[b_hi + 1] - e[b_lo])
            at_resolution = width <= 16 * np.spacing(max(abs(e[b_lo]), abs(e[b_hi + 1]), 1.0))
            # duplicate-heavy data: the candidate span stops shrinking once
            # only (near-)identical values remain — count-based narrowing
            # can't converge, but the DISTINCT values in the range are few
            if span == st.get("last_span"):
                st["stuck"] = st.get("stuck", 0) + 1
            else:
                st["stuck"] = 0
            st["last_span"] = span
            if span <= collect_cap or at_resolution or st["stuck"] >= 2:
                # distinct-value collect: duplicate-heavy buckets stay over
                # the row cap forever, but their DISTINCT values are few
                # once the range is at float resolution
                collect_ranges[kk] = (e[b_lo], e[b_hi + 1], st["below"] + int(cum[b_lo]))
                st["done"] = "collect"
            else:
                # narrow to the single bucket holding both ranks (they are
                # at most adjacent; if they straddle, span is 2 buckets —
                # still narrow, re-histogram the combined range)
                st["below"] += int(cum[b_lo])
                st["lo"], st["hi"] = float(e[b_lo]), float(e[b_hi + 1])

        if collect_ranges:
            from ray.data.aggregate import Sum as _Sum

            def grab(t: pa.Table, cr=collect_ranges) -> pa.Table:
                k = t.column(key).to_numpy(zero_copy_only=False)
                x = t.column(value_col).to_numpy(zero_copy_only=False).astype(np.float64)
                frames = []
                for kk, (lo, hi, _) in cr.items():
                    m = (k == kk) & ~np.isnan(x) & (x >= lo) & (x <= hi)
                    if m.any():
                        uv, uc = np.unique(x[m], return_counts=True)
                        frames.append(
                            pd.DataFrame({key: kk, "__v": uv, "__c": uc.astype(np.int64)})
                        )
                if not frames:
                    return pa.table(
                        {key: pa.array([], type=t.column(key).type),
                         "__v": pa.array([], type=pa.float64()),
                         "__c": pa.array([], type=pa.int64())}
                    )
                return pa.Table.from_pandas(pd.concat(frames, ignore_index=True), preserve_index=False)

            vals = (
                hot_ds.map_batches(grab, batch_format="pyarrow")
                .groupby([key, "__v"])
                .aggregate(_Sum("__c", alias_name="__c"))
                .to_pandas()  # distinct in-range values per key — bounded
            )
            for kk, (lo, hi, below) in collect_ranges.items():
                sub = vals.loc[vals[key] == kk].sort_values("__v")
                uv = sub["__v"].to_numpy()
                cum = np.cumsum(sub["__c"].to_numpy())
                st = active[kk]
                # global ranks r1/r2 → local ranks after `below` smaller values;
                # a rank r lands on the first distinct value whose cumcount > r
                picks = []
                for r in (st["r1"] - below, st["r2"] - below):
                    picks.append(uv[int(np.searchsorted(cum, r, side="right"))])
                result[kk] = float((picks[0] + picks[1]) / 2.0)
    for kk, st in state.items():
        if st is not None and np.isnan(result.get(kk, np.nan)) and st.get("done") is None:
            # unresolved after max_iters (pathological): midpoint of the
            # final (float-resolution-narrow) range
            result[kk] = float((st["lo"] + st["hi"]) / 2.0)
    return result


def extract_ts_features(
    ds,
    *,
    key: str,
    order_by,
    value_col: str,
    features: tuple = _TS_FEATURES,
    skew_threshold: int | None = 1_000_000,
    slice_target: int = 250_000,
):
    """One row per entity with the selected series features of
    ``value_col`` ordered by ``order_by``. Order only matters for
    mean_abs_change; the rest are order-free reductions.

    Entities above ``skew_threshold`` rows (found by a mergeable count
    pre-pass) are computed by dedicated bounded-per-task passes (moment
    partials, broadcast-mean count pass, hot-sliced keyed diff, bucket-
    selection median) instead of one unbounded pandas group; all other
    entities take the single-shuffle whole-group path, whose group size is
    bounded by the threshold. ``skew_threshold=None`` disables the split.
    """
    order_by = [order_by] if isinstance(order_by, str) else list(order_by)
    unknown = set(features) - set(_TS_FEATURES)
    if unknown:
        raise ValueError(f"unknown ts features: {sorted(unknown)}")

    cols = sorted({key, *order_by, value_col})
    narrow = ds.select_columns(cols)

    hot_keys: list = []
    if skew_threshold is not None:
        import pyarrow.compute as pc

        counts = _grouped_count(narrow, key)
        hot_df = counts.map_batches(
            lambda t, thr=skew_threshold: t.filter(pc.greater(t.column("__cnt"), thr))
            if "__cnt" in t.column_names
            else t,
            batch_format="pyarrow",
        ).to_pandas()  # one row per HOT key — tiny
        hot_keys = list(hot_df[key]) if len(hot_df) else []

    def per_entity(g: pd.DataFrame) -> pd.DataFrame:
        if skew_threshold is not None and len(g) > skew_threshold:
            raise AssertionError(
                f"extract_ts_features: whole-entity group of {len(g)} rows "
                f"exceeds skew_threshold={skew_threshold} — hot-key split failed"
            )
        g = g.sort_values(order_by)
        x = g[value_col].to_numpy(dtype=np.float64)
        x = x[~np.isnan(x)]
        row = {key: g[key].iloc[0]}
        for f, v in _per_entity_stats(x, features).items():
            row[f"{value_col}_{f}"] = v
        return pd.DataFrame([row])

    base_ds = narrow
    if hot_keys:
        from ballet_ray.stages.joins import semi_join_filter

        base_ds = semi_join_filter(narrow, np.array(hot_keys), key=key, invert=True)
    out = base_ds.groupby(key).map_groups(per_entity, batch_format="pandas")

    if not hot_keys:
        return out

    # ---- hot entities: bounded-per-task scale passes --------------------
    from ballet_ray.stages.joins import semi_join_filter

    hot_ds = semi_join_filter(narrow, np.array(hot_keys), key=key).materialize()
    base = _hot_base_stats(hot_ds, key, value_col)
    feats = set(features)
    cam = (
        _hot_count_above_mean(hot_ds, key, value_col, dict(zip(base[key], base["mean"])))
        if "count_above_mean" in feats
        else {}
    )
    mac = (
        _hot_mean_abs_change(hot_ds, key, order_by, value_col, skew_threshold, slice_target)
        if "mean_abs_change" in feats
        else {}
    )
    med = _hot_median(hot_ds, key, value_col, base) if "median" in feats else {}

    rows = []
    for _, r in base.iterrows():
        kk = r[key]
        row = {key: kk}
        for f in features:
            name = f"{value_col}_{f}"
            if f in ("mean", "std", "min", "max", "abs_energy"):
                row[name] = float(r[f])
            elif f == "n":
                row[name] = int(r["n"])
            elif f == "count_above_mean":
                row[name] = int(cam.get(kk, 0))
            elif f == "mean_abs_change":
                row[name] = float(mac.get(kk, np.nan))
            elif f == "median":
                row[name] = float(med.get(kk, np.nan))
        rows.append(row)
    import ray.data as rdata

    return out.union(rdata.from_pandas(pd.DataFrame(rows)))


def dfs_two_hop(
    grandparent,
    parent,
    child,
    *,
    gp_key: str,
    parent_gp_key: str,
    parent_key: str,
    child_parent_key: str | None = None,
    value_cols: list[str],
    child_aggs: tuple = ("count", "sum"),
    parent_aggs: tuple = ("sum", "mean"),
    fill_missing: float | None = 0.0,
):
    """Depth-2 deep feature synthesis (featuretools-style recursive DFS —
    reference re-export ballet/eng/external/featuretools.py:1-6): child
    aggregates roll up to the parent first, then those per-parent features
    aggregate again to the grandparent, yielding features like
    SUM(orders.SUM(lineitem.quantity)) and MEAN(orders.COUNT(lineitem)).
    Composed from two one-level passes, child aggregates first — both
    combiner-pre-reduced, so no key's raw rows ever funnel into one task.
    Output columns: the level-2 names ``child_count`` (parents per
    grandparent) plus ``<level1_col>_<agg>`` for every level-1 feature
    (e.g. ``child_count_sum``, ``<col>_sum_mean``)."""
    level1 = dfs_aggregate_features(
        parent,
        child,
        parent_key=parent_key,
        child_key=child_parent_key,
        value_cols=value_cols,
        aggs=child_aggs,
        fill_missing=fill_missing,
    )
    l1_cols = []
    if "count" in child_aggs:
        l1_cols.append("child_count")
    for c in value_cols:
        for a in child_aggs:
            if a != "count":
                l1_cols.append(f"{c}_{a}")
    return dfs_aggregate_features(
        grandparent,
        level1,
        parent_key=gp_key,
        child_key=parent_gp_key,
        value_cols=l1_cols,
        aggs=parent_aggs,
        fill_missing=fill_missing,
    )


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
    null). Column names: ``<child_col>_<agg>`` plus ``child_count``.

    The child pass pre-reduces inside each batch (pandas combiner emitting
    count/sum/sumsq/min/max partials per key) so the groupby shuffle ships
    one partial row per key per batch — a hot parent key never funnels its
    raw children into a single task. mean/std are derived from the merged
    moments (ddof=0, matching sklearn/Ray ``Std(ddof=0)``)."""
    from ray.data.aggregate import Max, Min, Sum

    child_key = child_key or parent_key
    unknown = set(aggs) - set(_DFS_AGGS)
    if unknown:
        raise ValueError(f"unknown dfs aggs: {sorted(unknown)}")

    need_moments = {"sum", "mean", "std"} & set(aggs)

    def partial(t: pa.Table) -> pa.Table:
        k = t.column(child_key).to_numpy(zero_copy_only=False)
        data = {child_key: k, "__rows": np.ones(len(k), dtype=np.int64)}
        agg_spec = {"__rows": "sum"}
        for c in value_cols:
            x = t.column(c).to_numpy(zero_copy_only=False).astype(np.float64)
            ok = ~np.isnan(x)
            data[f"__n_{c}"] = ok.astype(np.int64)
            agg_spec[f"__n_{c}"] = "sum"
            if need_moments:
                data[f"__s_{c}"] = np.where(ok, x, 0.0)
                agg_spec[f"__s_{c}"] = "sum"
            if "std" in aggs:
                data[f"__ss_{c}"] = np.where(ok, x * x, 0.0)
                agg_spec[f"__ss_{c}"] = "sum"
            if "min" in aggs:
                data[f"__mn_{c}"] = np.where(ok, x, np.inf)
                agg_spec[f"__mn_{c}"] = "min"
            if "max" in aggs:
                data[f"__mx_{c}"] = np.where(ok, x, -np.inf)
                agg_spec[f"__mx_{c}"] = "max"
        g = pd.DataFrame(data).groupby(child_key, sort=False).agg(agg_spec)
        return pa.Table.from_pandas(g.reset_index(), preserve_index=False)

    agg_objs = [Sum("__rows", alias_name="__rows")]
    for c in value_cols:
        agg_objs.append(Sum(f"__n_{c}", alias_name=f"__n_{c}"))
        if need_moments:
            agg_objs.append(Sum(f"__s_{c}", alias_name=f"__s_{c}"))
        if "std" in aggs:
            agg_objs.append(Sum(f"__ss_{c}", alias_name=f"__ss_{c}"))
        if "min" in aggs:
            agg_objs.append(Min(f"__mn_{c}", alias_name=f"__mn_{c}"))
        if "max" in aggs:
            agg_objs.append(Max(f"__mx_{c}", alias_name=f"__mx_{c}"))

    merged = (
        child.select_columns([child_key] + list(value_cols))
        .map_batches(partial, batch_format="pyarrow")
        .groupby(child_key)
        .aggregate(*agg_objs)
    )

    out_cols = []
    if "count" in aggs:
        out_cols.append("child_count")
    for c in value_cols:
        for a in aggs:
            if a != "count":
                out_cols.append(f"{c}_{a}")

    def derive(t: pa.Table) -> pa.Table:
        if child_key not in t.column_names:  # schema-less empty block
            return pa.table({c: pa.array([], type=pa.float64()) for c in [child_key, *out_cols]})
        cols = {child_key: t.column(child_key)}
        if "count" in aggs:
            cols["child_count"] = t.column("__rows")
        for c in value_cols:
            n = t.column(f"__n_{c}").to_numpy(zero_copy_only=False).astype(np.float64)
            ok = n > 0
            s = t.column(f"__s_{c}").to_numpy(zero_copy_only=False) if need_moments else None
            with np.errstate(invalid="ignore", divide="ignore"):
                for a in aggs:
                    if a == "count":
                        continue
                    name = f"{c}_{a}"
                    if a == "sum":
                        v = np.where(ok, s, np.nan)
                    elif a == "mean":
                        v = np.where(ok, s / n, np.nan)
                    elif a == "std":
                        ss = t.column(f"__ss_{c}").to_numpy(zero_copy_only=False)
                        mu = s / n
                        v = np.where(ok, np.sqrt(np.maximum(ss / n - mu * mu, 0.0)), np.nan)
                    elif a == "min":
                        v = np.where(ok, t.column(f"__mn_{c}").to_numpy(zero_copy_only=False), np.nan)
                    elif a == "max":
                        v = np.where(ok, t.column(f"__mx_{c}").to_numpy(zero_copy_only=False), np.nan)
                    cols[name] = pa.array(v, type=pa.float64())
        return pa.table(cols)

    stats = merged.map_batches(derive, batch_format="pyarrow")
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
            if pa.types.is_null(col.type):
                col = col.cast(pa.float64())
            t = t.set_column(i, c, pc.fill_null(col, fill_missing))
        return t

    return joined.map_batches(fill, batch_format="pyarrow")
