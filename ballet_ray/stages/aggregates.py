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

# the full tsfresh-style catalogue (tsfresh.feature_extraction.feature_calculators
# names where they exist; population-moment definitions, linear-interpolated
# quantiles, 0-based index positions for the trend). Every member has BOTH a
# whole-series kernel and a bounded-per-task hot-entity path.
_TS_FEATURES_FULL = _TS_FEATURES + (
    "sum",
    "variance",
    "skewness",
    "kurtosis",
    "root_mean_square",
    "quantile_25",
    "quantile_75",
    "absolute_sum_of_changes",
    "mean_change",
    "cid_ce",
    "count_below_mean",
    "ratio_beyond_2sigma",
    "number_crossings_mean",
    "linear_trend_slope",
)


def _per_entity_stats(x: np.ndarray, features) -> dict:
    """Whole-series kernel (non-hot path); x already NaN-filtered and in
    entity order. Definitions shared with the hot path: population moments
    (skew = m3/sigma^3, kurtosis = m4/sigma^4 - 3), np.quantile linear
    interpolation, crossings of the mean counted as (x_t > mu) flips,
    least-squares slope against 0-based positions."""
    row: dict = {}
    n = len(x)
    mu = float(x.mean()) if n else np.nan
    sigma = float(x.std()) if n else np.nan
    d = np.diff(x) if n > 1 else np.empty(0)
    for f in features:
        if f == "n":
            row["n"] = n
        elif f == "sum":
            row["sum"] = float(x.sum())
        elif f == "mean":
            row["mean"] = mu
        elif f == "std":
            row["std"] = sigma
        elif f == "variance":
            row["variance"] = sigma * sigma if n else np.nan
        elif f == "skewness":
            row["skewness"] = (
                float(((x - mu) ** 3).mean() / sigma**3) if n and sigma > 0 else np.nan
            )
        elif f == "kurtosis":
            row["kurtosis"] = (
                float(((x - mu) ** 4).mean() / sigma**4 - 3.0) if n and sigma > 0 else np.nan
            )
        elif f == "root_mean_square":
            row["root_mean_square"] = float(np.sqrt((x * x).mean())) if n else np.nan
        elif f == "min":
            row["min"] = x.min() if n else np.nan
        elif f == "max":
            row["max"] = x.max() if n else np.nan
        elif f == "median":
            row["median"] = float(np.median(x)) if n else np.nan
        elif f == "quantile_25":
            row["quantile_25"] = float(np.quantile(x, 0.25)) if n else np.nan
        elif f == "quantile_75":
            row["quantile_75"] = float(np.quantile(x, 0.75)) if n else np.nan
        elif f == "abs_energy":
            row["abs_energy"] = float((x * x).sum())
        elif f == "mean_abs_change":
            row["mean_abs_change"] = float(np.abs(d).mean()) if n > 1 else np.nan
        elif f == "absolute_sum_of_changes":
            row["absolute_sum_of_changes"] = float(np.abs(d).sum())
        elif f == "mean_change":
            row["mean_change"] = float((x[-1] - x[0]) / (n - 1)) if n > 1 else np.nan
        elif f == "cid_ce":
            row["cid_ce"] = float(np.sqrt((d * d).sum()))
        elif f == "count_above_mean":
            row["count_above_mean"] = int((x > mu).sum()) if n else 0
        elif f == "count_below_mean":
            row["count_below_mean"] = int((x < mu).sum()) if n else 0
        elif f == "ratio_beyond_2sigma":
            row["ratio_beyond_2sigma"] = (
                float((np.abs(x - mu) > 2 * sigma).mean()) if n else np.nan
            )
        elif f == "number_crossings_mean":
            row["number_crossings_mean"] = (
                int(((x[1:] > mu) != (x[:-1] > mu)).sum()) if n > 1 else 0
            )
        elif f == "linear_trend_slope":
            if n > 1:
                p = np.arange(n, dtype=np.float64)
                pbar = (n - 1) / 2.0
                row["linear_trend_slope"] = float(
                    ((p * x).sum() - pbar * x.sum()) / ((p * p).sum() - n * pbar * pbar)
                )
            else:
                row["linear_trend_slope"] = np.nan
    return row


def _grouped_count(ds, key: str):
    """Mergeable per-key row count: per-batch pandas combiner → coarse-
    partition grouped_reduce (the key is high-cardinality, where Ray's
    per-group combine costs ~60 µs/key/task). The shuffle ships one
    (key, partial) row per batch per key."""
    from ballet_ray.functions.reduce import grouped_reduce

    def partial(t: pa.Table) -> pa.Table:
        k = t.column(key).to_numpy(zero_copy_only=False)
        g = pd.DataFrame({key: k, "__cnt": np.ones(len(k), dtype=np.int64)}).groupby(
            key, sort=False
        )["__cnt"].sum()
        return pa.Table.from_pandas(g.reset_index(), preserve_index=False)

    return grouped_reduce(
        ds.select_columns([key]).map_batches(partial, batch_format="pyarrow"),
        key,
        {"__cnt": "sum"},
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
        xv = np.where(ok, x, 0.0)
        df = pd.DataFrame(
            {
                key: k,
                "__n": ok.astype(np.int64),
                "__s": xv,
                "__ss": xv * xv,
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
        rms = np.sqrt(ss / n)
    out = pd.DataFrame(
        {
            key: agg[key],
            "n": agg["__n"].astype(np.int64),
            "sum": s,
            "mean": np.where(n > 0, mean, np.nan),
            "std": np.where(n > 0, np.sqrt(var), np.nan),
            "variance": np.where(n > 0, var, np.nan),
            "root_mean_square": np.where(n > 0, rms, np.nan),
            "min": np.where(n > 0, agg["__mn"].to_numpy(), np.nan),
            "max": np.where(n > 0, agg["__mx"].to_numpy(), np.nan),
            "abs_energy": ss,
        }
    )
    return out


def _hot_centered_stats(hot_ds, key: str, value_col: str, means: dict, stds: dict) -> pd.DataFrame:
    """Second mergeable pass with the (tiny) hot-key means/stds broadcast
    in the task closure: per-batch partial counts of value above/below the
    key's mean and beyond 2 sigma, plus CENTERED third/fourth moment sums
    (numerically stable skew/kurtosis — raw-moment differences cancel
    catastrophically at corpus magnitudes)."""
    from ray.data.aggregate import Sum

    def partial(t: pa.Table, means=means, stds=stds) -> pa.Table:
        k = t.column(key).to_numpy(zero_copy_only=False)
        x = t.column(value_col).to_numpy(zero_copy_only=False).astype(np.float64)
        mu = pd.Series(k).map(means).to_numpy(dtype=np.float64)
        sd = pd.Series(k).map(stds).to_numpy(dtype=np.float64)
        ok = ~np.isnan(x)
        c = np.where(ok, x - mu, 0.0)
        g = pd.DataFrame(
            {
                key: k,
                "__a": (x > mu).astype(np.int64),  # NaN compares False, like SQL
                "__b": (x < mu).astype(np.int64),
                "__y": (np.abs(np.where(ok, c, 0.0)) > 2 * sd).astype(np.int64),
                "__c3": c * c * c,
                "__c4": c * c * c * c,
            }
        ).groupby(key, sort=False).sum()
        return pa.Table.from_pandas(g.reset_index(), preserve_index=False)

    return (
        hot_ds.map_batches(partial, batch_format="pyarrow")
        .groupby(key)
        .aggregate(
            Sum("__a", alias_name="__a"),
            Sum("__b", alias_name="__b"),
            Sum("__y", alias_name="__y"),
            Sum("__c3", alias_name="__c3"),
            Sum("__c4", alias_name="__c4"),
        )
        .to_pandas()
    )


def _hot_ordered_stats(hot_ds, key: str, order_by: list, value_col: str, means: dict,
                       skew_threshold: int, slice_target: int) -> pd.DataFrame:
    """All ORDER-dependent hot-entity reductions in one pass: a hot-sliced
    keyed Lag(1) + CumCount pass (exact across time-slice boundaries by
    carried state) attaches each row's predecessor value and 0-based
    position, then a mergeable partial reduction derives

      sum|d| / sum d / sum d^2 / n_d   (mean_abs_change, absolute_sum_of_
                                        changes, mean_change, cid_ce)
      crossings of the broadcast mean   (number_crossings_mean)
      sum(pos * x)                      (linear_trend_slope — sum(pos) and
                                        sum(pos^2) are closed-form in n)
    """
    from ray.data.aggregate import Sum

    from ballet_ray.stages.windows import CumCount, Lag, apply_keyed

    t_lag = Lag(1, key, tuple(order_by))
    t_cc = CumCount(key, tuple(order_by))
    lagc = t_lag.output_names([value_col])[0]
    ext = apply_keyed(
        hot_ds,
        [(t_lag, [value_col], [lagc]), (t_cc, [value_col], ["cum_count"])],
        key,
        tuple(order_by),
        skew_threshold=skew_threshold,
        slice_target=slice_target,
    )

    def partial(t_: pa.Table, means=means) -> pa.Table:
        k = t_.column(key).to_numpy(zero_copy_only=False)
        x = t_.column(value_col).to_numpy(zero_copy_only=False).astype(np.float64)
        lg = t_.column(lagc).to_numpy(zero_copy_only=False).astype(np.float64)
        pos = t_.column("cum_count").to_numpy(zero_copy_only=False).astype(np.float64)
        mu = pd.Series(k).map(means).to_numpy(dtype=np.float64)
        d = x - lg
        ok = ~np.isnan(d)
        has_prev = ~np.isnan(lg) & ~np.isnan(x)
        g = pd.DataFrame(
            {
                key: k,
                "__sad": np.where(ok, np.abs(d), 0.0),
                "__sd": np.where(ok, d, 0.0),
                "__sd2": np.where(ok, d * d, 0.0),
                "__nd": ok.astype(np.int64),
                "__xc": (has_prev & ((x > mu) != (lg > mu))).astype(np.int64),
                "__spx": np.where(np.isnan(x), 0.0, pos * x),
            }
        ).groupby(key, sort=False).sum()
        return pa.Table.from_pandas(g.reset_index(), preserve_index=False)

    return (
        ext.select_columns([key, value_col, lagc, "cum_count"])
        .map_batches(partial, batch_format="pyarrow")
        .groupby(key)
        .aggregate(
            Sum("__sad", alias_name="__sad"),
            Sum("__sd", alias_name="__sd"),
            Sum("__sd2", alias_name="__sd2"),
            Sum("__nd", alias_name="__nd"),
            Sum("__xc", alias_name="__xc"),
            Sum("__spx", alias_name="__spx"),
        )
        .to_pandas()
    )


def _hot_quantiles(hot_ds, key: str, value_col: str, base: pd.DataFrame, qs,
                   collect_cap: int = 500_000, buckets: int = 256, max_iters: int = 12) -> dict:
    """Exact per-key quantiles (np.quantile linear interpolation) for hot
    entities by distributed bucket selection: iteratively histogram each
    (key, q)'s value range (mergeable per-batch partial counts -> grouped
    Sum), locate the bucket(s) holding the two bracketing ranks
    r1 = floor((n-1)q), r2 = ceil((n-1)q), and either narrow the range or
    -- once the candidate bucket is under ``collect_cap`` rows OR its width
    shrinks to float resolution (duplicate-heavy data) -- collect just that
    range as DISTINCT (value, count) partials and interpolate exactly by
    rank. All requested quantiles share each histogram/collect pass (one
    range entry per (key, q)); a hot entity is never materialized. Returns
    {q: {key: value}}."""
    from ray.data.aggregate import Sum

    qs = list(qs)
    state: dict = {}
    for _, r in base.iterrows():
        n = int(r["n"])
        for q in qs:
            if n == 0:
                state[(r[key], q)] = None  # all-null -> NaN
                continue
            pos = (n - 1) * q
            r1 = int(np.floor(pos))
            state[(r[key], q)] = {
                "lo": float(r["min"]),
                "hi": float(r["max"]),
                "n": n,
                "r1": r1,
                "r2": int(np.ceil(pos)),
                "w": float(pos - r1),
                "below": 0,  # count of values < lo across the whole series
                "done": None,
            }
    result = {lbl: np.nan for lbl in state}
    active = {lbl: v for lbl, v in state.items() if v is not None}

    for _ in range(max_iters):
        active = {lbl: v for lbl, v in active.items() if v["done"] is None}
        if not active:
            break
        # degenerate range -> every in-range value equals lo
        for lbl, st in list(active.items()):
            if st["hi"] <= st["lo"]:
                result[lbl] = st["lo"]
                st["done"] = True
        active = {lbl: v for lbl, v in active.items() if v["done"] is None}
        if not active:
            break
        edges = {
            lbl: np.linspace(st["lo"], st["hi"], buckets + 1) for lbl, st in active.items()
        }
        tag_of = {lbl: i for i, lbl in enumerate(active)}  # per-range tag: same
        # (key, bucket) under different q ranges must NOT merge counts

        def hist_partial(t: pa.Table, edges=edges, tag_of=tag_of) -> pa.Table:
            k = t.column(key).to_numpy(zero_copy_only=False)
            x = t.column(value_col).to_numpy(zero_copy_only=False).astype(np.float64)
            frames = []
            for lbl, e in edges.items():
                kk = lbl[0]
                m = (k == kk) & ~np.isnan(x)
                if not m.any():
                    continue
                xv = x[m]
                inr = (xv >= e[0]) & (xv <= e[-1])
                b = np.clip(np.searchsorted(e, xv[inr], side="right") - 1, 0, buckets - 1)
                cnt = np.bincount(b, minlength=buckets)
                nz = np.flatnonzero(cnt)
                frames.append(
                    pd.DataFrame({"__t": tag_of[lbl], "__b": nz, "__c": cnt[nz].astype(np.int64)})
                )
            if not frames:
                return pa.table(
                    {"__t": pa.array([], type=pa.int64()),
                     "__b": pa.array([], type=pa.int64()),
                     "__c": pa.array([], type=pa.int64())}
                )
            return pa.Table.from_pandas(pd.concat(frames, ignore_index=True), preserve_index=False)

        hist = (
            hot_ds.map_batches(hist_partial, batch_format="pyarrow")
            .groupby(["__t", "__b"])
            .aggregate(Sum("__c", alias_name="__c"))
            .to_pandas()  # <= (hot_keys x qs) x buckets rows
        )
        collect_ranges = {}
        for lbl, st in active.items():
            sub = hist[hist["__t"] == tag_of[lbl]].sort_values("__b")
            cnt = np.zeros(buckets, dtype=np.int64)
            cnt[sub["__b"].to_numpy()] = sub["__c"].to_numpy()
            cum = np.concatenate([[0], np.cumsum(cnt)])
            e = edges[lbl]
            # both bracketing ranks, relative to values >= lo (st["below"] are smaller)
            need = [st["r1"] - st["below"], st["r2"] - st["below"]]
            bsel = [int(np.searchsorted(cum, rk, side="right") - 1) for rk in need]
            b_lo, b_hi = min(bsel), max(bsel)
            span = int(cum[b_hi + 1] - cum[b_lo])
            width = float(e[b_hi + 1] - e[b_lo])
            at_resolution = width <= 16 * np.spacing(max(abs(e[b_lo]), abs(e[b_hi + 1]), 1.0))
            # duplicate-heavy data: the candidate span stops shrinking once
            # only (near-)identical values remain -- count-based narrowing
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
                collect_ranges[lbl] = (e[b_lo], e[b_hi + 1], st["below"] + int(cum[b_lo]))
                st["done"] = "collect"
            else:
                # narrow to the single bucket holding both ranks (they are
                # at most adjacent; if they straddle, span is 2 buckets --
                # still narrow, re-histogram the combined range)
                st["below"] += int(cum[b_lo])
                st["lo"], st["hi"] = float(e[b_lo]), float(e[b_hi + 1])

        if collect_ranges:
            from ray.data.aggregate import Sum as _Sum

            ctag = {lbl: i for i, lbl in enumerate(collect_ranges)}

            def grab(t: pa.Table, cr=collect_ranges, ctag=ctag) -> pa.Table:
                k = t.column(key).to_numpy(zero_copy_only=False)
                x = t.column(value_col).to_numpy(zero_copy_only=False).astype(np.float64)
                frames = []
                for lbl, (lo, hi, _) in cr.items():
                    kk = lbl[0]
                    m = (k == kk) & ~np.isnan(x) & (x >= lo) & (x <= hi)
                    if m.any():
                        uv, uc = np.unique(x[m], return_counts=True)
                        frames.append(
                            pd.DataFrame({"__t": ctag[lbl], "__v": uv, "__c": uc.astype(np.int64)})
                        )
                if not frames:
                    return pa.table(
                        {"__t": pa.array([], type=pa.int64()),
                         "__v": pa.array([], type=pa.float64()),
                         "__c": pa.array([], type=pa.int64())}
                    )
                return pa.Table.from_pandas(pd.concat(frames, ignore_index=True), preserve_index=False)

            vals = (
                hot_ds.map_batches(grab, batch_format="pyarrow")
                .groupby(["__t", "__v"])
                .aggregate(_Sum("__c", alias_name="__c"))
                .to_pandas()  # distinct in-range values per (key, q) -- bounded
            )
            for lbl, (lo, hi, below) in collect_ranges.items():
                sub = vals.loc[vals["__t"] == ctag[lbl]].sort_values("__v")
                uv = sub["__v"].to_numpy()
                cum = np.cumsum(sub["__c"].to_numpy())
                st = active[lbl]
                # global ranks r1/r2 -> local ranks after `below` smaller values;
                # a rank r lands on the first distinct value whose cumcount > r
                picks = []
                for rk in (st["r1"] - below, st["r2"] - below):
                    picks.append(uv[int(np.searchsorted(cum, rk, side="right"))])
                # np.quantile linear interpolation between the bracketing ranks
                result[lbl] = float(picks[0] * (1.0 - st["w"]) + picks[1] * st["w"])
    for lbl, st in state.items():
        if st is not None and np.isnan(result.get(lbl, np.nan)) and st.get("done") is None:
            # unresolved after max_iters (pathological): midpoint of the
            # final (float-resolution-narrow) range
            result[lbl] = float((st["lo"] + st["hi"]) / 2.0)
    out: dict = {q: {} for q in qs}
    for (kk, q), v in result.items():
        out[q][kk] = v
    return out


def _hot_median(hot_ds, key: str, value_col: str, base: pd.DataFrame,
                collect_cap: int = 500_000, buckets: int = 256, max_iters: int = 12) -> dict:
    """Exact per-key median — _hot_quantiles at q=0.5 (the (n-1)/2-rank
    linear interpolation equals the even/odd middle-rank average)."""
    return _hot_quantiles(
        hot_ds, key, value_col, base, [0.5],
        collect_cap=collect_cap, buckets=buckets, max_iters=max_iters,
    )[0.5]


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
    unknown = set(features) - set(_TS_FEATURES_FULL)
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

    # coarse-partition kernel: hash-partition ENTITIES so each task
    # computes thousands of them in one pandas pass over contiguous numpy
    # slices — a per-entity map_groups pays ~300 µs of per-group frame
    # plumbing, which dominates at a corpus-scale entity count.
    feat_cols = [f"{value_col}_{f}" for f in features]
    from ballet_ray.functions.partition import default_coarse_parts

    n_parts = default_coarse_parts()

    def add_part(t: pa.Table) -> pa.Table:
        from ballet_ray.functions.partition import stable_hash_array

        h = stable_hash_array(t.column(key).to_numpy(zero_copy_only=False))
        return t.append_column(
            "__part", pa.array((h % np.uint64(n_parts)).astype(np.int64)))

    def per_part(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):
            return pd.DataFrame({key: [], **{c: [] for c in feat_cols}})
        df = df.sort_values([key, *order_by], kind="mergesort")
        ks = df[key].to_numpy()
        xs = df[value_col].to_numpy(dtype=np.float64)
        new = np.concatenate([[True], ks[1:] != ks[:-1]])
        starts = np.flatnonzero(new)
        ends = np.concatenate([starts[1:], [len(ks)]])
        out = {key: ks[starts]}
        vals: dict = {c: [] for c in feat_cols}
        for s, e in zip(starts, ends):
            if skew_threshold is not None and e - s > skew_threshold:
                raise AssertionError(
                    f"extract_ts_features: whole-entity group of {e - s} rows "
                    f"exceeds skew_threshold={skew_threshold} — hot-key split failed"
                )
            x = xs[s:e]
            x = x[~np.isnan(x)]
            for f, v in _per_entity_stats(x, features).items():
                vals[f"{value_col}_{f}"].append(v)
        return pd.DataFrame({**out, **vals})

    base_ds = narrow
    if hot_keys:
        from ballet_ray.stages.joins import semi_join_filter

        base_ds = semi_join_filter(narrow, np.array(hot_keys), key=key, invert=True)
    out = (base_ds.map_batches(add_part, batch_format="pyarrow")
           .groupby("__part").map_groups(per_part, batch_format="pandas"))

    if not hot_keys:
        return out

    # ---- hot entities: bounded-per-task scale passes --------------------
    # NaN-filter first so the order-dependent passes (diff, positions) see
    # the same series the whole-group kernel does after its NaN drop
    from ballet_ray.stages.joins import semi_join_filter

    def drop_nan_values(t: pa.Table) -> pa.Table:
        x = t.column(value_col).to_numpy(zero_copy_only=False).astype(np.float64)
        return t.filter(pa.array(~np.isnan(x)))

    hot_ds = (
        semi_join_filter(narrow, np.array(hot_keys), key=key)
        .map_batches(drop_nan_values, batch_format="pyarrow")
        .materialize()
    )
    feats = set(features)
    base = _hot_base_stats(hot_ds, key, value_col)
    # a hot key whose values are ALL NaN has no rows after the filter —
    # emit its empty-series row (n=0) like the whole-group kernel would
    missing = [k2 for k2 in hot_keys if k2 not in set(base[key])]
    if missing:
        empty = pd.DataFrame({key: missing})
        for c_ in ("sum", "abs_energy"):
            empty[c_] = 0.0
        for c_ in ("mean", "std", "variance", "root_mean_square", "min", "max"):
            empty[c_] = np.nan
        empty["n"] = 0
        base = pd.concat([base, empty], ignore_index=True)
    means = dict(zip(base[key], base["mean"]))

    centered = None
    if feats & {"count_above_mean", "count_below_mean", "ratio_beyond_2sigma",
                "skewness", "kurtosis"}:
        cdf = _hot_centered_stats(hot_ds, key, value_col, means,
                                  dict(zip(base[key], base["std"])))
        centered = cdf.set_index(key)

    ordered = None
    if feats & {"mean_abs_change", "absolute_sum_of_changes", "mean_change", "cid_ce",
                "number_crossings_mean", "linear_trend_slope"}:
        odf = _hot_ordered_stats(hot_ds, key, order_by, value_col, means,
                                 skew_threshold, slice_target)
        ordered = odf.set_index(key)

    want_q = [q for q, f in ((0.25, "quantile_25"), (0.5, "median"), (0.75, "quantile_75"))
              if f in feats]
    quants = _hot_quantiles(hot_ds, key, value_col, base, want_q) if want_q else {}

    rows = []
    for _, r in base.iterrows():
        kk = r[key]
        n = float(r["n"])
        sd = float(r["std"])
        # all-NaN hot keys have no centered/ordered partials: zero them,
        # matching the whole-group kernel on an empty series
        zero_c = pd.Series({"__a": 0, "__b": 0, "__y": 0, "__c3": np.nan, "__c4": np.nan})
        zero_o = pd.Series(
            {"__sad": 0.0, "__sd": 0.0, "__sd2": 0.0, "__nd": 0, "__xc": 0, "__spx": 0.0}
        )
        c = (
            (centered.loc[kk] if kk in centered.index else zero_c)
            if centered is not None
            else None
        )
        o = (
            (ordered.loc[kk] if kk in ordered.index else zero_o)
            if ordered is not None
            else None
        )
        row = {key: kk}
        for f in features:
            name = f"{value_col}_{f}"
            if f in ("sum", "mean", "std", "variance", "root_mean_square",
                     "min", "max", "abs_energy"):
                row[name] = float(r[f])
            elif f == "n":
                row[name] = int(r["n"])
            elif f == "count_above_mean":
                row[name] = int(c["__a"])
            elif f == "count_below_mean":
                row[name] = int(c["__b"])
            elif f == "ratio_beyond_2sigma":
                row[name] = float(c["__y"] / n) if n else np.nan
            elif f == "skewness":
                row[name] = float((c["__c3"] / n) / sd**3) if n and sd > 0 else np.nan
            elif f == "kurtosis":
                row[name] = float((c["__c4"] / n) / sd**4 - 3.0) if n and sd > 0 else np.nan
            elif f == "mean_abs_change":
                row[name] = float(o["__sad"] / o["__nd"]) if o["__nd"] > 0 else np.nan
            elif f == "absolute_sum_of_changes":
                row[name] = float(o["__sad"])
            elif f == "mean_change":
                # telescoping: sum of consecutive diffs = last - first
                row[name] = float(o["__sd"] / o["__nd"]) if o["__nd"] > 0 else np.nan
            elif f == "cid_ce":
                row[name] = float(np.sqrt(o["__sd2"]))
            elif f == "number_crossings_mean":
                row[name] = int(o["__xc"])
            elif f == "linear_trend_slope":
                if n > 1:
                    # sum(pos) and sum(pos^2) are closed-form in n
                    pbar = (n - 1) / 2.0
                    sp2 = n * (n - 1) * (2 * n - 1) / 6.0
                    row[name] = float(
                        (o["__spx"] - pbar * r["sum"]) / (sp2 - n * pbar * pbar)
                    )
                else:
                    row[name] = np.nan
            elif f == "median":
                row[name] = float(quants[0.5].get(kk, np.nan))
            elif f == "quantile_25":
                row[name] = float(quants[0.25].get(kk, np.nan))
            elif f == "quantile_75":
                row[name] = float(quants[0.75].get(kk, np.nan))
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

    from ballet_ray.functions.reduce import grouped_reduce

    # parent keys are high-cardinality → coarse-partition grouped_reduce
    # (Ray's own per-group combine costs ~60 µs per distinct key per task)
    merge_spec = {"__rows": "sum"}
    for c in value_cols:
        merge_spec[f"__n_{c}"] = "sum"
        if need_moments:
            merge_spec[f"__s_{c}"] = "sum"
        if "std" in aggs:
            merge_spec[f"__ss_{c}"] = "sum"
        if "min" in aggs:
            merge_spec[f"__mn_{c}"] = "min"
        if "max" in aggs:
            merge_spec[f"__mx_{c}"] = "max"

    merged = grouped_reduce(
        child.select_columns([child_key] + list(value_cols)).map_batches(
            partial, batch_format="pyarrow"
        ),
        child_key,
        merge_spec,
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
            col = pc.fill_null(col, fill_missing)
            if pa.types.is_floating(col.type):
                # derive() emits float NaN for parents whose children are
                # all-null — NaN is not an Arrow null, so fill it too
                col = pc.if_else(pc.is_nan(col), pa.scalar(float(fill_missing), type=col.type), col)
            t = t.set_column(i, c, col)
        return t

    return joined.map_batches(fill, batch_format="pyarrow")
