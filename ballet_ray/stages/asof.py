"""Point-in-time (as-of) join — the north-rule centerpiece.

Semantics: for each left row (entity ``by``, timestamp ``on``), attach the
right-side value columns from the latest right row of the same entity with
``right.on <= left.on`` (backward direction only — zero temporal leakage;
``allow_exact=False`` makes it strictly ``<``). Reference seed: the
"fit on train only" leakage principle of GroupwiseTransformer
(ballet/eng/base.py:94-103) and SingleLagger's per-entity shift
(ballet/eng/ts.py:13-22); the reference itself has no as-of operator.

Execution (Ray-Data-native):

1. Both sides are tagged and **unioned into one Dataset** with an aligned
   schema, then bucketed by the stable hash of the entity key — ONE
   shuffle co-partitions both sides (no generic join).
2. ``groupby(bucket).map_groups`` merges each bucket with a fully
   vectorized kernel: lexsort (key, ts, side) with right rows sorting
   before left rows on timestamp ties (after, when allow_exact=False),
   then a per-key forward carry of the last-seen right row index — an
   O(n log n) sort + O(n) scan. No per-entity Python.
3. **Skew**: entities whose row count exceeds ``skew_threshold`` (found by
   a keys-only count pre-pass) are *time-sliced* into sub-partitions so no
   single merge task is unbounded. Correctness across slice boundaries is
   restored by injecting, per hot entity and slice, a synthetic "carry"
   right row — the latest real right row strictly before the slice start,
   re-timestamped at the slice start. The hot subset is tiny by
   construction, so carries are computed on the driver and broadcast.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from ballet_ray.functions.partition import BUCKET_COL, stable_hash_array

_SIDE = "__asof_side"  # 0 = right (build), 1 = left (probe), 2 = carry right
# (a carry row stands for a real right row strictly BEFORE its slice start,
# so on timestamp ties it must beat left rows even when allow_exact=False)


def _ts_us(col: pa.ChunkedArray | pa.Array) -> np.ndarray:
    """Timestamp/numeric column → int64 MICROSECONDS (all slice math is µs;
    a raw int64 cast of timestamp[ns] would silently be nanoseconds)."""
    if pa.types.is_timestamp(col.type):
        col = col.cast(pa.timestamp("us"))
    return col.cast(pa.int64()).to_numpy(zero_copy_only=False)


def _merge_bucket(
    table: pa.Table,
    on: str,
    by: str,
    right_cols: list[str],
    left_cols: list[str],
    allow_exact: bool,
    audit: bool = False,
) -> pa.Table:
    """Vectorized in-bucket as-of merge: left rows + matched right values."""
    side = table.column(_SIDE).to_numpy(zero_copy_only=False)
    key = table.column(by).to_numpy(zero_copy_only=False)
    ts = _ts_us(table.column(on))

    # on ts ties: carry rows always first (they stand for data strictly
    # BEFORE the tied timestamp, so both a real right row and — in strict
    # mode — a left row at that ts must beat them); real right rows before
    # left iff exact matches allowed. Carry strictly before real right in
    # BOTH modes: a real right row at the same ts is fresher than the
    # carry's strictly-earlier source, and leaving them tied lets input
    # order decide — a left row later in the slice then matched the stale
    # carry value instead of the tied real right row.
    if allow_exact:
        tie_rank = np.where(side == 1, 2, np.where(side == 0, 1, 0))
    else:
        tie_rank = np.where(side == 2, 0, np.where(side == 1, 1, 2))
    order = np.lexsort((tie_rank, ts, key))
    key_s, side_s = key[order], side[order]

    n = len(order)
    idx = np.arange(n, dtype=np.int64)
    is_right = side_s != 1
    carry = np.maximum.accumulate(np.where(is_right, idx, -1))
    change = np.empty(n, dtype=bool)
    if n:
        change[0] = True
        change[1:] = key_s[1:] != key_s[:-1]
    seg_start = np.maximum.accumulate(np.where(change, idx, 0))
    matched = np.where(carry >= seg_start, carry, -1)

    left_sorted_mask = ~is_right
    left_orig = order[left_sorted_mask]
    m = matched[left_sorted_mask]
    right_orig = np.where(m >= 0, order[np.clip(m, 0, None)], -1)

    out = table.select(left_cols).take(pa.array(left_orig))
    take_idx = pa.array(np.where(right_orig >= 0, right_orig, 0), type=pa.int64())
    valid = pa.array(right_orig >= 0)
    for c in right_cols:
        col = table.column(c).take(take_idx)
        col = pc.if_else(valid, col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col, pa.scalar(None, type=col.type))
        out = out.append_column(c, col)
    if audit:
        # leakage audit: the source timestamp each joined value came from —
        # a verifier can assert matched_source_ts <= the row's own ts
        src_ts = table.column(on).take(take_idx)
        src_ts = pc.if_else(valid, src_ts.combine_chunks() if isinstance(src_ts, pa.ChunkedArray) else src_ts, pa.scalar(None, type=src_ts.type))
        out = out.append_column("matched_source_ts", src_ts)
    return out


def _hot_key_plan(ds, by, on, skew_threshold, slice_target, sample_frac: float = 1.0):
    """Keys-only pre-pass: entities with > skew_threshold rows and their
    per-key time-slice parameters {key: (t0_us, slice_us)}.

    ``sample_frac < 1`` detects hot keys from a row sample (hot keys are by
    definition frequent, so a modest sample finds them reliably) — the scale
    path that keeps the pre-pass shuffle at frac × keys. Counts are scaled
    back up; slice assignment stays consistent for all rows because slices
    clip at 0 below the sampled t0 and extend unbounded above."""
    projected = ds.select_columns([by, on])
    threshold = skew_threshold
    if sample_frac < 1.0:
        # hot keys are by definition frequent, so a modest row sample finds
        # them — but the sample itself is still huge at corpus scale (5% of
        # 10^12 rows), so it is counted by a DISTRIBUTED per-batch partial
        # aggregation: each batch emits one (key, n, tmin, tmax) row per key
        # it contains, the groupby reduces those partials, and ONLY the
        # filtered hot rows (a handful) reach the driver.
        projected = projected.random_sample(sample_frac, seed=1754)
        threshold = max(1, int(skew_threshold * sample_frac))

        def partial(t: pa.Table) -> pa.Table:
            keys = t.column(by).to_numpy(zero_copy_only=False)
            if len(keys) == 0:
                return pa.table({by: keys, "n": np.empty(0, np.int64),
                                 "tmin": np.empty(0, np.int64), "tmax": np.empty(0, np.int64)})
            ts = _ts_us(t.column(on))
            uniq, inv = np.unique(keys, return_inverse=True)
            n = np.bincount(inv, minlength=len(uniq)).astype(np.int64)
            tmin = np.full(len(uniq), np.iinfo(np.int64).max)
            tmax = np.full(len(uniq), np.iinfo(np.int64).min)
            np.minimum.at(tmin, inv, ts)
            np.maximum.at(tmax, inv, ts)
            return pa.table({by: pa.array(uniq), "n": pa.array(n),
                             "tmin": pa.array(tmin), "tmax": pa.array(tmax)})

        from ballet_ray.functions.reduce import grouped_reduce

        # bundle sampled blocks into ~1M-row tasks (random_sample leaves the
        # input's block count with ~frac x rows per block), then reduce the
        # per-key partials with the coarse-partition grouped_reduce — the
        # sample's key cardinality is high, where Ray's per-group combine
        # costs ~60 µs/key/task (12 s for this pre-pass on the 4M-row bench
        # corpus; ~1 s with the vectorized pandas combine)
        stats = grouped_reduce(
            projected.map_batches(partial, batch_format="pyarrow", batch_size=1_000_000),
            by,
            {"n": "sum", "tmin": "min", "tmax": "max"},
            num_parts=32,
        )
        hot_pdf = stats.map_batches(
            lambda t, th=threshold: t.filter(pc.greater(t.column("n"), th)),
            batch_format="pyarrow",
        ).to_pandas()
        plan = {}
        for rec in hot_pdf.to_dict("records"):
            est_n = rec["n"] / sample_frac
            n_slices = max(2, int(np.ceil(est_n / slice_target)))
            slice_us = max(1, (int(rec["tmax"]) - int(rec["tmin"])) // n_slices + 1)
            plan[rec[by]] = (int(rec["tmin"]), slice_us)
        return plan

    from ray.data.aggregate import Count, Max, Min

    stats = projected.groupby(by).aggregate(
        Count(alias_name="n"),
        Min(on, alias_name="tmin"),
        Max(on, alias_name="tmax"),
    )

    def flt(t: pa.Table) -> pa.Table:
        return t.filter(pc.greater(t.column("n"), threshold))

    pdf = stats.map_batches(flt, batch_format="pyarrow").to_pandas()
    plan = {}
    for rec in pdf.to_dict("records"):
        tmin = np.datetime64(rec["tmin"], "us").astype("int64")
        tmax = np.datetime64(rec["tmax"], "us").astype("int64")
        n_slices = max(2, int(np.ceil(rec["n"] / slice_target)))
        slice_us = max(1, int(tmax - tmin) // n_slices + 1)
        plan[rec[by]] = (int(tmin), int(slice_us))
    return plan


def _build_carry_table(right, on, by, right_cols, hot_plan, ts_type) -> pa.Table | None:
    """Latest real right row strictly before each slice start, per hot key,
    re-timestamped at the slice start. Columns: (by, on, *right_cols).

    Distributed reduction: each batch emits at most ONE candidate row per
    (hot key, slice boundary) — the batch's latest row before that
    boundary; a grouped max-ts pass reduces candidates across batches. The
    driver only ever holds the final carries (#hot keys × #slices rows),
    never a hot entity's full right side."""

    def candidates(t: pa.Table) -> pd.DataFrame:
        keys = t.column(by).to_numpy(zero_copy_only=False)
        recs = []
        for k, (t0, slice_us) in hot_plan.items():
            mk = keys == k
            if not mk.any():
                continue
            sub = t.filter(pa.array(mk))
            ts_us = _ts_us(sub.column(on))
            order = np.argsort(ts_us, kind="stable")
            ts_sorted = ts_us[order]
            max_slice = int(np.max((np.maximum(ts_sorted - t0, 0)) // slice_us)) + 2
            starts = t0 + np.arange(1, max_slice + 1, dtype=np.int64) * slice_us
            pos = np.searchsorted(ts_sorted, starts, side="left") - 1
            seen = set()
            for s_i, p in enumerate(pos):
                if p < 0 or p in seen:
                    # p repeats when several boundaries share the same
                    # latest row — keep one candidate per source row; the
                    # final expansion below re-derives every boundary
                    continue
                seen.add(p)
                rec = {by: k, "__cand_ts": int(ts_sorted[p])}
                src = sub.slice(int(order[p]), 1)
                for c in right_cols:
                    rec[c] = src.column(c)[0].as_py()
                recs.append(rec)
        cols = [by, "__cand_ts", *right_cols]
        if not recs:
            return pd.DataFrame({c: [] for c in cols})
        return pd.DataFrame(recs)[cols]

    cands = right.map_batches(candidates, batch_format="pyarrow").to_pandas()
    if not len(cands):
        return None
    rows = []
    for k, (t0, slice_us) in hot_plan.items():
        sub = cands[cands[by] == k].sort_values("__cand_ts")
        if not len(sub):
            continue
        ts_us = sub["__cand_ts"].to_numpy(dtype=np.int64)
        max_slice = int(np.max((np.maximum(ts_us - t0, 0)) // slice_us)) + 2
        starts = t0 + np.arange(1, max_slice + 1, dtype=np.int64) * slice_us
        pos = np.searchsorted(ts_us, starts, side="left") - 1
        for s_i, p in enumerate(pos):
            if p < 0:
                continue
            rec = {by: k, "__ts_us": int(starts[s_i])}
            r = sub.iloc[p]
            for c in right_cols:
                rec[c] = r[c]
            rows.append(rec)
    if not rows:
        return None
    cpdf = pd.DataFrame(rows)
    tbl = pa.Table.from_pandas(cpdf, preserve_index=False)
    # µs ints → timestamp[us] → the left schema's timestamp type
    ts_col = tbl.column("__ts_us").cast(pa.int64()).cast(pa.timestamp("us")).cast(ts_type)
    tbl = tbl.drop_columns(["__ts_us"]).append_column(on, ts_col)
    return tbl.select([by, on] + right_cols)


def asof_join(
    left,
    right,
    *,
    on: str,
    by: str,
    right_cols: list[str],
    allow_exact: bool = True,
    num_buckets: int = 64,
    skew_threshold: int | None = None,
    slice_target: int = 250_000,
    audit: bool = False,
):
    """Backward as-of join of two Datasets. Output = left's columns plus
    ``right_cols`` (null where the entity has no right row at/before ts).
    ``audit=True`` appends ``matched_source_ts`` — the right-side timestamp
    each value came from — so zero temporal leakage is checkable per row.
    (Carry rows are re-timestamped at their slice start, so under the skew
    path the audit column is an upper bound on the true source ts — still
    never after the left row's ts.)"""
    import ray.data as rd

    from ballet_ray.pipeline import dataset_schema

    left_schema = dataset_schema(left)
    right_schema = dataset_schema(right)
    left_cols = list(left_schema.names)
    rtypes = {c: right_schema.field(c).type for c in right_cols}
    ts_type = left_schema.field(on).type

    def tag_left(t: pa.Table) -> pa.Table:
        n = t.num_rows
        for c in right_cols:
            t = t.append_column(c, pa.nulls(n, type=rtypes[c]))
        return t.append_column(_SIDE, pa.array(np.ones(n, dtype=np.int8)))

    def make_tag_right(side_value: int):
        def tag_right(t: pa.Table) -> pa.Table:
            n = t.num_rows
            cols = {}
            for c in left_cols:
                if c == by:
                    cols[c] = t.column(by)
                elif c == on:
                    cols[c] = t.column(on).cast(ts_type)
                else:
                    cols[c] = pa.nulls(n, type=left_schema.field(c).type)
            for c in right_cols:
                cols[c] = t.column(c)
            cols[_SIDE] = pa.array(np.full(n, side_value, dtype=np.int8))
            return pa.table(cols)

        return tag_right

    hot_plan = {}
    if skew_threshold is not None:
        hot_plan = _hot_key_plan(left, by, on, skew_threshold, slice_target)

    both = left.map_batches(tag_left, batch_format="pyarrow").union(
        right.map_batches(make_tag_right(0), batch_format="pyarrow")
    )
    if hot_plan:
        carry = _build_carry_table(right, on, by, right_cols, hot_plan, ts_type)
        if carry is not None:
            both = both.union(
                rd.from_arrow(carry).map_batches(make_tag_right(2), batch_format="pyarrow")
            )

    hot_ids = {k: i for i, k in enumerate(hot_plan)}
    hp = hot_plan

    def add_bucket(t: pa.Table) -> pa.Table:
        keys = t.column(by).to_numpy(zero_copy_only=False)
        h = stable_hash_array(keys)
        b = (h % np.uint64(num_buckets)).astype(np.int64)
        if hp:
            ts_us = _ts_us(t.column(on))
            for k, (t0, slice_us) in hp.items():
                m = keys == k
                if m.any():
                    sl = np.maximum((ts_us[m] - t0) // slice_us, 0)
                    b[m] = num_buckets + hot_ids[k] * 1_000_000 + sl
        return t.append_column(BUCKET_COL, pa.array(b))

    both = both.map_batches(add_bucket, batch_format="pyarrow")

    def per_bucket(t: pa.Table) -> pa.Table:
        t = t.drop_columns([BUCKET_COL])
        return _merge_bucket(t, on, by, right_cols, left_cols, allow_exact, audit=audit)

    return both.groupby(BUCKET_COL).map_groups(per_bucket, batch_format="pyarrow")


def make_backfill_grid(entities, stamps, *, key: str, ts_col: str = "ts"):
    """Distributed entity×timestamp grid: each batch of distinct entities
    cross-joins the (small, broadcast-by-closure) timestamp vector inside
    ``map_batches`` — the entity set never funnels through the driver, so
    the backfill entry point stays scale-clean at corpus-size cardinality."""
    stamps = np.asarray(stamps)

    def cross(t: pa.Table) -> pa.Table:
        if key not in t.column_names:  # schema-less empty block from a shuffle
            return pa.table({key: pa.array([]), ts_col: pa.array(stamps[:0])})
        k = t.column(key).to_numpy(zero_copy_only=False)
        return pa.table(
            {
                key: pa.array(np.repeat(k, len(stamps))),
                ts_col: pa.array(np.tile(stamps, len(k))),
            }
        )

    return entities.map_batches(cross, batch_format="pyarrow")


def backfill(
    grid,
    features,
    *,
    on: str,
    by: str,
    feature_cols: list[str],
    num_buckets: int = 64,
    skew_threshold: int | None = None,
):
    """Materialize the feature vector at every (entity, timestamp) row of
    ``grid`` using only information available at that timestamp — the north
    rule's backfill: an as-of join of the grid against the feature table."""
    return asof_join(
        grid,
        features,
        on=on,
        by=by,
        right_cols=feature_cols,
        allow_exact=True,
        num_buckets=num_buckets,
        skew_threshold=skew_threshold,
    )


# ---------------------------------------------------------------------------
# Windowed join — left rows enriched with right-side aggregates over
# [ts - window, ts) per entity. The feature-store staple the as-of join
# almost gives (asof = "latest value"; window_join = "aggregate of the
# trailing window"). Reference seed: SingleLagger/rolling transforms
# (ballet/eng/ts.py) generalized to a two-table temporal join.
# ---------------------------------------------------------------------------

_WJ_AGGS = ("sum", "mean", "min", "max", "count_nonnull")


def _parse_window_us(window) -> int:
    """Window length → int64 microseconds. Accepts int (µs), numpy
    timedelta64, pandas Timedelta, or a pandas-parseable string ('1h')."""
    if isinstance(window, (int, np.integer)):
        return int(window)
    return int(pd.Timedelta(window).value // 1_000)


def _range_extreme(vals: np.ndarray, lo: np.ndarray, hi: np.ndarray, fn) -> np.ndarray:
    """Vectorized range min/max over half-open index ranges [lo, hi) via a
    sparse table (binary lifting): O(m log m) precompute, O(1) per query.
    ``vals`` is float64 with NaN for nulls; ``fn`` is np.fmin / np.fmax
    (NaN-ignoring). Empty ranges yield NaN."""
    out = np.full(len(lo), np.nan)
    m = len(vals)
    if m == 0:
        return out
    levels = [vals]
    j = 1
    while (1 << j) <= m:
        step = 1 << (j - 1)
        prev = levels[-1]
        levels.append(fn(prev[:-step], prev[step:]))
        j += 1
    length = hi - lo
    nz = np.flatnonzero(length > 0)
    if len(nz) == 0:
        return out
    ln = length[nz]
    # floor(log2) via bit shifts is exact; np.log2 floats are exact for
    # powers of two but belt-and-braces here
    js = (np.floor(np.log2(ln))).astype(np.int64)
    res = np.empty(len(nz))
    for jv in np.unique(js):
        sel = js == jv
        L = levels[int(jv)]
        step = 1 << int(jv)
        res[sel] = fn(L[lo[nz][sel]], L[hi[nz][sel] - step])
    out[nz] = res
    return out


def _wj_empty_output(table: pa.Table, left_cols, value_cols, aggs, count_name, vtypes) -> pa.Table:
    cols = {c: table.column(c).slice(0, 0) for c in left_cols}
    if count_name:
        cols[count_name] = pa.array([], type=pa.int64())
    for c in value_cols:
        src_t = vtypes[c]
        for a in aggs[c]:
            out_t = pa.int64() if a == "count_nonnull" else (
                src_t if a in ("min", "max") else pa.float64())
            cols[f"{c}_{a}"] = pa.array([], type=out_t)
    return pa.table(cols)


def _window_merge_bucket(
    table: pa.Table,
    on: str,
    by: str,
    window_us: int,
    aggs: dict[str, tuple],
    left_cols: list[str],
    count_name: str | None,
    vtypes: dict,
) -> pa.Table:
    """Vectorized in-bucket windowed merge.

    One lexsort over (key, ts, rank) of events + 2 query points per left
    row (at ts and ts-window, both strict-<), then per-key exclusive
    running count/sums read off at the query positions — O(n log n) sort +
    O(n) scans, no per-entity Python. Min/max use the global event index
    bounds the same scan yields, answered by a sparse table."""
    value_cols = list(aggs.keys())
    side = table.column(_SIDE).to_numpy(zero_copy_only=False)
    left_mask = side == 1
    nL = int(left_mask.sum())
    if nL == 0:
        return _wj_empty_output(table, left_cols, value_cols, aggs, count_name, vtypes)
    key = table.column(by).to_numpy(zero_copy_only=False)
    ts = _ts_us(table.column(on))
    evt_mask = ~left_mask
    nE = int(evt_mask.sum())
    left_idx = np.flatnonzero(left_mask)
    lts, lk = ts[left_mask], key[left_mask]

    sk = np.concatenate([key[evt_mask], lk, lk])
    sts = np.concatenate([ts[evt_mask], lts, lts - window_us])
    rank = np.concatenate(
        [np.ones(nE, dtype=np.int8), np.zeros(2 * nL, dtype=np.int8)]
    )
    order = np.lexsort((rank, sts, sk))
    n = len(order)
    is_e = rank[order] == 1
    sk_s = sk[order]
    change = np.empty(n, dtype=bool)
    change[0] = True
    change[1:] = sk_s[1:] != sk_s[:-1]
    seg_id = np.cumsum(change) - 1
    seg_first = np.flatnonzero(change)

    def keyed_exclusive(x_sorted: np.ndarray) -> np.ndarray:
        """Per-key exclusive running sum of x (in sorted order), scattered
        back to pre-sort positions."""
        cum = np.cumsum(x_sorted)
        excl = cum - x_sorted
        base = excl[seg_first][seg_id]
        keyed = excl - base
        out = np.empty(n, dtype=keyed.dtype)
        out[order] = keyed
        return out

    ones = is_e.astype(np.int64)
    cnt_pre = keyed_exclusive(ones)
    hi_cnt = cnt_pre[nE : nE + nL]
    lo_cnt = cnt_pre[nE + nL :]
    w_count = hi_cnt - lo_cnt

    # global exclusive event count → index into the (key, ts)-sorted event
    # array; ranges stay inside each key's segment because both bounds
    # include the identical prefix of earlier keys' events
    gexcl = np.cumsum(ones) - ones
    gout = np.empty(n, dtype=np.int64)
    gout[order] = gexcl
    ghi = gout[nE : nE + nL]
    glo = gout[nE + nL :]

    evt_scan_pos = order[is_e]  # scan indices (< nE) of events, (key,ts)-sorted

    out = table.select(left_cols).take(pa.array(left_idx))
    if count_name:
        out = out.append_column(count_name, pa.array(w_count))

    need_sorted_vals = {}
    for c in value_cols:
        wanted = aggs[c]
        col = table.column(c)
        fvals = col.cast(pa.float64()).to_numpy(zero_copy_only=False)[evt_mask]
        nonnull = ~np.isnan(fvals)
        cnt_nn = None
        if {"mean", "count_nonnull"} & set(wanted):
            x = np.zeros(n)
            x[:nE] = nonnull.astype(np.float64)
            k = keyed_exclusive(x[order])
            cnt_nn = (k[nE : nE + nL] - k[nE + nL :]).astype(np.int64)
        if {"sum", "mean"} & set(wanted):
            x = np.zeros(n)
            x[:nE] = np.where(nonnull, fvals, 0.0)
            k = keyed_exclusive(x[order])
            sums = k[nE : nE + nL] - k[nE + nL :]
        if {"min", "max"} & set(wanted):
            need_sorted_vals[c] = fvals[evt_scan_pos]
        src_t = vtypes[c]
        for a in wanted:
            if a == "count_nonnull":
                out = out.append_column(f"{c}_{a}", pa.array(cnt_nn))
                continue
            if a == "sum":
                vals, valid = sums, (cnt_nn if cnt_nn is not None else w_count) > 0
                # SQL SUM over an empty/all-null window is NULL
                if cnt_nn is None:
                    x = np.zeros(n)
                    x[:nE] = nonnull.astype(np.float64)
                    k = keyed_exclusive(x[order])
                    valid = (k[nE : nE + nL] - k[nE + nL :]) > 0
                arr = pa.array(vals, type=pa.float64())
            elif a == "mean":
                valid = cnt_nn > 0
                vals = np.divide(sums, cnt_nn, out=np.zeros(nL), where=valid)
                arr = pa.array(vals, type=pa.float64())
            else:  # min / max
                fn = np.fmin if a == "min" else np.fmax
                vals = _range_extreme(need_sorted_vals[c], glo, ghi, fn)
                valid = ~np.isnan(vals)
                safe = np.where(valid, vals, 0.0)
                arr = pa.array(safe).cast(src_t)
            arr = pc.if_else(pa.array(np.asarray(valid, dtype=bool)), arr,
                             pa.scalar(None, type=arr.type))
            out = out.append_column(f"{c}_{a}", arr)
    return out


def window_join(
    left,
    right,
    *,
    on: str,
    by: str,
    window,
    aggs: dict[str, tuple] | dict[str, list],
    count_name: str | None = "w_count",
    num_buckets: int = 64,
    skew_threshold: int | None = None,
    slice_target: int = 250_000,
):
    """For each left row (entity ``by``, timestamp ``on``), attach
    aggregates of the right rows of the same entity with timestamp in
    ``[left.on - window, left.on)`` — half-open, strictly before the left
    row, so zero temporal leakage by construction.

    ``aggs`` maps right value column → aggregates from
    {sum, mean, min, max, count_nonnull}; output columns are named
    ``{col}_{agg}`` (SQL semantics: NULL over an empty/all-null window).
    ``count_name`` adds a COUNT(*)-of-window column (0 when empty).

    Execution: same ONE-shuffle co-partitioning as :func:`asof_join` —
    both sides tagged and unioned, bucketed by entity hash,
    ``groupby(bucket).map_groups`` with the vectorized scan kernel. Hot
    entities (``skew_threshold``) are time-sliced; each right row is
    replicated into at most ceil(window/slice)+1 ≤ 2 slices (slice length
    is clamped to ≥ window), so correctness needs no driver-side carry —
    the only duplication is the hot keys' right rows, bounded 2×.
    Partitioning assumption: a single entity's window contents fit one
    task (guaranteed by the time slicing when ``skew_threshold`` is set).
    """
    import ray.data as rd  # noqa: F401

    from ballet_ray.pipeline import dataset_schema

    window_us = _parse_window_us(window)
    aggs = {c: tuple(a) for c, a in aggs.items()}
    for c, al in aggs.items():
        bad = set(al) - set(_WJ_AGGS)
        if bad:
            raise ValueError(f"unknown window aggs {bad} for column {c!r}")
    value_cols = list(aggs.keys())

    left_schema = dataset_schema(left)
    right_schema = dataset_schema(right)
    left_cols = list(left_schema.names)
    # pandas-origin blocks that happen to be all-NaN infer as Arrow `null`
    # (seen from repartition on from_pandas datasets) — treat as float64
    vtypes = {
        c: (pa.float64() if pa.types.is_null(right_schema.field(c).type)
            else right_schema.field(c).type)
        for c in value_cols
    }
    ts_type = left_schema.field(on).type

    def tag_left(t: pa.Table) -> pa.Table:
        nr = t.num_rows
        for c in value_cols:
            t = t.append_column(c, pa.nulls(nr, type=vtypes[c]))
        return t.append_column(_SIDE, pa.array(np.ones(nr, dtype=np.int8)))

    def tag_right(t: pa.Table) -> pa.Table:
        nr = t.num_rows
        cols = {}
        for c in left_cols:
            if c == by:
                cols[c] = t.column(by)
            elif c == on:
                cols[c] = t.column(on).cast(ts_type)
            else:
                cols[c] = pa.nulls(nr, type=left_schema.field(c).type)
        for c in value_cols:
            cols[c] = t.column(c).cast(vtypes[c])
        cols[_SIDE] = pa.array(np.zeros(nr, dtype=np.int8))
        return pa.table(cols)

    hot_plan = {}
    if skew_threshold is not None:
        hot_plan = _hot_key_plan(left, by, on, skew_threshold, slice_target)
        # clamp slice length to >= window so each right row lands in <= 2
        # slices (its own and the next)
        hot_plan = {k: (t0, max(s, window_us)) for k, (t0, s) in hot_plan.items()}

    both = left.map_batches(tag_left, batch_format="pyarrow").union(
        right.map_batches(tag_right, batch_format="pyarrow")
    )

    hot_ids = {k: i for i, k in enumerate(hot_plan)}
    hp = hot_plan
    w_us = window_us

    def add_bucket(t: pa.Table) -> pa.Table:
        keys = t.column(by).to_numpy(zero_copy_only=False)
        h = stable_hash_array(keys)
        b = (h % np.uint64(num_buckets)).astype(np.int64)
        if not hp:
            return t.append_column(BUCKET_COL, pa.array(b))
        ts_us = _ts_us(t.column(on))
        side = t.column(_SIDE).to_numpy(zero_copy_only=False)
        dup_idx: list[np.ndarray] = []
        dup_buckets: list[np.ndarray] = []
        for k, (t0, slice_us) in hp.items():
            m = keys == k
            if not m.any():
                continue
            sl = np.maximum((ts_us[m] - t0) // slice_us, 0)
            b[m] = num_buckets + hot_ids[k] * 1_000_000 + sl
            # right rows additionally serve the NEXT slice when a left
            # window there can reach back to them
            mr = m & (side != 1)
            if mr.any():
                sl_r = np.maximum((ts_us[mr] - t0) // slice_us, 0)
                sl_fwd = np.maximum((ts_us[mr] + w_us - t0) // slice_us, 0)
                need = sl_fwd != sl_r
                if need.any():
                    idx = np.flatnonzero(mr)[need]
                    dup_idx.append(idx)
                    dup_buckets.append(
                        num_buckets + hot_ids[k] * 1_000_000 + sl_fwd[need]
                    )
        out = t.append_column(BUCKET_COL, pa.array(b))
        if dup_idx:
            di = np.concatenate(dup_idx)
            dup = t.take(pa.array(di)).append_column(
                BUCKET_COL, pa.array(np.concatenate(dup_buckets))
            )
            out = pa.concat_tables([out, dup])
        return out

    both = both.map_batches(add_bucket, batch_format="pyarrow")

    def per_bucket(t: pa.Table) -> pa.Table:
        t = t.drop_columns([BUCKET_COL])
        return _window_merge_bucket(
            t, on, by, window_us, aggs, left_cols, count_name, vtypes
        )

    return both.groupby(BUCKET_COL).map_groups(per_bucket, batch_format="pyarrow")


def asof_join_multi(
    left,
    right,
    *,
    on: str,
    by: str,
    right_cols: list[str],
    horizons: list,
    id_col: str,
    allow_exact: bool = True,
    num_buckets: int = 64,
    skew_threshold: int | None = None,
    slice_target: int = 250_000,
    num_partitions: int | None = None,
):
    """Multi-horizon point-in-time join — the feature-store snapshot query:
    for every left row, the latest right-side values as of ``ts − h`` for
    EACH horizon ``h`` ("value now, a day ago, a week ago"). Zero temporal
    leakage at every horizon by construction (each is a backward as-of).

    Shape: per horizon, ONE skew-safe :func:`asof_join` over the NARROW
    left projection (id, entity, shifted ts) — the left payload never
    multiplies by ``len(horizons)``; the per-horizon results (id + renamed
    feature columns) then chain through hash joins on ``id_col``. Output =
    ``(id_col, {col}_{horizon}…)``, one row per left row; join it back to
    the full left table by id if the payload is needed.

    ``horizons`` entries are pandas-parseable strings ('1h', '7d'), ints
    (µs), or 0 for "as of now". ``id_col`` must be unique per left row.
    """
    from ballet_ray.pipeline import dataset_schema
    from ballet_ray.stages.joins import default_join_partitions, hash_join

    ts_type = dataset_schema(left).field(on).type

    def label_of(h) -> str:
        return str(h).replace(" ", "")

    def shift_fn(h_us: int):
        if h_us == 0:
            return None

        def shift(t: pa.Table) -> pa.Table:
            col = t.column(on)
            if isinstance(col, pa.ChunkedArray):
                col = col.combine_chunks()
            if pa.types.is_timestamp(col.type):
                unit = col.type.unit
                mult = {"s": 1 / 1_000_000, "ms": 1 / 1_000, "us": 1, "ns": 1_000}[unit]
                shifted = pc.subtract(col.cast(pa.int64()), int(h_us * mult)).cast(col.type)
            else:
                shifted = pc.subtract(col, h_us)
            return t.set_column(t.schema.get_field_index(on), on, shifted)

        return shift

    base = left.select_columns([id_col, by, on])
    out = None
    for h in horizons:
        h_us = _parse_window_us(h)
        lab = label_of(h)
        shifted = base
        fn = shift_fn(h_us)
        if fn is not None:
            shifted = shifted.map_batches(fn, batch_format="pyarrow")
        joined = asof_join(
            shifted, right, on=on, by=by, right_cols=right_cols,
            allow_exact=allow_exact, num_buckets=num_buckets,
            skew_threshold=skew_threshold, slice_target=slice_target,
        )
        renames = {c: f"{c}_{lab}" for c in right_cols}
        part = joined.select_columns([id_col] + right_cols).map_batches(
            lambda t, _r=renames: t.rename_columns(
                [_r.get(c, c) for c in t.schema.names]
            ),
            batch_format="pyarrow",
        )
        out = part if out is None else hash_join(
            out, part, on=id_col,
            num_partitions=default_join_partitions(num_partitions),
        )
    if out is None:
        raise ValueError("horizons must be non-empty")
    return out


def interval_join(
    left, intervals, *, on: str, by: str, start_col: str = "start_ts",
    end_col: str = "end_ts", value_cols: list[str], closed: str = "left",
    **asof_kwargs,
):
    """Point-in-interval (validity-period) join: attach ``value_cols`` of
    the interval ``[start, end)`` containing each left row's timestamp for
    the same entity — price lists, campaign windows, session attributes,
    slowly-changing dimensions.

    Matching rule: the interval with the LATEST ``start_col`` <= ts wins
    (a backward as-of join on the interval starts — reuses the skew-safe
    co-partition machinery of :func:`asof_join` including hot-entity time
    slicing), then values are masked null where that interval's end bound
    excludes ts. Exact for non-overlapping intervals per entity (the
    slowly-changing-dimension contract); with overlapping intervals only
    the latest-starting candidate is considered (documented trade — a full
    overlap join is a different, quadratic-in-overlap operator).

    ``closed='left'`` matches ``start <= ts < end`` (default);
    ``'both'`` matches ``start <= ts <= end``. Left rows with no
    containing interval keep null values. Scale shape = asof_join's: one
    co-partition union shuffle, vectorized per-bucket merge, interval
    payload never fans out.
    """
    import pyarrow.compute as pc

    from ballet_ray.pipeline import dataset_schema

    if closed not in ("left", "both"):
        raise ValueError("closed must be 'left' or 'both'")
    END = "__ivl_end"
    value_cols = list(value_cols)
    left_names = set(dataset_schema(left).names)
    if END in left_names:
        raise ValueError(f"left side may not contain a column named {END}")
    ts_type = dataset_schema(left).field(on).type

    def prep(t: pa.Table) -> pa.Table:
        cols = {}
        for c in t.column_names:
            if c in (start_col, end_col) or c == on:
                continue
            cols[c] = t.column(c)
        cols[on] = t.column(start_col).cast(ts_type)
        cols[END] = t.column(end_col).cast(ts_type)
        return pa.table(cols)

    right = intervals.map_batches(prep, batch_format="pyarrow")
    joined = asof_join(left, right, on=on, by=by,
                       right_cols=value_cols + [END], **asof_kwargs)

    def mask(t: pa.Table) -> pa.Table:
        ts = t.column(on).cast(ts_type)
        end = t.column(END).cast(ts_type)
        cmp = pc.less(ts, end) if closed == "left" else pc.less_equal(ts, end)
        ok = pc.fill_null(pc.and_kleene(pc.is_valid(end), cmp), False)
        cols = {}
        for c in t.column_names:
            if c == END:
                continue
            if c in value_cols:
                col = t.column(c)
                cols[c] = pc.if_else(ok, col, pa.nulls(len(t), type=col.type))
            else:
                cols[c] = t.column(c)
        return pa.table(cols)

    return joined.map_batches(mask, batch_format="pyarrow")
