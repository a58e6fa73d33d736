"""Distributed fit pass: batched aggregate requests → small fitted states.

The reference fits each transformer eagerly on an in-memory frame
(ballet/pipeline.py:39-42 via DataFrameMapper). At 100 TB a fit pass is a
full scan, so transforms declare *aggregate requests* and the planner runs
ONE ``Dataset.aggregate`` for all global statistics of all features
(mean/std/min/max/absmax/quantiles in a single streaming pass), plus one
small ``groupby`` per distinct category/group column. Results are bound
back into each transform as plain-python fitted state (small, picklable,
closed over by the transform stage — broadcast once per worker by Ray).

Request kinds
-------------
("moments", col)              → {count, sum, mean, std0, std1, min, max}
("moments3", col)             → adds {m2, m3} central-ish sums for skewness
("absmax", col)               → {absmax}
("quantile", col, (q...))     → tuple of quantile values
("cats", col)                 → {value: count} (driver-side dict; assumed small)
("grouped_moments", col, by)  → {group: {count, mean, std0, min, max}}

Cardinality auto-gate
---------------------
The two category-keyed kinds build a DRIVER-side map whose size is the
column's cardinality — fine for real categorical columns, a memory bomb
for an id-like column fed to a category encoder by mistake. Before
servicing them the planner probes every distinct category column's
cardinality with ONE shared KMV-sketch pass (±3%, the shuffle carries one
≤1k-value sketch per block); columns estimated above
``MAX_DRIVER_CATEGORIES`` (default 1M, env
``BALLET_RAY_MAX_DRIVER_CATEGORIES``) switch to a HASHED fit — category
statistics aggregate into a fixed ``HASHED_SPACE``-bucket array (8 MB,
independent of cardinality) and the transform looks rows up by hash — and
a loud warning names the column. Hashed-mode semantics are those of a
HashingEncoder: rare-tail collisions blend statistics, unknown categories
are indistinguishable from collisions, nulls map to the encoder's unknown
value. Encoders that support the fallback: Ordinal/Count/Target; others
keep the documented small-cardinality assumption (HashingEncoder is the
manual escape hatch).
"""

from __future__ import annotations

import math
import os
import warnings

import numpy as np

from ray.data.aggregate import AbsMax, Count, Max, Mean, Min, Quantile, Std, Sum

MAX_DRIVER_CATEGORIES = int(os.environ.get("BALLET_RAY_MAX_DRIVER_CATEGORIES", 1_000_000))
HASHED_SPACE = 1 << 20


def _bucket_idx(vals: np.ndarray, space: int) -> np.ndarray:
    """hash % space, tolerating nulls in object columns (null rows get a
    garbage bucket; every caller overwrites them afterwards)."""
    import pandas as pd

    from ballet_ray.functions.partition import stable_hash_array

    if vals.dtype == object:
        mask = pd.isna(vals)
        if mask.any():
            vals = vals.copy()
            vals[mask] = ""
    return (stable_hash_array(vals) % np.uint64(space)).astype(np.int64)


class HashedCategoryCounts:
    """Fixed-size hashed-bucket category counts — the auto-gate fallback
    for ``("cats", col)`` above MAX_DRIVER_CATEGORIES. ``counts[b]`` sums
    the train counts of every category hashing to bucket ``b``."""

    def __init__(self, space: int, counts: np.ndarray):
        self.space = space
        self.counts = counts  # int64[space]

    def lookup(self, vals: np.ndarray) -> np.ndarray:
        return self.counts[_bucket_idx(vals, self.space)]

    def codes(self, vals: np.ndarray) -> np.ndarray:
        """HashingEncoder-style codes: hash % space (no rank order)."""
        return _bucket_idx(vals, self.space)


class HashedGroupedStats:
    """Fixed-size hashed-bucket (sum, count) of a target per category —
    the auto-gate fallback for ``("grouped_moments", target, by)``."""

    def __init__(self, space: int, sums: np.ndarray, counts: np.ndarray):
        self.space = space
        self.sums = sums      # float64[space]
        self.counts = counts  # int64[space]

    def lookup_mean(self, vals: np.ndarray, default: float) -> np.ndarray:
        idx = _bucket_idx(vals, self.space)
        n = self.counts[idx]
        with np.errstate(invalid="ignore", divide="ignore"):
            m = self.sums[idx] / n
        return np.where(n > 0, m, default)


def _alias(kind: str, col: str, extra: str = "") -> str:
    return f"__fit::{kind}::{col}::{extra}"


def _np_partial_fn(block, fn):
    import pyarrow as pa

    t = block if isinstance(block, pa.Table) else pa.Table.from_pandas(
        block, preserve_index=False
    )
    return fn(t)


_np_partial = None
_pair_sum = None


def _remotes():
    """Lazy ray.remote wrappers (module import must not touch Ray)."""
    global _np_partial, _pair_sum
    if _np_partial is None:
        import ray

        _np_partial = ray.remote(num_cpus=1)(_np_partial_fn)
        _pair_sum = ray.remote(num_cpus=0)(lambda a, b: a + b)
    return _np_partial, _pair_sum


def _tree_sum(refs):
    """Pairwise tree-reduce of numpy-array object refs: the driver receives
    ONE array, never the per-block stream."""
    import ray

    _, pair = _remotes()
    while len(refs) > 1:
        refs = [
            pair.remote(refs[i], refs[i + 1]) if i + 1 < len(refs) else refs[i]
            for i in range(0, len(refs), 2)
        ]
    return ray.get(refs[0])


class FitPlanner:
    """Collects agg requests from many transforms, runs the minimal number
    of Dataset passes, and binds results back."""

    def __init__(self) -> None:
        self._entries: list[tuple[object, list[str]]] = []

    def add(self, transform, cols: list[str]) -> None:
        self._entries.append((transform, cols))

    def run(self, ds) -> dict:
        requests: dict[tuple, tuple] = {}
        for t, cols in self._entries:
            for req in t.agg_requests(cols):
                requests[req] = req
        if not requests:
            results: dict[tuple, object] = {}
        else:
            results = self._execute(ds, list(requests))
        for t, cols in self._entries:
            t.bind_fit_results(cols, results)
        return results

    # ------------------------------------------------------------------
    def _execute(self, ds, requests: list[tuple]) -> dict:
        results: dict[tuple, object] = {}
        global_aggs = []
        moment3_cols: list[str] = []

        for req in requests:
            kind, col = req[0], req[1]
            if kind in ("moments", "moments3"):
                global_aggs += [
                    Count(col, ignore_nulls=True, alias_name=_alias("count", col)),
                    Sum(col, alias_name=_alias("sum", col)),
                    Mean(col, alias_name=_alias("mean", col)),
                    Std(col, ddof=0, alias_name=_alias("std0", col)),
                    Std(col, ddof=1, alias_name=_alias("std1", col)),
                    Min(col, alias_name=_alias("min", col)),
                    Max(col, alias_name=_alias("max", col)),
                ]
                if kind == "moments3":
                    moment3_cols.append(col)
            elif kind == "absmax":
                global_aggs.append(AbsMax(col, alias_name=_alias("absmax", col)))
            elif kind == "quantile":
                for q in req[2]:
                    global_aggs.append(Quantile(col, q=q, alias_name=_alias("q", col, str(q))))

        row = ds.aggregate(*global_aggs) if global_aggs else {}

        # cardinality auto-gate: one shared KMV pass over every distinct
        # category column of the O(cardinality) request kinds
        cat_cols = sorted(
            {r[1] for r in requests if r[0] == "cats"}
            | {r[2] for r in requests if r[0] == "grouped_moments"}
        )
        card = self._probe_cardinalities(ds, cat_cols) if cat_cols else {}

        for req in requests:
            kind, col = req[0], req[1]
            if kind in ("moments", "moments3"):
                res = {
                    k: row.get(_alias(k, col))
                    for k in ("count", "sum", "mean", "std0", "std1", "min", "max")
                }
                if kind == "moments3":
                    res.update(self._central_moments(ds, col, res["mean"]))
                results[req] = res
            elif kind == "absmax":
                results[req] = {"absmax": row.get(_alias("absmax", col))}
            elif kind == "quantile":
                results[req] = tuple(row.get(_alias("q", col, str(q))) for q in req[2])
            elif kind == "cats":
                if card.get(col, 0) > MAX_DRIVER_CATEGORIES:
                    self._warn_gate(col, card[col])
                    results[req] = self._hashed_category_counts(ds, col)
                else:
                    results[req] = self._category_counts(ds, col)
            elif kind == "grouped_moments":
                if card.get(req[2], 0) > MAX_DRIVER_CATEGORIES:
                    self._warn_gate(req[2], card[req[2]])
                    results[req] = self._hashed_grouped_stats(ds, col, req[2])
                else:
                    results[req] = self._grouped_moments(ds, col, req[2])
            elif kind == "yj_grid":
                results[req] = self._yj_grid(ds, col, req[2])
            else:
                raise ValueError(f"unknown fit request kind: {kind}")
        return results

    @staticmethod
    def _warn_gate(col: str, est: float) -> None:
        warnings.warn(
            f"category column {col!r} has ~{est:.0f} distinct values "
            f"(> MAX_DRIVER_CATEGORIES={MAX_DRIVER_CATEGORIES}); switching "
            f"this encoder's fit to the fixed-size HASHED path "
            f"(HashingEncoder semantics: {HASHED_SPACE} buckets, rare-tail "
            f"collisions blend statistics, unknowns are indistinguishable). "
            f"Raise BALLET_RAY_MAX_DRIVER_CATEGORIES to force the exact "
            f"driver-map fit.",
            stacklevel=3,
        )

    @staticmethod
    def _probe_cardinalities(ds, cols: list[str], k: int = 1024) -> dict:
        """Approximate distinct count of every column in ONE narrow pass:
        per-block KMV partials per column, per-block combine, one grouped
        merge — the driver receives one ≤k-value sketch per column."""
        import pyarrow as pa

        from ballet_ray.stages.sketches import _kmv_estimate, _kmv_sketch

        def partial(t: pa.Table) -> pa.Table:
            data = {"g": pa.array([0], type=pa.int8())}
            for c in cols:
                vals = t.column(c).to_numpy(zero_copy_only=False)
                data[c] = pa.array([_kmv_sketch(vals, k).astype(np.uint64).tobytes()])
            return pa.table(data)

        def merge_col(blobs) -> bytes:
            merged = np.array([], dtype=np.uint64)
            for blob in blobs:
                sk = np.frombuffer(blob, dtype=np.uint64)
                merged = np.unique(np.concatenate([merged, sk]))[:k]
            return merged.tobytes()

        def combine(t: pa.Table) -> pa.Table:
            data = {"g": pa.array([0], type=pa.int8())}
            for c in cols:
                data[c] = pa.array([merge_col(t.column(c).to_pylist())])
            return pa.table(data)

        import pandas as pd

        def final(g: pd.DataFrame) -> pd.DataFrame:
            return pd.DataFrame({c: [merge_col(g[c])] for c in cols})

        parts = ds.select_columns(cols).map_batches(partial, batch_format="pyarrow")
        combined = parts.map_batches(combine, batch_format="pyarrow")
        out = combined.groupby("g").map_groups(final, batch_format="pandas").take(1)
        return {
            c: _kmv_estimate(np.frombuffer(out[0][c], dtype=np.uint64), k)
            for c in cols
        }

    @staticmethod
    def _hashed_category_counts(ds, col: str) -> "HashedCategoryCounts":
        """Bucket-array category counts: per-block bincount partials over
        hash % HASHED_SPACE, summed by a tree of pairwise array adds — the
        driver receives ONE 8 MB array regardless of cardinality."""
        import pyarrow as pa

        import ray

        from ballet_ray.functions.partition import stable_hash_array

        space = HASHED_SPACE

        def partial(t: pa.Table):
            vals = t.column(col).to_numpy(zero_copy_only=False)
            import pandas as pd

            mask = ~pd.isna(vals)
            idx = (stable_hash_array(vals[mask]) % np.uint64(space)).astype(np.int64)
            return np.bincount(idx, minlength=space).astype(np.int64)

        np_partial, _ = _remotes()
        refs = [
            np_partial.remote(b, partial)
            for b in ds.select_columns([col]).materialize().get_internal_block_refs()
        ]
        counts = _tree_sum(refs)
        return HashedCategoryCounts(space, counts)

    @staticmethod
    def _hashed_grouped_stats(ds, col: str, by: str) -> "HashedGroupedStats":
        """Bucket-array (sum, count) of ``col`` per hashed ``by`` bucket."""
        import pyarrow as pa

        from ballet_ray.functions.partition import stable_hash_array

        space = HASHED_SPACE

        def partial(t: pa.Table):
            import pandas as pd

            g = t.column(by).to_numpy(zero_copy_only=False)
            x = t.column(col).to_numpy(zero_copy_only=False).astype(np.float64)
            mask = (~pd.isna(g)) & ~np.isnan(x)
            idx = (stable_hash_array(g[mask]) % np.uint64(space)).astype(np.int64)
            sums = np.bincount(idx, weights=x[mask], minlength=space)
            cnts = np.bincount(idx, minlength=space).astype(np.int64)
            return np.concatenate([sums, cnts.astype(np.float64)])

        np_partial, _ = _remotes()
        refs = [
            np_partial.remote(b, partial)
            for b in ds.select_columns([by, col]).materialize().get_internal_block_refs()
        ]
        both = _tree_sum(refs)
        return HashedGroupedStats(
            space, both[:space], both[space:].astype(np.int64)
        )

    @staticmethod
    def _yj_grid(ds, col: str, lambdas: tuple) -> dict:
        """One narrow pass computing, for EVERY λ in the grid at once, the
        sufficient statistics of the Yeo-Johnson log-likelihood:
        n, Σyj(x,λ), Σyj(x,λ)² per λ, plus Σ sign(x)·log1p(|x|) (the
        Jacobian term, λ-independent). Distributed λ selection without
        per-λ data passes."""
        import pyarrow as pa

        from ray.data.aggregate import Sum as _Sum

        lam = np.asarray(lambdas, dtype=np.float64)

        def partial(t: pa.Table) -> pa.Table:
            x = t.column(col).to_numpy(zero_copy_only=False).astype(np.float64)
            x = x[~np.isnan(x)]
            y = yeo_johnson(x[:, None], lam[None, :])  # (n, L)
            data = {"n": [float(len(x))], "slog": [float(np.sum(np.sign(x) * np.log1p(np.abs(x))))]}
            s = y.sum(axis=0)
            ss = (y * y).sum(axis=0)
            for j in range(len(lam)):
                data[f"s{j}"] = [float(s[j])]
                data[f"ss{j}"] = [float(ss[j])]
            return pa.table(data)

        parts = ds.select_columns([col]).map_batches(partial, batch_format="pyarrow")
        aggs = [_Sum("n", alias_name="n"), _Sum("slog", alias_name="slog")]
        for j in range(len(lam)):
            aggs += [_Sum(f"s{j}", alias_name=f"s{j}"), _Sum(f"ss{j}", alias_name=f"ss{j}")]
        row = parts.aggregate(*aggs)
        return {
            "lambdas": lam,
            "n": row["n"],
            "slog": row["slog"],
            "sum": np.array([row[f"s{j}"] for j in range(len(lam))]),
            "sumsq": np.array([row[f"ss{j}"] for j in range(len(lam))]),
        }

    @staticmethod
    def _central_moments(ds, col: str, mean: float) -> dict:
        """Sum of (x-mean)^2 and (x-mean)^3 — one extra narrow pass, used for
        the skewness condition of the BoxCox transform (reference computes
        scipy.stats.skew at fit, ballet/eng/misc.py:49-50)."""

        def partial(t):
            import pyarrow as pa

            x = t.column(col).to_numpy(zero_copy_only=False).astype(np.float64)
            x = x[~np.isnan(x)]
            d = x - mean
            return pa.table(
                {"m2": [float(np.sum(d**2))], "m3": [float(np.sum(d**3))], "n": [len(x)]}
            )

        parts = ds.select_columns([col]).map_batches(partial, batch_format="pyarrow")
        from ray.data.aggregate import Sum as _Sum

        row = parts.aggregate(_Sum("m2", alias_name="m2"), _Sum("m3", alias_name="m3"))
        return {"m2": row["m2"], "m3": row["m3"]}

    @staticmethod
    def _category_counts(ds, col: str) -> dict:
        out = ds.groupby(col).count()
        pdf = out.to_pandas()  # one row per category — small by assumption
        return dict(zip(pdf[col], pdf["count()"]))

    @staticmethod
    def _grouped_moments(ds, col: str, by: str) -> dict:
        return grouped_moments_fast(ds, by, [col])[col]


def grouped_moments_fast(ds, by: str, cols: list[str]) -> dict:
    """Per-group {count, mean, std0, std1, min, max} for every col, via
    per-batch partial aggregation: each batch emits ONE row per group with
    (n, Σx, Σx², min, max); the groupby then reduces a few thousand partial
    rows instead of shuffling every input row. Returns
    {col: {group: stats}}."""
    import pandas as pd
    import pyarrow as pa

    from ray.data.aggregate import Max as _Max
    from ray.data.aggregate import Min as _Min
    from ray.data.aggregate import Sum as _Sum

    def partial(t: pa.Table) -> pa.Table:
        groups = t.column(by).to_numpy(zero_copy_only=False)
        uniq, inv = np.unique(groups, return_inverse=True)
        data = {by: uniq}
        for c in cols:
            x = t.column(c).to_numpy(zero_copy_only=False).astype(np.float64)
            ok = ~np.isnan(x)
            n = np.bincount(inv, weights=ok, minlength=len(uniq))
            x0 = np.where(ok, x, 0.0)
            s = np.bincount(inv, weights=x0, minlength=len(uniq))
            ss = np.bincount(inv, weights=x0 * x0, minlength=len(uniq))
            mn = np.full(len(uniq), np.inf)
            mx = np.full(len(uniq), -np.inf)
            np.minimum.at(mn, inv[ok], x[ok])
            np.maximum.at(mx, inv[ok], x[ok])
            data[f"{c}::n"] = n
            data[f"{c}::s"] = s
            data[f"{c}::ss"] = ss
            data[f"{c}::mn"] = mn
            data[f"{c}::mx"] = mx
        return pa.table({k: pa.array(v) for k, v in data.items()})

    aggs = []
    for c in cols:
        aggs += [
            _Sum(f"{c}::n", alias_name=f"{c}::n"),
            _Sum(f"{c}::s", alias_name=f"{c}::s"),
            _Sum(f"{c}::ss", alias_name=f"{c}::ss"),
            _Min(f"{c}::mn", alias_name=f"{c}::mn"),
            _Max(f"{c}::mx", alias_name=f"{c}::mx"),
        ]
    pdf = (
        ds.select_columns([by] + [c for c in cols if c != by])
        .map_batches(partial, batch_format="pyarrow")
        .groupby(by)
        .aggregate(*aggs)
        .to_pandas()
    )
    out: dict = {c: {} for c in cols}
    for rec in pdf.to_dict("records"):
        for c in cols:
            n = float(rec[f"{c}::n"])
            s, ss = float(rec[f"{c}::s"]), float(rec[f"{c}::ss"])
            mean = s / n if n else 0.0
            var0 = max(ss / n - mean * mean, 0.0) if n else 0.0
            var1 = var0 * n / (n - 1) if n > 1 else 0.0
            out[c][rec[by]] = {
                "count": n,
                "mean": mean,
                "std0": float(np.sqrt(var0)),
                "std1": float(np.sqrt(var1)),
                "min": float(rec[f"{c}::mn"]),
                "max": float(rec[f"{c}::mx"]),
            }
    return out


def skewness_from_moments(count: float, m2: float, m3: float) -> float:
    """Population skewness g1 = (m3/n) / (m2/n)^1.5 — matches
    scipy.stats.skew(bias=True) used by the reference BoxCox condition."""
    if not count or m2 == 0:
        return 0.0
    n = float(count)
    return (m3 / n) / math.pow(m2 / n, 1.5)


def yeo_johnson(x: np.ndarray, lam: np.ndarray) -> np.ndarray:
    """Vectorized Yeo-Johnson transform, broadcasting x against λ
    (Yeo & Johnson 2000). Shapes: x (..., 1) × lam (1, L) → (..., L)."""
    x = np.asarray(x, dtype=np.float64)
    lam = np.asarray(lam, dtype=np.float64)
    pos = x >= 0
    out = np.empty(np.broadcast_shapes(x.shape, lam.shape), dtype=np.float64)
    with np.errstate(invalid="ignore", over="ignore"):
        # x >= 0
        l0 = np.abs(lam) < 1e-12
        yp_gen = (np.power(x + 1.0, lam, where=pos | True) - 1.0) / np.where(l0, 1.0, lam)
        yp = np.where(l0, np.log1p(np.where(pos, x, 0.0)), yp_gen)
        # x < 0
        l2 = np.abs(lam - 2.0) < 1e-12
        yn_gen = -(np.power(1.0 - x, 2.0 - lam) - 1.0) / np.where(l2, 1.0, 2.0 - lam)
        yn = np.where(l2, -np.log1p(np.where(pos, 0.0, -x)), yn_gen)
    np.copyto(out, np.where(pos, yp, yn))
    return out


def yj_loglik_from_grid(grid: dict) -> np.ndarray:
    """Profile log-likelihood of each λ from the sufficient statistics
    gathered by the yj_grid fit pass."""
    n = float(grid["n"])
    mean = grid["sum"] / n
    var = np.maximum(grid["sumsq"] / n - mean * mean, 1e-300)
    return -0.5 * n * np.log(var) + (grid["lambdas"] - 1.0) * grid["slog"]
