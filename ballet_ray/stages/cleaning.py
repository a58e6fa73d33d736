"""feature_engine-family cleaning operators (reference re-export surface
ballet/eng/external/feature_engine.py:1-91): outlier trimming, missing-row
dropping, end-tail / arbitrary-number imputation, rare-label grouping, and
mathematical column combination.

``OutlierTrimmer`` and ``DropMissingData`` are the reference surface's only
FILTER-shaped operators (row count shrinks): they compile to predicate
``map_batches`` (Arrow filter), with fitted bounds from the shared
distributed aggregate pass.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from ballet_ray.stages.encoders import FittedTransform, _col_f64
from ballet_ray.transformer import Transform


def _row_hash(table: pa.Table, cols: list[str], seed: int) -> np.ndarray:
    """Deterministic per-row uint64 hash of the row's values in ``cols``
    (NaN canonicalized), independent of partitioning / batch boundaries —
    the content-addressed seed for reservoir priorities and reproducible
    random imputation draws."""
    h = np.full(
        len(table),
        np.uint64((seed * 0x9E3779B97F4A7C15 + 0x243F6A8885A308D3) & 0xFFFFFFFFFFFFFFFF),
        dtype=np.uint64,
    )
    with np.errstate(over="ignore"):
        for c in cols:
            v = _col_f64(table, c)
            bits = v.view(np.uint64).copy()
            bits[np.isnan(v)] = np.uint64(0x7FF8000000000001)  # canonical NaN
            h ^= bits + np.uint64(0x9E3779B97F4A7C15) + (h << np.uint64(6)) + (h >> np.uint64(2))
            h *= np.uint64(0xFF51AFD7ED558CCD)
            h ^= h >> np.uint64(33)
    return h


def _reservoir_sample(ds, cols: list[str], n: int, seed: int, *, complete_only: bool = False) -> pa.Table:
    """Unbiased deterministic ~n-row sample of a Dataset: every row gets a
    priority from a seeded content hash, each batch contributes at most its
    n smallest, and a distributed sort takes the global n smallest. Unlike
    ``ds.limit(n)`` (a PREFIX of the first blocks — biased on sorted or
    partitioned data) the winners span all blocks uniformly; the driver
    only ever sees n rows. Content-addressed priorities make the sample
    identical across runs and repartitionings."""
    cols = list(cols)

    def candidates(t: pa.Table) -> pa.Table:
        if complete_only:
            m = np.column_stack([_col_f64(t, c) for c in cols])
            t = t.filter(pa.array(~np.isnan(m).any(axis=1)))
        if len(t) == 0:
            return pa.table(
                {**{c: t.column(c) for c in cols}, "__prio": pa.array([], type=pa.uint64())}
            )
        pr = _row_hash(t, cols, seed)
        if len(t) > n:
            keep = np.sort(np.argpartition(pr, n - 1)[:n])
            t = t.take(pa.array(keep))
            pr = pr[keep]
        return t.append_column("__prio", pa.array(pr))

    cand = ds.select_columns(cols).map_batches(candidates, batch_format="pyarrow")
    top = cand.sort("__prio").limit(n).to_pandas()
    return pa.Table.from_pandas(top.drop(columns="__prio"), preserve_index=False)


class OutlierTrimmer(FittedTransform):
    """DROP rows outside the fitted quantile bounds
    (feature_engine.outliers.OutlierTrimmer with the quantile capping
    method). Filter-shaped: apply via :func:`apply_filter`, not inside a
    column-appending pipeline."""

    def __init__(self, lo: float = 0.01, hi: float = 0.99):
        self.lo, self.hi = lo, hi
        self.fitted_ = None

    def agg_requests(self, cols):
        return [("quantile", c, (self.lo, self.hi)) for c in cols]

    def bind_fit_results(self, cols, results):
        self.fitted_ = {c: tuple(results[("quantile", c, (self.lo, self.hi))]) for c in cols}

    def fit_table(self, table, cols):
        self.fitted_ = {}
        for c in cols:
            x = _col_f64(table, c)
            x = x[~np.isnan(x)]
            self.fitted_[c] = (float(np.quantile(x, self.lo)), float(np.quantile(x, self.hi)))

    def keep_mask(self, table: pa.Table, cols: list[str]) -> np.ndarray:
        self._check_fitted()
        keep = np.ones(len(table), dtype=bool)
        for c in cols:
            lo, hi = self.fitted_[c]
            x = _col_f64(table, c)
            keep &= (x >= lo) & (x <= hi)
        return keep

    # pipeline-compatible transform emits the keep flag (the row-dropping
    # form is apply_filter)
    def transform_table(self, table, cols):
        return pa.table({"outlier_keep": pa.array(self.keep_mask(table, cols).astype(np.int8))})

    def output_names(self, cols):
        return ["outlier_keep"]


class DropMissingData(Transform):
    """DROP rows with nulls in the given columns
    (feature_engine.imputation.DropMissingData). Filter-shaped."""

    def keep_mask(self, table: pa.Table, cols: list[str]) -> np.ndarray:
        keep = np.ones(len(table), dtype=bool)
        for c in cols:
            col = table.column(c)
            valid = pc.is_valid(col)
            if pa.types.is_floating(col.type):
                # is_nan(null) is null — Kleene AND keeps False, then fill
                valid = pc.fill_null(pc.and_kleene(valid, pc.invert(pc.is_nan(col))), False)
            keep &= valid.to_numpy(zero_copy_only=False).astype(bool)
        return keep

    def transform_table(self, table, cols):
        return pa.table({"missing_keep": pa.array(self.keep_mask(table, cols).astype(np.int8))})

    def output_names(self, cols):
        return ["missing_keep"]


def apply_filter(ds, transform, cols: list[str]):
    """Run a filter-shaped transform as a true row filter: fit (if needed)
    via the pipeline's aggregate pass, then predicate map_batches."""
    if getattr(transform, "requires_fit", False) and getattr(transform, "fitted_", None) is None:
        from ballet_ray.state.fitstate import FitPlanner

        planner = FitPlanner()
        planner.add(transform, cols)
        planner.run(ds)

    def f(t: pa.Table) -> pa.Table:
        return t.filter(pa.array(transform.keep_mask(t, cols)))

    return ds.map_batches(f, batch_format="pyarrow")


class EndTailImputer(FittedTransform):
    """Replace nulls/NaN with a value from the distribution tail
    (feature_engine.imputation.EndTailImputer): gaussian tail mean+3·std or
    iqr tail q3+3·IQR."""

    def __init__(self, method: str = "gaussian", fold: float = 3.0):
        if method not in ("gaussian", "iqr"):
            raise ValueError(method)
        self.method = method
        self.fold = fold
        self.fitted_ = None

    def agg_requests(self, cols):
        if self.method == "gaussian":
            return [("moments", c) for c in cols]
        return [("quantile", c, (0.25, 0.75)) for c in cols]

    def bind_fit_results(self, cols, results):
        self.fitted_ = {}
        for c in cols:
            if self.method == "gaussian":
                st = results[("moments", c)]
                self.fitted_[c] = st["mean"] + self.fold * st["std0"]
            else:
                q1, q3 = results[("quantile", c, (0.25, 0.75))]
                self.fitted_[c] = q3 + self.fold * (q3 - q1)

    def fit_table(self, table, cols):
        self.fitted_ = {}
        for c in cols:
            x = _col_f64(table, c)
            x = x[~np.isnan(x)]
            if self.method == "gaussian":
                self.fitted_[c] = float(x.mean() + self.fold * x.std())
            else:
                q1, q3 = np.quantile(x, [0.25, 0.75])
                self.fitted_[c] = float(q3 + self.fold * (q3 - q1))

    def transform_table(self, table, cols):
        self._check_fitted()
        out = {}
        for c in cols:
            x = _col_f64(table, c)
            out[f"{c}_imp"] = pa.array(np.where(np.isnan(x), self.fitted_[c], x))
        return pa.table(out)

    def output_names(self, cols):
        return [f"{c}_imp" for c in cols]


class ArbitraryNumberImputer(Transform):
    """Replace nulls/NaN with a fixed number
    (feature_engine.imputation.ArbitraryNumberImputer). Stateless."""

    def __init__(self, number: float = -999.0):
        self.number = number

    def transform_table(self, table, cols):
        out = {}
        for c in cols:
            x = _col_f64(table, c)
            out[f"{c}_imp"] = pa.array(np.where(np.isnan(x), self.number, x))
        return pa.table(out)

    def output_names(self, cols):
        return [f"{c}_imp" for c in cols]


class RareLabelEncoder(FittedTransform):
    """Group infrequent categories under one rare label
    (feature_engine.encoding.RareLabelEncoder): categories whose train
    frequency < tol are replaced by ``rare_label``."""

    def __init__(self, tol: float = 0.05, rare_label: str = "Rare"):
        self.tol = tol
        self.rare_label = rare_label
        self.fitted_ = None

    def agg_requests(self, cols):
        return [("cats", c) for c in cols]

    def bind_fit_results(self, cols, results):
        self.fitted_ = {}
        for c in cols:
            counts = results[("cats", c)]
            total = sum(counts.values()) or 1
            self.fitted_[c] = frozenset(k for k, v in counts.items() if v / total >= self.tol)

    def fit_table(self, table, cols):
        self.fitted_ = {}
        for c in cols:
            s = pd.Series(table.column(c).to_pylist())
            freq = s.value_counts(normalize=True)
            self.fitted_[c] = frozenset(freq[freq >= self.tol].index)

    def transform_table(self, table, cols):
        self._check_fitted()
        out = {}
        for c in cols:
            s = pd.Series(table.column(c).to_numpy(zero_copy_only=False))
            keep = s.isin(self.fitted_[c])
            out[f"{c}_rare"] = pa.array(np.where(keep, s.to_numpy(), self.rare_label).astype(object))
        return pa.table(out)

    def output_names(self, cols):
        return [f"{c}_rare" for c in cols]


class MathematicalCombination(Transform):
    """Row-wise combination of the input columns
    (feature_engine.creation.MathematicalCombination / the newer
    MathFeatures): sum, prod, mean, std, max, min. Stateless numpy."""

    _OPS = {
        "sum": lambda m: m.sum(axis=1),
        "prod": lambda m: m.prod(axis=1),
        "mean": lambda m: m.mean(axis=1),
        "std": lambda m: m.std(axis=1),
        "max": lambda m: m.max(axis=1),
        "min": lambda m: m.min(axis=1),
    }

    def __init__(self, ops: list[str] = ("sum", "mean")):
        unknown = set(ops) - set(self._OPS)
        if unknown:
            raise ValueError(f"unknown ops: {sorted(unknown)}")
        self.ops = list(ops)

    def transform_table(self, table, cols):
        m = np.column_stack([_col_f64(table, c) for c in cols])
        return pa.table({f"combo_{op}": pa.array(self._OPS[op](m)) for op in self.ops})

    def output_names(self, cols):
        return [f"combo_{op}" for op in self.ops]


class CategoricalImputer(FittedTransform):
    """Fill missing categories with the train-set MODE (or a fixed string)
    (feature_engine.imputation.CategoricalImputer)."""

    def __init__(self, fill_value: str | None = None):
        self.fill_value = fill_value
        self.fitted_ = None

    @property
    def requires_fit(self):  # type: ignore[override]
        return self.fill_value is None

    def agg_requests(self, cols):
        return [("cats", c) for c in cols] if self.fill_value is None else []

    def bind_fit_results(self, cols, results):
        self.fitted_ = {}
        for c in cols:
            counts = results[("cats", c)]
            # mode, ties broken by value for determinism
            self.fitted_[c] = max(counts.items(), key=lambda kv: (kv[1], str(kv[0])))[0]

    def fit_table(self, table, cols):
        self.fitted_ = {}
        for c in cols:
            s = pd.Series(table.column(c).to_pylist()).dropna()
            counts = s.value_counts()
            top = counts[counts == counts.max()].index
            self.fitted_[c] = sorted(top)[-1]

    def transform_table(self, table, cols):
        out = {}
        for c in cols:
            fill = self.fill_value if self.fill_value is not None else self.fitted_[c]
            out[f"{c}_imp"] = pc.fill_null(table.column(c), fill)
        return pa.table(out)

    def output_names(self, cols):
        return [f"{c}_imp" for c in cols]


class RandomSampleImputer(FittedTransform):
    """Fill missing values by sampling the train distribution
    (feature_engine.imputation.RandomSampleImputer). The fitted state is a
    bounded reservoir of observed values drawn by an unbiased distributed
    reservoir (priority = seeded content hash, global n smallest — spans
    all blocks, unlike a ``limit()`` prefix); at transform, fills are drawn
    DETERMINISTICALLY per row from a stable hash of the row's own content,
    so the imputation is reproducible across runs AND across partitioning /
    batch-boundary changes. The hash covers ``seed_cols`` when given
    (feature_engine's ``seed='observation'`` analog — pass a unique id
    column for full-entropy draws); otherwise the row's values in the input
    columns (rows with identical input content then draw the same fill)."""

    def __init__(self, reservoir: int = 4096, seed: int = 1754, seed_cols: list[str] | None = None):
        self.reservoir = reservoir
        self.seed = seed
        self.seed_cols = list(seed_cols) if seed_cols else None
        self.fitted_ = None

    def _stable_row_hash(self, table: pa.Table, cols) -> np.ndarray:
        if self.seed_cols:
            sub = table.select(self.seed_cols).to_pandas()
            h = pd.util.hash_pandas_object(sub, index=False).to_numpy().astype(np.uint64)
            with np.errstate(over="ignore"):
                return h + np.uint64(self.seed)
        return _row_hash(table, list(cols), self.seed)

    def agg_requests(self, cols):
        return []

    def fit(self, ds, cols):
        sample = _reservoir_sample(ds, list(cols), self.reservoir * 2, self.seed)
        self.fit_table(sample, cols)
        return self

    def fit_table(self, table, cols):
        rng = np.random.RandomState(self.seed)
        self.fitted_ = {}
        for c in cols:
            x = table.column(c).to_numpy(zero_copy_only=False).astype(np.float64)
            x = x[~np.isnan(x)]
            if len(x) > self.reservoir:
                x = x[rng.choice(len(x), self.reservoir, replace=False)]
            self.fitted_[c] = np.sort(x)

    def transform_table(self, table, cols):
        self._check_fitted()
        out = {}
        # partition-independent draw: stable per-row content hash (seed_cols
        # or the input columns, NaN canonicalized), varied per target column
        hrow = self._stable_row_hash(table, cols)
        for j, c in enumerate(cols):
            pool = self.fitted_[c]
            x = _col_f64(table, c)
            miss = np.isnan(x)
            if miss.any() and len(pool):
                with np.errstate(over="ignore"):
                    h = hrow[miss] * np.uint64(0xBF58476D1CE4E5B9) + np.uint64(j + 1)
                    h ^= h >> np.uint64(31)
                picks = (h % np.uint64(len(pool))).astype(np.int64)
                x = x.copy()
                x[miss] = pool[picks]
            out[f"{c}_imp"] = pa.array(x)
        return pa.table(out)

    def output_names(self, cols):
        return [f"{c}_imp" for c in cols]


class ArbitraryOutlierCapper(Transform):
    """Clip at user-given bounds (feature_engine.outliers
    .ArbitraryOutlierCapper). Stateless."""

    def __init__(self, max_value: float | None = None, min_value: float | None = None):
        if max_value is None and min_value is None:
            raise ValueError("need max_value and/or min_value")
        self.max_value, self.min_value = max_value, min_value

    def transform_table(self, table, cols):
        out = {}
        for c in cols:
            x = _col_f64(table, c)
            if self.min_value is not None:
                x = np.maximum(x, self.min_value)
            if self.max_value is not None:
                x = np.minimum(x, self.max_value)
            out[f"{c}_cap"] = pa.array(x)
        return pa.table(out)

    def output_names(self, cols):
        return [f"{c}_cap" for c in cols]


class CombineWithReference(Transform):
    """Combine every input column with reference column(s)
    (feature_engine.creation.CombineWithReferenceFeature / the newer
    RelativeFeatures): sub, div, add, mul. cols = the variables; the
    reference columns are constructor params (read from the full batch)."""

    _OPS = {
        "sub": np.subtract,
        "div": np.divide,
        "add": np.add,
        "mul": np.multiply,
    }

    def __init__(self, reference: list[str], ops: list[str] = ("sub",)):
        unknown = set(ops) - set(self._OPS)
        if unknown:
            raise ValueError(f"unknown ops: {sorted(unknown)}")
        self.reference = [reference] if isinstance(reference, str) else list(reference)
        self.ops = list(ops)

    def transform_table(self, table, cols):
        out = {}
        with np.errstate(divide="ignore", invalid="ignore"):
            for c in cols:
                x = _col_f64(table, c)
                for r in self.reference:
                    ref = _col_f64(table, r)
                    for op in self.ops:
                        out[f"{c}_{op}_{r}"] = pa.array(self._OPS[op](x, ref))
        return pa.table(out)

    def output_names(self, cols):
        return [f"{c}_{op}_{r}" for c in cols for r in self.reference for op in self.ops]


class KNNImputer(FittedTransform):
    """k-nearest-neighbor imputation against a bounded DONOR POOL
    (sklearn.impute.KNNImputer semantics with the scale-required twist:
    sklearn searches all rows pairwise — O(n²) and impossible at corpus
    scale — so fit draws a deterministic sample of COMPLETE rows as
    donors, and transform finds each incomplete row's k nearest donors
    with the nan-euclidean metric (distance over observed dims scaled by
    n_dims/n_observed, sklearn's convention) in one vectorized pass per
    batch. Donor pool ≤ ``donors`` rows; exact for datasets under that
    size."""

    def __init__(self, n_neighbors: int = 5, donors: int = 2048, seed: int = 1754):
        self.n_neighbors = n_neighbors
        self.donors = donors
        self.seed = seed
        self.fitted_ = None

    def agg_requests(self, cols):
        return []

    def fit(self, ds, cols):
        # unbiased distributed reservoir over COMPLETE rows only — a
        # limit() prefix would draw donors from the first blocks alone,
        # unrepresentative on data sorted/partitioned by time or source
        sample = _reservoir_sample(ds, list(cols), self.donors * 2, self.seed, complete_only=True)
        self.fit_table(sample, cols)
        return self

    def fit_table(self, table, cols):
        m = np.column_stack([_col_f64(table, c) for c in cols])
        complete = m[~np.isnan(m).any(axis=1)]
        if len(complete) == 0:
            raise ValueError("KNNImputer: no complete rows to use as donors")
        if len(complete) > self.donors:
            rng = np.random.RandomState(self.seed)
            complete = complete[rng.choice(len(complete), self.donors, replace=False)]
        self.fitted_ = {"donors": complete, "cols": list(cols)}

    def transform_table(self, table, cols):
        self._check_fitted()
        D = self.fitted_["donors"]  # (m, d)
        X = np.column_stack([_col_f64(table, c) for c in cols])  # (n, d)
        out = X.copy()
        miss_rows = np.flatnonzero(np.isnan(X).any(axis=1))
        if len(miss_rows):
            Xm = X[miss_rows]
            obs = ~np.isnan(Xm)  # (r, d)
            d = X.shape[1]
            # nan-euclidean: sum over observed dims, scaled by d/#observed
            diff = Xm[:, None, :] - D[None, :, :]  # (r, m, d)
            sq = np.where(obs[:, None, :], diff * diff, 0.0).sum(axis=2)
            n_obs = np.maximum(obs.sum(axis=1), 1)
            dist = sq * (d / n_obs)[:, None]
            k = min(self.n_neighbors, len(D))
            nn = np.argpartition(dist, k - 1, axis=1)[:, :k]  # (r, k)
            donor_vals = D[nn]  # (r, k, d)
            fill = donor_vals.mean(axis=1)  # (r, d)
            rr, cc = np.where(~obs)
            out[miss_rows[rr], cc] = fill[rr, cc]
        return pa.table({f"{c}_imp": pa.array(out[:, j]) for j, c in enumerate(cols)})

    def output_names(self, cols):
        return [f"{c}_imp" for c in cols]


class IterativeImputer(FittedTransform):
    """Round-based multivariate imputation (sklearn.impute.IterativeImputer
    semantics, distributed): each round fits, for EVERY column with
    missing values, a linear regression on the other columns — the normal
    equations' Gram matrices are accumulated as per-batch partials in ONE
    distributed pass per round (models solved on the driver from d tiny
    (d+1)² systems), and rows are re-imputed with the updated models.
    Updates are Jacobi-style (all columns refreshed from the previous
    round's values — sklearn's default is sequential; documented
    difference), which is what makes one-pass-per-round possible at
    corpus scale. Transform applies the fitted models for ``max_iter``
    local Jacobi steps per batch."""

    def __init__(self, max_iter: int = 3):
        self.max_iter = max_iter
        self.fitted_ = None

    def agg_requests(self, cols):
        return []

    # -- shared imputation kernel -------------------------------------
    @staticmethod
    def _impute_once(X, miss, means, models):
        """One Jacobi step: refill every missing cell from the CURRENT
        matrix (observed cells never change)."""
        Xc = X.copy()
        Xc[miss] = np.take(means, np.where(miss)[1])  # baseline for round 0
        if models is not None:
            d = X.shape[1]
            pred = np.empty_like(Xc)
            for j in range(d):
                w, b = models[j]
                others = np.delete(Xc, j, axis=1)
                pred[:, j] = others @ w + b
            Xc[miss] = pred[miss]
        return Xc

    def fit(self, ds, cols):
        import ray.data as rdata
        from ray.data.aggregate import Sum

        d = len(cols)
        # round 0: column means
        def mean_partial(t: pa.Table) -> pa.Table:
            out = {}
            for c in cols:
                x = _col_f64(t, c)
                ok = ~np.isnan(x)
                out[f"{c}_s"] = [float(x[ok].sum())]
                out[f"{c}_n"] = [float(ok.sum())]
            return pa.table(out)

        aggs = [Sum(f"{c}_s", alias_name=f"{c}_s") for c in cols] + [
            Sum(f"{c}_n", alias_name=f"{c}_n") for c in cols
        ]
        narrow = ds.select_columns(list(cols))
        row = narrow.map_batches(mean_partial, batch_format="pyarrow").aggregate(*aggs)
        means = np.array([row[f"{c}_s"] / max(row[f"{c}_n"], 1.0) for c in cols])

        models = None
        # per-j flattened gram+moment length: Z1 has d columns → G is d×d, v is d
        nq = d * d + d
        gram_aggs = [
            Sum(f"q{j}_{p}", alias_name=f"q{j}_{p}") for j in range(d) for p in range(nq)
        ]
        for _ in range(self.max_iter):
            mdl = models

            def gram_partial(t: pa.Table, mdl=mdl) -> pa.Table:
                X = np.column_stack([_col_f64(t, c) for c in cols])
                miss = np.isnan(X)
                Xc = IterativeImputer._impute_once(X, miss, means, mdl)
                out = {}
                for j in range(d):
                    ok = ~miss[:, j]  # fit only on rows where target observed
                    Z = np.delete(Xc[ok], j, axis=1)
                    Z1 = np.column_stack([Z, np.ones(len(Z))])
                    y = Xc[ok][:, j]
                    G = Z1.T @ Z1  # (d, d)
                    v = Z1.T @ y
                    flat = np.concatenate([G.ravel(), v])
                    for p in range(nq):
                        out[f"q{j}_{p}"] = [float(flat[p])]
                return pa.table(out)

            # gram/moment partials reduced by a distributed Sum aggregate —
            # the driver sees ONE row per round, not one per batch
            row_g = narrow.map_batches(gram_partial, batch_format="pyarrow").aggregate(*gram_aggs)
            models = []
            for j in range(d):
                flat = np.array([row_g[f"q{j}_{p}"] for p in range(nq)])
                G = flat[: d * d].reshape(d, d)
                v = flat[d * d :]
                sol = np.linalg.lstsq(G, v, rcond=None)[0]
                models.append((sol[:-1], float(sol[-1])))
        self.fitted_ = {"means": means, "models": models, "cols": list(cols)}
        return self

    def fit_table(self, table, cols):
        import ray.data as rdata

        self.fit(rdata.from_arrow(table.select(list(cols))), cols)

    def transform_table(self, table, cols):
        self._check_fitted()
        X = np.column_stack([_col_f64(table, c) for c in cols])
        miss = np.isnan(X)
        Xc = self._impute_once(X, miss, self.fitted_["means"], None)
        for _ in range(self.max_iter):
            upd = self._impute_once(Xc, miss, self.fitted_["means"], self.fitted_["models"])
            Xc[miss] = upd[miss]
        return pa.table({f"{c}_imp": pa.array(Xc[:, j]) for j, c in enumerate(cols)})

    def output_names(self, cols):
        return [f"{c}_imp" for c in cols]
