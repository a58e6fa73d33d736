"""Distributed single-feature CART — the two feature_engine members the
reference re-exports that need a tree fit (reference surface
ballet/eng/external/feature_engine.py:30 DecisionTreeEncoder, :49
DecisionTreeDiscretiser).

Both fit a depth-limited regression tree of ONE feature against a target
and transform rows to their leaf's mean target. The fit is histogram CART
(LightGBM-style): a single distributed pass bins the feature into
equal-width bins carrying (count, Σy, Σy²) partials (mergeable — per-batch
pandas combiner → grouped Sum), and the driver greedily picks the
bin-boundary split with the lowest total SSE per node. Split candidates at
bin boundaries rather than exact value midpoints is the standard
histogram-tree approximation; the encoder's "bins" are whole categories
(ordered by target mean, feature_engine's ordered-ordinal convention), so
its splits are exact.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from ballet_ray.stages.encoders import FittedTransform, _col_f64


def _best_split(cnt: np.ndarray, s: np.ndarray, ss: np.ndarray):
    """Lowest-total-SSE boundary split of a histogram node. Returns
    (k, sse) — left = bins[..k], right = bins[k+1..] — or None when no
    valid split (fewer than two non-empty bins) or no SSE reduction.
    Ties resolve to the LOWEST k (np.argmin first occurrence), matching
    the SQL oracle's ORDER BY sse, bin."""
    C, S, SS = cnt.sum(), s.sum(), ss.sum()
    if C <= 0:
        return None
    cl = np.cumsum(cnt)[:-1]
    sl = np.cumsum(s)[:-1]
    ssl = np.cumsum(ss)[:-1]
    cr = C - cl
    valid = (cl > 0) & (cr > 0)
    with np.errstate(invalid="ignore", divide="ignore"):
        sse = (ssl - sl * sl / cl) + ((SS - ssl) - (S - sl) * (S - sl) / cr)
    sse = np.where(valid, sse, np.inf)
    if not np.isfinite(sse).any():
        return None
    k = int(np.argmin(sse))
    parent_sse = SS - S * S / C
    if not (sse[k] < parent_sse - 1e-12 * max(abs(parent_sse), 1.0)):
        return None
    return k, float(sse[k])


def _grow_tree(cnt: np.ndarray, s: np.ndarray, ss: np.ndarray, max_depth: int):
    """Greedy recursive histogram CART over bins [0, B). Returns leaves as
    (sorted upper-bin boundaries, leaf means): leaf i covers bins
    (uppers[i-1], uppers[i]]."""
    B = len(cnt)
    leaves: list[tuple[int, float]] = []

    def rec(lo: int, hi: int, depth: int):
        c, sv, ssv = cnt[lo : hi + 1], s[lo : hi + 1], ss[lo : hi + 1]
        split = _best_split(c, sv, ssv) if depth < max_depth and hi > lo else None
        if split is None:
            tot = c.sum()
            leaves.append((hi, float(sv.sum() / tot) if tot > 0 else np.nan))
            return
        k, _ = split
        rec(lo, lo + k, depth + 1)
        rec(lo + k + 1, hi, depth + 1)

    rec(0, B - 1, 0)
    leaves.sort()
    uppers = np.array([u for u, _ in leaves], dtype=np.int64)
    means = np.array([m for _, m in leaves], dtype=np.float64)
    # empty leaves (no rows) inherit the nearest non-NaN neighbor so every
    # bin maps somewhere deterministic: forward fill then backward fill
    # (a single left-neighbor pass leaves a LEADING run of empty leaves NaN)
    nan = np.isnan(means)
    if nan.any() and not nan.all():
        idx = np.arange(len(means))
        fwd = np.maximum.accumulate(np.where(~nan, idx, -1))
        filled = np.where(fwd >= 0, means[np.clip(fwd, 0, None)], np.nan)
        still = np.isnan(filled)
        if still.any():
            bwd = np.minimum.accumulate(np.where(~nan, idx, len(means))[::-1])[::-1]
            filled = np.where(still, means[np.clip(bwd, None, len(means) - 1)], filled)
        means = filled
    return uppers, means


class DecisionTreeDiscretiser(FittedTransform):
    """feature_engine.discretisation.DecisionTreeDiscretiser analog:
    replace a continuous variable with its tree-leaf mean target. Fit =
    one Min/Max pass + one histogram pass (both mergeable); transform =
    bin → leaf lookup. NaN inputs transform to NaN."""

    def __init__(self, target_col: str, max_depth: int = 3, bins: int = 64):
        self.target_col = target_col
        self.max_depth = max_depth
        self.bins = bins
        self.fitted_ = None

    def agg_requests(self, cols):
        return []

    def fit(self, ds, cols):
        from ray.data.aggregate import Max, Min, Sum

        cols = list(cols)
        narrow = ds.select_columns(sorted({*cols, self.target_col}))

        def minmax_partial(t: pa.Table) -> pa.Table:
            data = {}
            for c in cols:
                x = _col_f64(t, c)
                x = x[~np.isnan(x)]
                data[f"mn_{c}"] = [float(x.min()) if len(x) else np.inf]
                data[f"mx_{c}"] = [float(x.max()) if len(x) else -np.inf]
            return pa.table(data)

        row = narrow.map_batches(minmax_partial, batch_format="pyarrow").aggregate(
            *[a for c in cols for a in (Min(f"mn_{c}", alias_name=f"mn_{c}"), Max(f"mx_{c}", alias_name=f"mx_{c}"))]
        )
        bounds = {c: (float(row[f"mn_{c}"]), float(row[f"mx_{c}"])) for c in cols}
        B = self.bins

        def hist_partial(t: pa.Table) -> pa.Table:
            y = _col_f64(t, self.target_col)
            frames = []
            for c in cols:
                x = _col_f64(t, c)
                ok = ~np.isnan(x) & ~np.isnan(y)
                mn, mx = bounds[c]
                if mx <= mn:
                    b = np.zeros(int(ok.sum()), dtype=np.int64)
                else:
                    w = (mx - mn) / float(B)
                    b = np.minimum((np.floor((x[ok] - mn) / w)).astype(np.int64), B - 1)
                yv = y[ok]
                df = pd.DataFrame({"__col": c, "__b": b, "__c": 1, "__s": yv, "__ss": yv * yv})
                frames.append(
                    df.groupby(["__col", "__b"], sort=False).sum().reset_index()
                )
            return pa.Table.from_pandas(pd.concat(frames, ignore_index=True), preserve_index=False)

        hist = (
            narrow.map_batches(hist_partial, batch_format="pyarrow")
            .groupby(["__col", "__b"])
            .aggregate(
                Sum("__c", alias_name="__c"),
                Sum("__s", alias_name="__s"),
                Sum("__ss", alias_name="__ss"),
            )
            .to_pandas()  # ≤ cols × bins rows
        )
        self.fitted_ = {}
        for c in cols:
            sub = hist[hist["__col"] == c]
            cnt = np.zeros(B)
            s = np.zeros(B)
            ss = np.zeros(B)
            bb = sub["__b"].to_numpy()
            cnt[bb] = sub["__c"].to_numpy()
            s[bb] = sub["__s"].to_numpy()
            ss[bb] = sub["__ss"].to_numpy()
            uppers, means = _grow_tree(cnt, s, ss, self.max_depth)
            self.fitted_[c] = {"bounds": bounds[c], "uppers": uppers, "means": means}
        return self

    def fit_table(self, table, cols):
        import ray.data as rdata

        self.fit(rdata.from_arrow(table.select(sorted({*cols, self.target_col}))), cols)

    def transform_table(self, table, cols):
        self._check_fitted()
        out = {}
        for c in cols:
            st = self.fitted_[c]
            mn, mx = st["bounds"]
            x = _col_f64(table, c)
            ok = ~np.isnan(x)
            v = np.full(len(x), np.nan)
            if ok.any():
                if mx <= mn:
                    b = np.zeros(int(ok.sum()), dtype=np.int64)
                else:
                    w = (mx - mn) / float(self.bins)
                    b = np.clip(
                        np.floor((x[ok] - mn) / w).astype(np.int64), 0, self.bins - 1
                    )
                leaf = np.searchsorted(st["uppers"], b, side="left")
                v[ok] = st["means"][np.minimum(leaf, len(st["means"]) - 1)]
            out[f"{c}_tree"] = pa.array(v)
        return pa.table(out)

    def output_names(self, cols):
        return [f"{c}_tree" for c in cols]


class DecisionTreeEncoder(FittedTransform):
    """feature_engine.encoding.DecisionTreeEncoder analog: categories are
    ordinal-encoded in target-mean order (the library's ordered
    convention), a histogram CART with one bin per category fits the
    ordinal → target relation, and transform maps each category to its
    leaf's mean target. With 2^max_depth ≥ n_categories and
    distinguishable means every category isolates, so the encoding equals
    the per-category target mean (the property the SQL oracle checks).
    Fit = the shared grouped-moments pass; unknown categories → grand
    mean."""

    def __init__(self, target_col: str, max_depth: int = 3):
        self.target_col = target_col
        self.max_depth = max_depth
        self.fitted_ = None

    def agg_requests(self, cols):
        return [("grouped_moments", self.target_col, c) for c in cols]

    def bind_fit_results(self, cols, results):
        self.fitted_ = {}
        for c in cols:
            gm = results[("grouped_moments", self.target_col, c)]
            cats = sorted(gm, key=lambda g: (gm[g]["mean"], str(g)))
            n = np.array([gm[g]["count"] for g in cats], dtype=np.float64)
            m = np.array([gm[g]["mean"] for g in cats], dtype=np.float64)
            sd0 = np.array([gm[g]["std0"] for g in cats], dtype=np.float64)
            s = n * m
            ss = n * (sd0 * sd0 + m * m)
            uppers, means = _grow_tree(n, s, ss, self.max_depth)
            leaf_of_cat = np.searchsorted(uppers, np.arange(len(cats)), side="left")
            enc = {cat: float(means[leaf_of_cat[i]]) for i, cat in enumerate(cats)}
            mu = float(s.sum() / n.sum()) if n.sum() > 0 else np.nan
            self.fitted_[c] = {"enc": enc, "mu": mu}

    def fit_table(self, table, cols):
        y = _col_f64(table, self.target_col)
        acc = {}
        for c in cols:
            k = table.column(c).to_pandas()
            df = pd.DataFrame({"k": k, "y": y}).dropna()
            gm = {
                g: {"count": float(len(v)), "mean": float(v.mean()), "std0": float(v.std(ddof=0))}
                for g, v in df.groupby("k")["y"]
            }
            self.bind_fit_results([c], {("grouped_moments", self.target_col, c): gm})
            acc[c] = self.fitted_[c]
        self.fitted_ = acc

    def transform_table(self, table, cols):
        self._check_fitted()
        out = {}
        for c in cols:
            st = self.fitted_[c]
            vals = pd.Series(table.column(c).to_pandas()).map(st["enc"])
            out[f"{c}_dtree"] = pa.array(vals.fillna(st["mu"]).to_numpy(dtype=np.float64))
        return pa.table(out)

    def output_names(self, cols):
        return [f"{c}_dtree" for c in cols]
