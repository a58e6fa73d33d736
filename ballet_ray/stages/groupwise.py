"""GroupwiseTransform — per-group fitted transformers.

Reference GroupwiseTransformer (ballet/eng/base.py:150-254): at fit, clone
and fit one sub-transformer per group of the *training* data (explicitly to
avoid train/test leakage, docstring ballet/eng/base.py:94-103); at
transform, apply the group's fitted clone. Unknown group → 'error' or
'ignore' (pass through unchanged); transform error → 'error' or 'ignore'
(ballet/eng/base.py:204-254).

Ray execution: the fit pass is ``groupby(group_key).map_groups`` over the
group columns only, each group emitting its fitted state as one serialized
row; states are collected into a dict (small: one entry per group) that the
transform closure carries. The transform pass is a plain ``map_batches``
that partitions each batch by group code and applies the per-group state
vectorized — no second shuffle.

Also here: GroupedFunctionTransform (stateless per-group apply, reference
ballet/eng/base.py:64-91) executed via the keyed co-partition pass.
"""

from __future__ import annotations

import copy
import pickle

import numpy as np
import pyarrow as pa

from ballet_ray.stages.encoders import FittedTransform
from ballet_ray.stages.windows import KeyedTransform
from ballet_ray.transformer import Transform  # noqa: F401 (protocol reference)


class GroupwiseTransform(FittedTransform):
    def __init__(
        self,
        transformer: Transform,
        groupby: str,
        handle_unknown: str = "error",  # 'error' | 'ignore'
        handle_error: str = "error",
    ):
        if handle_unknown not in ("error", "ignore") or handle_error not in ("error", "ignore"):
            raise ValueError("handle_unknown/handle_error must be 'error' or 'ignore'")
        self.transformer = transformer
        self.groupby = groupby
        self.handle_unknown = handle_unknown
        self.handle_error = handle_error
        self.fitted_: dict | None = None

    def fit(self, ds, cols: list[str]):
        proto = self.transformer
        gcol = self.groupby

        # Fast path: inner transforms whose fit is pure per-column moments
        # (StandardScaler, MinMaxScaler, SimpleImputer(mean), ...) fit via a
        # tree-reduce grouped aggregate — no row shuffle at all.
        reqs = proto.agg_requests(cols) if hasattr(proto, "agg_requests") else []
        if reqs and all(r[0] == "moments" for r in reqs):
            from ballet_ray.state.fitstate import grouped_moments_fast

            stats = grouped_moments_fast(ds, gcol, cols)
            groups = set().union(*(stats[c].keys() for c in cols))
            self.fitted_ = {}
            self._inner_cache = {}
            for g in groups:
                inner = copy.deepcopy(proto)
                results = {("moments", c): stats[c][g] for c in cols}
                inner.bind_fit_results(cols, results)
                self.fitted_[g] = pickle.dumps(inner)
            return self

        def fit_group(t: pa.Table) -> pa.Table:
            inner = copy.deepcopy(proto)
            inner.fit_table(t, cols)
            g = t.column(gcol)[0].as_py()
            return pa.table({"group": [g], "state": [pickle.dumps(inner)]})

        states = (
            ds.select_columns([gcol] + [c for c in cols if c != gcol])
            .groupby(gcol)
            .map_groups(fit_group, batch_format="pyarrow")
        )
        pdf = states.to_pandas()
        self.fitted_ = {r["group"]: r["state"] for r in pdf.to_dict("records")}
        self._inner_cache = {}
        return self

    def transform_table(self, table: pa.Table, cols: list[str]) -> pa.Table:
        self._check_fitted()
        out_names = self.output_names(cols)
        n = table.num_rows
        outs = {name: np.full(n, np.nan, dtype=np.float64) for name in out_names}
        # dictionary-encode the group column once per batch: per-group masks
        # become integer-code compares (string == over an object array costs
        # ~2 ms per 10k rows; this whole stage ran at 19 ms/block before)
        gcol = table.column(self.groupby)
        if isinstance(gcol, pa.ChunkedArray):
            gcol = gcol.combine_chunks()
        enc = gcol.dictionary_encode() if not pa.types.is_dictionary(gcol.type) else gcol
        codes = enc.indices.to_numpy(zero_copy_only=False)
        uniq_vals = enc.dictionary.to_pylist()
        present = np.unique(codes[codes >= 0]) if n else []
        # filter only the columns the inner transform reads — the batch may
        # carry wide payloads (token lists) that per-group filters would
        # otherwise copy once per group
        needed = table.select(cols)
        for gi in present:
            g = uniq_vals[gi]
            mask = codes == gi
            sub = needed.filter(pa.array(mask))
            blob = self.fitted_.get(g)
            if blob is None:
                if self.handle_unknown == "error":
                    raise ValueError(f"unknown group {g!r} at transform")
                # ignore: pass input through unchanged (reference
                # ballet/eng/base.py:219-230)
                for name, c in zip(out_names, cols):
                    outs[name][mask] = sub.column(c).to_numpy(zero_copy_only=False).astype(np.float64)
                continue
            # unpickle each group's fitted inner once per worker process,
            # not once per batch (fit() resets the cache)
            cache = self.__dict__.setdefault("_inner_cache", {})
            inner = cache.get(g)
            if inner is None:
                inner = cache[g] = pickle.loads(blob)
            try:
                res = inner.transform_table(sub, cols)
                for name, rc in zip(out_names, res.column_names):
                    outs[name][mask] = res.column(rc).to_numpy(zero_copy_only=False).astype(np.float64)
            except Exception:
                if self.handle_error == "error":
                    raise
                for name, c in zip(out_names, cols):
                    outs[name][mask] = sub.column(c).to_numpy(zero_copy_only=False).astype(np.float64)
        return pa.table({k: pa.array(v) for k, v in outs.items()})

    def output_names(self, cols: list[str]) -> list[str]:
        return self.transformer.output_names(cols)


class GroupedFunctionTransform(KeyedTransform):
    """Stateless per-group apply returning one value per row (reference
    GroupedFunctionTransformer, ballet/eng/base.py:64-91). ``func`` receives
    one group's values as a numpy array and returns a scalar (broadcast to
    the group) or an array of the group's length.

    Runs inside the keyed co-partition pass so each group is seen whole;
    the per-group Python loop is the price of an arbitrary ``func`` — use a
    dedicated vectorized KeyedTransform for hot paths.
    """

    def __init__(self, func, key: str, order_by: str | None = None):
        super().__init__(key, order_by)
        self.func = func

    def transform_sorted(self, table, codes, starts, cols):
        n = len(codes)
        seg_bounds = np.flatnonzero(np.diff(codes, prepend=-1))  # group start idxs
        seg_bounds = np.append(seg_bounds, n)
        out = {}
        for c in cols:
            vals = table.column(c).to_numpy(zero_copy_only=False).astype(np.float64)
            res = np.full(n, np.nan)
            for i in range(len(seg_bounds) - 1):
                lo, hi = seg_bounds[i], seg_bounds[i + 1]
                res[lo:hi] = self.func(vals[lo:hi])
            out[f"{c}_grouped"] = res
        return out

    def output_names(self, cols: list[str]) -> list[str]:
        return [f"{c}_grouped" for c in cols]
