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


# ---------------------------------------------------------------------------
# KLL-style mergeable quantile sketch (Karnin-Lang-Liberty 2016, simplified:
# fixed per-level capacity). Level h holds items of weight 2^h; a full level
# sorts its buffer and promotes every other item (deterministic alternating
# parity, so results are reproducible across runs and merge orders given the
# same compaction sequence). While NO compaction has occurred the sketch is
# the exact value multiset, so quantiles are exact below capacity — the same
# "exact at test scale, approximate at corpus scale" contract as the KMV
# distinct sketch above. Rank error is O(1/k) with ~k log(n/k) space.
# ---------------------------------------------------------------------------


class _KLL:
    __slots__ = ("k", "levels", "parity")

    def __init__(self, k: int):
        self.k = int(k)
        self.levels: list[np.ndarray] = [np.empty(0, np.float64)]
        self.parity = 0

    def add(self, values: np.ndarray):
        v = np.asarray(values, np.float64)
        v = v[~np.isnan(v)]
        if len(v):
            self.levels[0] = np.concatenate([self.levels[0], v])
            self._compact()

    def _compact(self):
        h = 0
        while h < len(self.levels):
            buf = self.levels[h]
            if len(buf) <= self.k:
                h += 1
                continue
            buf = np.sort(buf)
            keep = buf[self.parity :: 2]  # promote every other item
            self.parity ^= 1
            self.levels[h] = np.empty(0, np.float64)
            if h + 1 == len(self.levels):
                self.levels.append(np.empty(0, np.float64))
            self.levels[h + 1] = np.concatenate([self.levels[h + 1], keep])
            h += 1

    def merge(self, other: "_KLL"):
        while len(self.levels) < len(other.levels):
            self.levels.append(np.empty(0, np.float64))
        for h, buf in enumerate(other.levels):
            if len(buf):
                self.levels[h] = np.concatenate([self.levels[h], buf])
        self._compact()
        return self

    def quantiles(self, qs) -> np.ndarray:
        items = np.concatenate(self.levels) if self.levels else np.empty(0)
        weights = np.concatenate(
            [np.full(len(buf), 1 << h, np.float64) for h, buf in enumerate(self.levels)]
        ) if self.levels else np.empty(0)
        if not len(items):
            return np.full(len(list(qs)), np.nan)
        order = np.argsort(items, kind="stable")
        items, weights = items[order], weights[order]
        cum = np.cumsum(weights)
        total = cum[-1]
        out = np.empty(len(list(qs)))
        for i, q in enumerate(qs):
            # smallest element whose cumulative weight reaches q*W — the
            # discrete quantile rule (DuckDB quantile_disc) when exact
            target = max(q * total, np.finfo(np.float64).tiny)
            out[i] = items[np.searchsorted(cum, target - 1e-9)]
        return out

    def serialize(self) -> bytes:
        header = np.array([self.parity, len(self.levels)] + [len(b) for b in self.levels],
                          dtype=np.int64)
        payload = np.concatenate([np.array([len(header)], np.int64), header]).tobytes()
        return payload + b"".join(np.ascontiguousarray(b).tobytes() for b in self.levels)

    @classmethod
    def deserialize(cls, blob: bytes, k: int) -> "_KLL":
        nh = int(np.frombuffer(blob[:8], np.int64)[0])
        header = np.frombuffer(blob[8 : 8 + 8 * nh], np.int64)
        sk = cls(k)
        sk.parity = int(header[0])
        off = 8 + 8 * nh
        sk.levels = []
        for ln in header[2 : 2 + int(header[1])]:
            sk.levels.append(np.frombuffer(blob[off : off + 8 * int(ln)], np.float64).copy())
            off += 8 * int(ln)
        if not sk.levels:
            sk.levels = [np.empty(0, np.float64)]
        return sk


def approx_quantiles(ds, col: str, qs, *, k: int = 4096) -> np.ndarray:
    """Approximate quantiles of ``col`` in one streaming pass: each batch
    emits ONE serialized KLL sketch, blocks pre-merge, and a single grouped
    reduce hands the driver exactly one sketch (same tree-merge shape as
    approx_distinct — the shuffle carries sketch bytes, never values).
    Exact when the column has ≤ k values; rank error ~1/k above."""
    qs = list(qs)

    def partial(t: pa.Table) -> pa.Table:
        sk = _KLL(k)
        sk.add(t.column(col).to_numpy(zero_copy_only=False))
        return pa.table({"g": pa.array([0], type=pa.int8()),
                         "sketch": pa.array([sk.serialize()])})

    def merge_blobs(blobs) -> bytes:
        acc = _KLL(k)
        for blob in blobs:
            acc.merge(_KLL.deserialize(blob, k))
        return acc.serialize()

    def combine(t: pa.Table) -> pa.Table:
        return pa.table({"g": pa.array([0], type=pa.int8()),
                         "sketch": pa.array([merge_blobs(t.column("sketch").to_pylist())])})

    import pandas as pd

    def final(g: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"sketch": [merge_blobs(g["sketch"])]})

    parts = ds.select_columns([col]).map_batches(partial, batch_format="pyarrow")
    out = (parts.map_batches(combine, batch_format="pyarrow")
           .groupby("g").map_groups(final, batch_format="pandas").take(1))
    return _KLL.deserialize(out[0]["sketch"], k).quantiles(qs)


def approx_quantiles_per_group(ds, col: str, by: str, qs, *, k: int = 2048):
    """Per-group approximate quantiles: per-batch per-group sketches →
    grouped sketch merge → (group, q, val) rows. Returns pandas."""
    import pandas as pd

    qs = list(qs)

    def partial(t: pa.Table) -> pa.Table:
        groups = t.column(by).to_numpy(zero_copy_only=False)
        vals = t.column(col).to_numpy(zero_copy_only=False)
        rows_g, rows_s = [], []
        for g in np.unique(groups):
            sk = _KLL(k)
            sk.add(vals[groups == g])
            rows_g.append(g)
            rows_s.append(sk.serialize())
        return pa.table({by: pa.array(rows_g), "sketch": pa.array(rows_s)})

    def merge_group(g: pd.DataFrame) -> pd.DataFrame:
        acc = _KLL(k)
        for blob in g["sketch"]:
            acc.merge(_KLL.deserialize(blob, k))
        vals = acc.quantiles(qs)
        return pd.DataFrame({by: [g[by].iloc[0]] * len(qs), "q": qs, "val": vals})

    return (
        ds.select_columns([by, col])
        .map_batches(partial, batch_format="pyarrow")
        .groupby(by)
        .map_groups(merge_group, batch_format="pandas")
    )


# ---------------------------------------------------------------------------
# Misra-Gries heavy hitters (mergeable summaries, Agarwal et al. 2013):
# per-batch MG summaries of <= capacity counters are EXACT sums minus at
# most n_batch/(capacity+1) per value; summing summaries (a plain keyed
# Sum) preserves the bound additively, so the global estimate of every
# value lies in [true - n/(capacity+1), true]. With distinct values <=
# capacity no decrement ever fires and the result is exact — the same
# "exact at test scale, approximate at corpus scale" contract as KMV/KLL.
# ---------------------------------------------------------------------------


def _mg_summary(values: np.ndarray, capacity: int):
    """Misra-Gries over one batch → (values, counts) arrays, len<=capacity."""
    vals, cnts = np.unique(values, return_counts=True)
    if len(vals) <= capacity:
        return vals, cnts
    # decrement: subtract m = the (capacity+1)-th largest count from every
    # counter and drop the non-positive ones. At most `capacity` counts can
    # be STRICTLY greater than m (anything tied with m drops to 0), so the
    # result always fits. Error accounting: kept counters lose exactly m,
    # dropped ones lose their count <= m, and m <= n/(capacity+1) because
    # the capacity+1 largest counts are each >= m and sum to <= n — the
    # documented lower-bound guarantee holds on tie-heavy batches too.
    kth = np.partition(cnts, -capacity - 1)[-capacity - 1]
    keep = cnts > kth
    return vals[keep], cnts[keep] - kth


def approx_top_k(ds, col: str, *, k: int = 10, capacity: int = 256):
    """Approximate top-k values by count with one streaming pass.

    The shuffle carries at most ``capacity`` (value, partial-count) rows
    per block — independent of row count and cardinality — then one small
    keyed Sum and a sort. Every estimate is a LOWER bound within
    ``n/(capacity+1)`` of the true count; with ``distinct <= capacity``
    the result is exact (DuckDB-oracle-able). Ties break by value
    ascending. Returns a Dataset (col, cnt) of ``k`` rows.
    """

    def partial(t: pa.Table) -> pa.Table:
        v = t.column(col).to_numpy(zero_copy_only=False)
        vals, cnts = _mg_summary(v, capacity)
        return pa.table({col: pa.array(vals), "cnt": pa.array(cnts.astype(np.int64))})

    summed = (
        ds.select_columns([col])
        .map_batches(partial, batch_format="pyarrow")
        .groupby(col)
        .sum("cnt")
    )

    def rename(t: pa.Table) -> pa.Table:
        return t.rename_columns([col, "cnt"])

    return (
        summed.map_batches(rename, batch_format="pyarrow")
        .sort(["cnt", col], descending=[True, False])
        .limit(k)
    )


# ---------------------------------------------------------------------------
# HyperLogLog (Flajolet et al. 2007): distinct counting in FIXED memory —
# 2^p one-byte registers (4 KB at p=12) regardless of cardinality, vs KMV's
# 8k bytes. Registers merge by element-wise MAX, so the per-block partial →
# tree-merge shape of approx_distinct applies unchanged; the driver receives
# exactly one register array. Standard error ≈ 1.04/√(2^p) (~1.6% at p=12).
# Small cardinalities use the linear-counting correction; the 64-bit hash
# space needs no large-range correction at corpus scales.
# ---------------------------------------------------------------------------


def _hll_registers(values: np.ndarray, p: int) -> np.ndarray:
    """One-pass register array for a batch of values (uint8, len 2^p)."""
    h = stable_hash_array(values)
    idx = (h >> np.uint64(64 - p)).astype(np.int64)
    rest = h << np.uint64(p)  # remaining 64-p bits, left-aligned
    # rank = leading zeros of the remaining bits + 1, capped at 64-p+1.
    # Vectorized leading-zero count via float64 exponent bits; values within
    # half-ulp below a power of two round UP (exponent one too high), so the
    # exponent is clamped and corrected against the exact integer 2^e.
    nz = rest != 0
    lz = np.full(len(h), 64, np.int64)
    if nz.any():
        f = rest[nz].astype(np.float64)
        exp = ((f.view(np.uint64) >> np.uint64(52)).astype(np.int64) - 1023)
        exp = np.minimum(exp, 63)
        exp -= (rest[nz] < (np.uint64(1) << exp.astype(np.uint64))).astype(np.int64)
        lz[nz] = 63 - exp
    rank = np.minimum(lz + 1, 64 - p + 1).astype(np.uint8)
    regs = np.zeros(1 << p, np.uint8)
    np.maximum.at(regs, idx, rank)
    return regs


def _hll_estimate(regs: np.ndarray, p: int) -> float:
    m = float(1 << p)
    alpha = 0.7213 / (1 + 1.079 / m)  # standard constant for m >= 128
    est = alpha * m * m / float(np.sum(np.exp2(-regs.astype(np.float64))))
    zeros = int(np.count_nonzero(regs == 0))
    if est <= 2.5 * m and zeros:
        return m * np.log(m / zeros)  # linear counting (small range)
    return est


def approx_distinct_hll(ds, col: str, *, p: int = 12) -> float:
    """Approximate COUNT(DISTINCT col) via HyperLogLog: each batch emits ONE
    2^p-byte register blob, blocks pre-merge by element-wise max, and a
    single grouped reduce hands the driver exactly one register array —
    fixed memory at ANY cardinality (use over :func:`approx_distinct` when
    the distinct space is unbounded, e.g. URLs / shingles at 100 TB)."""

    def partial(t: pa.Table) -> pa.Table:
        vals = t.column(col).to_numpy(zero_copy_only=False)
        regs = _hll_registers(vals, p)
        return pa.table({"g": pa.array([0], type=pa.int8()),
                         "sketch": pa.array([regs.tobytes()])})

    def merge_blobs(blobs) -> bytes:
        merged = np.zeros(1 << p, np.uint8)
        for blob in blobs:
            np.maximum(merged, np.frombuffer(blob, dtype=np.uint8), out=merged)
        return merged.tobytes()

    def combine(t: pa.Table) -> pa.Table:
        return pa.table({"g": pa.array([0], type=pa.int8()),
                         "sketch": pa.array([merge_blobs(t.column("sketch").to_pylist())])})

    import pandas as pd

    def final(g: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"sketch": [merge_blobs(g["sketch"])]})

    parts = ds.select_columns([col]).map_batches(partial, batch_format="pyarrow")
    out = (parts.map_batches(combine, batch_format="pyarrow")
           .groupby("g").map_groups(final, batch_format="pandas").take(1))
    return _hll_estimate(np.frombuffer(out[0]["sketch"], dtype=np.uint8), p)


def approx_distinct_per_group_hll(ds, col: str, by: str, *, p: int = 10):
    """Per-group HyperLogLog distinct counts (fixed 2^p bytes per group no
    matter the cardinality). Returns pandas (by, approx_nd)."""
    import pandas as pd

    def partial(t: pa.Table) -> pa.Table:
        groups = t.column(by).to_numpy(zero_copy_only=False)
        vals = t.column(col).to_numpy(zero_copy_only=False)
        rows_g, rows_s = [], []
        for g in np.unique(groups):
            rows_g.append(g)
            rows_s.append(_hll_registers(vals[groups == g], p).tobytes())
        return pa.table({by: pa.array(rows_g), "sketch": pa.array(rows_s)})

    def merge_group(g: pd.DataFrame) -> pd.DataFrame:
        merged = np.zeros(1 << p, np.uint8)
        for blob in g["sketch"]:
            np.maximum(merged, np.frombuffer(blob, dtype=np.uint8), out=merged)
        return pd.DataFrame({by: [g[by].iloc[0]],
                             "approx_nd": [_hll_estimate(merged, p)]})

    return (
        ds.select_columns([by, col])
        .map_batches(partial, batch_format="pyarrow")
        .groupby(by)
        .map_groups(merge_group, batch_format="pandas")
        .to_pandas()
    )


class CountMinSketch:
    """Mergeable Count-Min sketch (Cormode/Muthukrishnan 2005): point
    frequency estimates over unbounded key spaces in fixed memory.
    ``depth`` independent hash rows × ``width`` counters; an estimate is
    the MIN across rows — always ≥ the true count, and ≤ true + εN with
    probability 1−δ for ``width = ⌈e/ε⌉``, ``depth = ⌈ln 1/δ⌉``.

    Addition is element-wise on the counter matrix, so per-block partials
    tree-reduce through the same ``vector_sum_reduce`` pipe every sketch
    in this module uses — the driver receives ONE (depth×width) matrix."""

    def __init__(self, *, width: int = 2048, depth: int = 5, seed: int = 1754,
                 matrix: np.ndarray | None = None, total: float = 0.0):
        self.width, self.depth, self.seed = int(width), int(depth), int(seed)
        self.matrix = (np.zeros((depth, width), np.float64)
                       if matrix is None else matrix)
        self.total = float(total)

    def _positions(self, keys: np.ndarray) -> np.ndarray:
        """(depth, n) counter columns — one vectorized hash pass per row."""
        from ballet_ray.functions.hashing import mix, splitmix64
        from ballet_ray.functions.partition import stable_hash_array

        h = stable_hash_array(np.asarray(keys))
        out = np.empty((self.depth, len(h)), np.int64)
        for r in range(self.depth):
            out[r] = (mix(h, splitmix64(np.uint64(self.seed + r)))
                      % np.uint64(self.width)).astype(np.int64)
        return out

    def update(self, keys, counts=None) -> "CountMinSketch":
        keys = np.asarray(keys)
        if not len(keys):
            return self
        w = (np.ones(len(keys), np.float64) if counts is None
             else np.asarray(counts, np.float64))
        pos = self._positions(keys)
        for r in range(self.depth):
            self.matrix[r] += np.bincount(pos[r], weights=w, minlength=self.width)
        self.total += float(w.sum())
        return self

    def query(self, keys) -> np.ndarray:
        keys = np.asarray(keys)
        if not len(keys):
            return np.zeros(0, np.float64)
        pos = self._positions(keys)
        ests = np.stack([self.matrix[r][pos[r]] for r in range(self.depth)])
        return ests.min(axis=0)

    def merge(self, other: "CountMinSketch") -> "CountMinSketch":
        if (other.width, other.depth, other.seed) != (self.width, self.depth, self.seed):
            raise ValueError("can only merge sketches with identical geometry")
        self.matrix += other.matrix
        self.total += other.total
        return self


def count_min(ds, col: str, *, width: int = 2048, depth: int = 5,
              count_col: str | None = None, seed: int = 1754) -> CountMinSketch:
    """Fit a Count-Min sketch over a column in ONE streaming pass
    (per-block partial matrices, tree-reduced; the driver receives exactly
    one depth×width float64 matrix — 80 KB at the defaults). Pass
    ``count_col`` to weight each row (pre-aggregated (key, count) input)."""
    from ballet_ray.stages.decomposition import vector_sum_reduce

    cols = [col] + ([count_col] if count_col else [])
    proto = CountMinSketch(width=width, depth=depth, seed=seed)

    def vec(t: pa.Table) -> np.ndarray:
        s = CountMinSketch(width=width, depth=depth, seed=seed)
        keys = t.column(col).to_numpy(zero_copy_only=False)
        w = (t.column(count_col).to_numpy(zero_copy_only=False)
             if count_col else None)
        s.update(keys, w)
        return np.concatenate(([s.total], s.matrix.ravel()))

    v = vector_sum_reduce(ds.select_columns(cols), vec)
    return CountMinSketch(width=width, depth=depth, seed=seed,
                          matrix=v[1:].reshape(depth, width), total=float(v[0]))
