"""Deterministic corpus sampling — hash-priority, not RNG.

Corpus pipelines need samples that are (a) reproducible across runs,
partitionings and cluster sizes, (b) resumable (a re-run keeps the same
rows), and (c) SQL-auditable. All three follow from ordering/thresholding
on a content hash instead of a random() draw:

- :func:`stratified_sample` — exactly ``n`` rows per group, the rows with
  the smallest ``md5(salt || key)`` priority (a deterministic per-group
  uniform sample). Per-batch local top-n (so the shuffle carries at most
  n×groups rows per block), then a tiny per-group merge.
- :func:`hash_rate_filter` — Bernoulli(rate) by hash threshold, with
  per-group rates (corpus mixture weighting: sample source A at 10%,
  source B at 100%). Pure row-wise filter, zero shuffle.

DuckDB parity: priority = ``md5(salt || CAST(key AS VARCHAR))`` ordered
as a hex string (fixed-width hex ⇒ lexicographic = numeric), threshold =
first-8-hex-digits / 2^32 (same construction as core.HashSplit).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc


def _md5_hex(keys: list, salt: str) -> np.ndarray:
    md5 = hashlib.md5
    pre = salt.encode()
    return np.asarray([md5(pre + str(k).encode()).hexdigest() for k in keys], dtype=object)


def _priority_u(keys: np.ndarray, salt: str, method: str) -> np.ndarray:
    """Uniform-[0,1) priority per key. method='md5' is row-wise Python but
    SQL-auditable (``int(md5(salt||key)[:8],16)/2^32``); method='siphash'
    is one vectorized pass — the corpus-scale mode when the oracle
    doesn't need to reproduce the draw in SQL."""
    if method == "siphash":
        from ballet_ray.functions.partition import stable_hash_array

        salted = np.asarray([salt + str(k) for k in keys], dtype=object) if salt else (
            keys if keys.dtype == object else keys.astype(object)
        )
        return stable_hash_array(salted) / 2.0**64
    hexes = _md5_hex(list(keys), salt)
    return np.asarray([int(h[:8], 16) for h in hexes], dtype=np.float64) / 2.0**32


def stratified_sample(ds, *, group_col: str, key_col: str, n: int, salt: str = ""):
    """The ``n`` smallest-priority rows of every group (ties broken by key).

    Returns (group_col, key_col) rows. Exact and deterministic: equivalent
    to ``ROW_NUMBER() OVER (PARTITION BY g ORDER BY md5(salt||key), key)
    <= n``.
    """

    def local_top(t: pa.Table) -> pa.Table:
        g = t.column(group_col).to_numpy(zero_copy_only=False)
        k = t.column(key_col).to_numpy(zero_copy_only=False)
        prio = _md5_hex(k.tolist(), salt)
        order = np.lexsort((k, prio, g))
        gs = g[order]
        # position within group run (groups are contiguous after lexsort)
        new = np.concatenate([[True], gs[1:] != gs[:-1]])
        run_start = np.maximum.accumulate(np.where(new, np.arange(len(gs)), 0))
        pos = np.arange(len(gs)) - run_start
        sel = order[pos < n]
        return pa.table(
            {
                group_col: t.column(group_col).take(pa.array(sel)),
                key_col: t.column(key_col).take(pa.array(sel)),
                "__prio": pa.array(prio[sel]),
            }
        )

    def merge(grp: pd.DataFrame) -> pd.DataFrame:
        out = grp.sort_values(["__prio", key_col]).head(n)
        return out[[group_col, key_col]]

    parts = ds.select_columns([group_col, key_col]).map_batches(local_top, batch_format="pyarrow")
    return parts.groupby(group_col).map_groups(merge, batch_format="pandas")


def hash_rate_filter(
    ds, *, key_col: str, rate: float | None = None, rates: dict | None = None,
    group_col: str | None = None, salt: str = "", method: str = "md5",
):
    """Keep rows where ``u = int(md5(salt||key)[:8], 16)/2^32 < rate``;
    with ``rates`` + ``group_col`` the threshold is per group (mixture
    weighting). Stateless row filter — streams, never shuffles, and the
    kept set is independent of partitioning (resume-safe)."""
    if (rate is None) == (rates is None):
        raise ValueError("pass exactly one of rate / rates")
    if rates is not None and group_col is None:
        raise ValueError("rates requires group_col")

    def f(t: pa.Table) -> pa.Table:
        k = t.column(key_col).to_numpy(zero_copy_only=False)
        u = _priority_u(k, salt, method)
        if rates is None:
            mask = u < rate
        else:
            g = t.column(group_col).to_numpy(zero_copy_only=False)
            thr = np.asarray([rates.get(x, 0.0) for x in g])
            mask = u < thr
        return t.filter(pa.array(mask))

    return ds.map_batches(f, batch_format="pyarrow")


def global_shuffle_index(ds, *, key_col: str, salt: str = "", bucket_col: str | None = None,
                         n_buckets: int | None = None):
    """Deterministic global shuffle order for training epochs: every row
    gets a dense 0..N-1 ``shuffle_idx`` equal to its rank under
    ``ORDER BY md5(salt||key), key`` — a reproducible random permutation
    that is independent of partitioning and cluster size (re-runs and
    resumes see the identical epoch order, unlike ``random_shuffle``).

    With ``bucket_col`` (an int column in [0, n_buckets), e.g. a
    difficulty tier) the order becomes CURRICULUM order:
    ``ORDER BY bucket, md5(salt||key), key`` — buckets in sequence,
    hash-shuffled within each bucket.

    Two passes: (1) a counts-only pre-pass over (bucket ×) 4096
    hex-prefix bins (the bin id is the priority's first 3 hex digits, so
    bin order == priority order) gives the driver one offset table; (2)
    one bin-keyed shuffle sorts each bin locally by (priority, key) and
    adds its offset. The payload moves through exactly one all-to-all,
    which is the lower bound for materializing a global permutation.
    """
    import ray as _ray

    HB = 4096
    NB = HB * (n_buckets if bucket_col else 1)
    if bucket_col and not n_buckets:
        raise ValueError("bucket_col requires n_buckets")

    def add_bin(t: pa.Table) -> pa.Table:
        k = t.column(key_col).to_numpy(zero_copy_only=False)
        prio = _md5_hex(k.tolist(), salt)
        bins = np.asarray([int(p[:3], 16) for p in prio], dtype=np.int64)
        if bucket_col:
            b = t.column(bucket_col).to_numpy(zero_copy_only=False).astype(np.int64)
            bins = b * HB + bins
        return t.append_column("__prio", pa.array(prio)).append_column("__bin", pa.array(bins))

    binned = ds.map_batches(add_bin, batch_format="pyarrow")

    # counts pre-pass on a keys-only projection — the payload does not
    # move until the single indexing shuffle
    narrow_cols = [key_col] + ([bucket_col] if bucket_col else [])
    counts = (
        ds.select_columns(narrow_cols)
        .map_batches(add_bin, batch_format="pyarrow")
        .groupby("__bin")
        .count()
        .to_pandas()
    )
    offs = np.zeros(NB + 1, np.int64)
    offs[counts["__bin"].to_numpy() + 1] = counts["count()"].to_numpy()
    offs = np.cumsum(offs)
    oref = _ray.put(offs)

    def index_bin(t: pa.Table) -> pa.Table:
        off = _ray.get(oref)
        prio = np.asarray(t.column("__prio").to_pylist(), dtype=object)
        keys = t.column(key_col).to_numpy(zero_copy_only=False)
        b = int(t.column("__bin")[0].as_py())
        order = np.lexsort((keys, prio))
        idx = np.empty(len(order), np.int64)
        idx[order] = off[b] + np.arange(len(order))
        return t.drop_columns(["__prio", "__bin"]).append_column("shuffle_idx", pa.array(idx))

    return binned.groupby("__bin").map_groups(index_bin, batch_format="pyarrow")
