"""Deterministic corpus sampling — hash-priority, not RNG.

Corpus pipelines need samples that are (a) reproducible across runs,
partitionings and cluster sizes, (b) resumable (a re-run keeps the same
rows), and (c) auditable. All three follow from ordering/thresholding
on a content hash instead of a random() draw:

- :func:`stratified_sample` — exactly ``n`` rows per group, the rows with
  the smallest hash priority (a deterministic per-group uniform sample).
  Per-batch local top-n (so the shuffle carries at most n×groups rows per
  block), then a tiny per-group merge.
- :func:`hash_rate_filter` — Bernoulli(rate) by hash threshold, with
  per-group rates (corpus mixture weighting: sample source A at 10%,
  source B at 100%). Pure row-wise filter, zero shuffle.
- :func:`global_shuffle_index` — a dense reproducible permutation
  (epoch order / curriculum order) with ONE payload all-to-all.

Two hash modes everywhere, ``method=``:

- ``"siphash"`` (DEFAULT) — pandas' siphash-based ``hash_array`` +
  splitmix mixing for the salt: one vectorized pass, no per-row Python.
  This is the corpus-scale mode: at 10^12 rows a per-row Python md5 is
  ~µs/row of pure interpreter time and dominates the stage.
- ``"md5"`` — the SQL-audit mode the DuckDB oracles reproduce
  (priority = ``md5(salt || CAST(key AS VARCHAR))`` ordered as a hex
  string — fixed-width hex ⇒ lexicographic = numeric; threshold =
  first-8-hex-digits / 2^32, same construction as core.HashSplit).
  Row-wise Python; keep it for audits and small interactive runs.
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


def _salt_seed(salt: str) -> np.uint64:
    """Deterministic uint64 seed from a salt string (one md5, not per row)."""
    return np.uint64(int(hashlib.md5(salt.encode()).hexdigest()[:16], 16))


def _sip_u64(keys: np.ndarray, salt: str) -> np.ndarray:
    """Vectorized stable uint64 priority of an array of keys. One
    ``pd.util.hash_array`` pass (cython) + one splitmix mix for the salt —
    no per-row Python."""
    from ballet_ray.functions.hashing import mix
    from ballet_ray.functions.partition import stable_hash_array

    h = stable_hash_array(np.asarray(keys))
    if salt:
        h = mix(h, _salt_seed(salt))
    return h


def _priority_u(keys: np.ndarray, salt: str, method: str) -> np.ndarray:
    """Uniform-[0,1) priority per key (see module docstring for modes)."""
    if method == "siphash":
        return _sip_u64(keys, salt) / 2.0**64
    if method != "md5":
        raise ValueError("method must be 'md5' or 'siphash'")
    hexes = _md5_hex(list(keys), salt)
    return np.asarray([int(h[:8], 16) for h in hexes], dtype=np.float64) / 2.0**32


def _priority_sortable(keys: np.ndarray, salt: str, method: str) -> np.ndarray:
    """Sortable priority array: uint64 (siphash) or hex strings (md5)."""
    if method == "siphash":
        return _sip_u64(keys, salt)
    if method != "md5":
        raise ValueError("method must be 'md5' or 'siphash'")
    return _md5_hex(list(keys), salt)


def stratified_sample(
    ds, *, group_col: str, key_col: str, n: int, salt: str = "", method: str = "siphash"
):
    """The ``n`` smallest-priority rows of every group (ties broken by key).

    Returns (group_col, key_col) rows. Exact and deterministic: with
    ``method='md5'`` equivalent to ``ROW_NUMBER() OVER (PARTITION BY g
    ORDER BY md5(salt||key), key) <= n`` (the oracle form); the default
    siphash mode is the same construction over the vectorized hash.
    """

    def local_top(t: pa.Table) -> pa.Table:
        g = t.column(group_col).to_numpy(zero_copy_only=False)
        k = t.column(key_col).to_numpy(zero_copy_only=False)
        prio = _priority_sortable(k, salt, method)
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

    # coarse-partition merge: hash-partition GROUPS so each task reduces
    # many groups in ONE vectorized pandas pass (sort + groupby.head is
    # C-level). A per-group map_groups pays Ray's ~60-80 µs/group combine
    # — 16 s for 200k domains, unusable at a web-scale group count.
    from ballet_ray.functions.partition import default_coarse_parts

    n_parts = default_coarse_parts()

    def add_part(t: pa.Table) -> pa.Table:
        from ballet_ray.functions.partition import stable_hash_array

        h = stable_hash_array(t.column(group_col).to_numpy(zero_copy_only=False))
        return t.append_column(
            "__part", pa.array((h % np.uint64(n_parts)).astype(np.int64)))

    def merge_part(grp: pd.DataFrame) -> pd.DataFrame:
        out = (grp.sort_values(["__prio", key_col], kind="mergesort")
               .groupby(group_col, sort=False).head(n))
        return out[[group_col, key_col]]

    parts = ds.select_columns([group_col, key_col]).map_batches(local_top, batch_format="pyarrow")
    return (parts.map_batches(add_part, batch_format="pyarrow")
            .groupby("__part").map_groups(merge_part, batch_format="pandas"))


def cap_per_group(
    ds, *, group_col: str, key_col: str, cap: int, salt: str = "",
    method: str = "siphash", broadcast_limit: int = 2_000_000,
    num_partitions: int | None = None,
):
    """Keep at most ``cap`` FULL rows per group — the RefinedWeb/C4
    "≤ N documents per domain" rule — deterministically (the ``cap``
    smallest hash priorities, the :func:`stratified_sample` winners) and
    independent of partitioning, so a resumed run keeps the same rows.

    ``key_col`` must uniquely identify rows (it is the sampling and
    membership key — ``doc_id`` in the canonical tables).

    Scale shape: the winner set is bounded by ``cap × groups`` (the LOSER
    set is corpus-sized when a hot domain overflows — the inverse of
    exact_dedup's trade, so this filters on winners). The winner pass
    shuffles (group, key, priority) rows only; the payload is then either
    filtered in place (winner ids broadcast, below ``broadcast_limit``)
    or moved once through a distributed id join above it. When no group
    exceeds the cap the result equals the input (every row wins).
    """
    if cap < 1:
        raise ValueError("cap must be >= 1")
    from ballet_ray.stages.joins import (
        default_join_partitions,
        hash_join,
        scrub_empty_blocks,
        semi_join_filter,
    )

    winners = stratified_sample(
        ds, group_col=group_col, key_col=key_col, n=cap, salt=salt, method=method
    ).materialize()
    # No identity shortcut: comparing against ds.count() would execute a
    # non-materialized upstream for a whole extra pass, and the membership
    # filter is already exact (under-cap groups keep every row).
    n_win = winners.count()
    if n_win <= broadcast_limit:
        ids = winners.to_pandas()[key_col].to_numpy()
        return semi_join_filter(ds, ids, key=key_col)
    # distributed path: winners come out of a pandas map_groups, which can
    # emit schema-less empty blocks that poison the join — scrub first
    keys = scrub_empty_blocks(winners.select_columns([key_col]))
    return hash_join(ds, keys, on=(key_col,),
                     num_partitions=default_join_partitions(num_partitions))


def filter_groups(
    ds, *, group_col: str, agg: str = "count", value_col: str | None = None,
    min_value: float | None = None, max_value: float | None = None,
    invert: bool = False, broadcast_limit: int = 2_000_000,
    num_partitions: int | None = None,
):
    """Keep (or with ``invert`` drop) every row of the GROUPS whose
    aggregate passes ``[min_value, max_value]`` — the FineWeb-style
    "drop whole domains below the quality bar / with fewer than N docs"
    rule, as one operator: group-level statistics decide, row-level
    content flows.

    ``agg``: ``count`` (default; no ``value_col`` needed), or
    ``sum | mean | min | max`` of ``value_col``. Rows with a null group
    never pass.

    Scale shape: the only all-to-all carries one partial row per
    (batch, group) — the payload never shuffles; the passing-group set
    (bounded by the distinct-group count) is broadcast below
    ``broadcast_limit`` and joined distributed above it.
    """
    if agg not in ("count", "sum", "mean", "min", "max"):
        raise ValueError("agg must be count/sum/mean/min/max")
    if agg != "count" and value_col is None:
        raise ValueError(f"agg={agg!r} needs value_col")
    if min_value is None and max_value is None:
        raise ValueError("pass min_value and/or max_value")
    from ballet_ray.functions.reduce import grouped_reduce
    from ballet_ray.stages.joins import (
        default_join_partitions,
        hash_join,
        scrub_empty_blocks,
        semi_join_filter,
    )

    def partials(t: pa.Table) -> pa.Table:
        cols = {group_col: t.column(group_col),
                "__one": pa.array(np.ones(len(t), np.int64))}
        if value_col is not None:
            cols["__val"] = t.column(value_col)
        return pa.table(cols)

    spec = {"__one": "sum"}
    if agg in ("sum", "mean"):
        spec["__val"] = "sum"
    elif agg in ("min", "max"):
        spec["__val"] = agg
    stats = grouped_reduce(
        ds.map_batches(partials, batch_format="pyarrow"), group_col, spec,
        pre_combine=True,
    ).to_pandas()
    stats = stats[stats[group_col].notna()]
    if agg == "count":
        v = stats["__one"].astype(float)
    elif agg == "mean":
        v = stats["__val"].astype(float) / stats["__one"].astype(float)
    else:
        v = stats["__val"].astype(float)
    ok = np.ones(len(stats), bool)
    if min_value is not None:
        ok &= (v >= min_value).to_numpy()
    if max_value is not None:
        ok &= (v <= max_value).to_numpy()
    keep = stats.loc[~ok if invert else ok, [group_col]]
    if len(keep) <= broadcast_limit:
        return semi_join_filter(ds, keep[group_col].to_numpy(), key=group_col)
    import ray.data as rd

    return hash_join(ds, scrub_empty_blocks(rd.from_pandas(keep)),
                     on=(group_col,),
                     num_partitions=default_join_partitions(num_partitions))


def hash_rate_filter(
    ds, *, key_col: str, rate: float | None = None, rates: dict | None = None,
    group_col: str | None = None, salt: str = "", method: str = "siphash",
):
    """Keep rows where the key's uniform hash priority is below ``rate``;
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
                         n_buckets: int | None = None, method: str = "siphash"):
    """Deterministic global shuffle order for training epochs: every row
    gets a dense 0..N-1 ``shuffle_idx`` equal to its rank under
    ``ORDER BY priority(salt||key), key`` — a reproducible random
    permutation that is independent of partitioning and cluster size
    (re-runs and resumes see the identical epoch order, unlike
    ``random_shuffle``).

    With ``bucket_col`` (an int column in [0, n_buckets), e.g. a
    difficulty tier) the order becomes CURRICULUM order:
    ``ORDER BY bucket, priority, key`` — buckets in sequence,
    hash-shuffled within each bucket.

    Execution: the binned payload is hashed ONCE and materialized; the
    counts pre-pass runs over its (already hashed) bin column and gives
    the driver one 4096-bin offset table, then the single bin-keyed
    shuffle sorts each bin locally by (priority, key) and adds its
    offset. The payload moves through exactly one all-to-all — the lower
    bound for materializing a global permutation — and each row is
    hashed exactly once (the r3 version hashed twice: once in the counts
    pass, once in the payload pass).
    """
    import ray as _ray

    HB = 4096
    NB = HB * (n_buckets if bucket_col else 1)
    if bucket_col and not n_buckets:
        raise ValueError("bucket_col requires n_buckets")
    if method not in ("md5", "siphash"):
        raise ValueError("method must be 'md5' or 'siphash'")

    def add_bin(t: pa.Table) -> pa.Table:
        k = t.column(key_col).to_numpy(zero_copy_only=False)
        prio = _priority_sortable(k, salt, method)
        if method == "siphash":
            # top 12 bits: bin order == priority order (needed for dense
            # global ranks from per-bin offsets)
            bins = (prio >> np.uint64(52)).astype(np.int64)
        else:
            bins = np.asarray([int(p[:3], 16) for p in prio], dtype=np.int64)
        if bucket_col:
            b = t.column(bucket_col).to_numpy(zero_copy_only=False).astype(np.int64)
            bins = b * HB + bins
        return t.append_column("__prio", pa.array(prio)).append_column("__bin", pa.array(bins))

    # hash once: materialize the binned payload (spillable in the object
    # store — the same bytes the shuffle below holds in flight anyway),
    # then both the counts pre-pass and the indexing pass reuse it without
    # re-reading or re-hashing the input
    binned = ds.map_batches(add_bin, batch_format="pyarrow").materialize()

    # counts pre-pass: per-batch bincount partials (≤4096 rows per block)
    # merged by the vectorized coarse-partition grouped_reduce — BOTH
    # Ray-native alternatives re-shuffle or burn per-group Python
    # (groupby().count() moves every row again: 10 s of a 17 s 4M-row
    # stage; groupby().sum() on the partials pays ~60 µs/key/task in
    # AggregateFn combine: 8.6 s for 4096 keys)
    def bin_counts_partial(t: pa.Table) -> pa.Table:
        b = t.column("__bin").to_numpy(zero_copy_only=False)
        u, c = np.unique(b, return_counts=True)
        return pa.table({"__bin": pa.array(u), "n": pa.array(c.astype(np.int64))})

    from ballet_ray.functions.reduce import grouped_reduce

    counts = grouped_reduce(
        binned.select_columns(["__bin"]).map_batches(bin_counts_partial, batch_format="pyarrow"),
        "__bin",
        {"n": "sum"},
        num_parts=16,
    ).to_pandas()
    offs = np.zeros(NB + 1, np.int64)
    offs[counts["__bin"].to_numpy() + 1] = counts["n"].to_numpy()
    offs = np.cumsum(offs)
    oref = _ray.put(offs)

    def index_bin(t: pa.Table) -> pa.Table:
        off = _ray.get(oref)
        if method == "siphash":
            prio = t.column("__prio").to_numpy(zero_copy_only=False)
        else:
            prio = np.asarray(t.column("__prio").to_pylist(), dtype=object)
        keys = t.column(key_col).to_numpy(zero_copy_only=False)
        b = int(t.column("__bin")[0].as_py())
        order = np.lexsort((keys, prio))
        idx = np.empty(len(order), np.int64)
        idx[order] = off[b] + np.arange(len(order))
        return t.drop_columns(["__prio", "__bin"]).append_column("shuffle_idx", pa.array(idx))

    return binned.groupby("__bin").map_groups(index_bin, batch_format="pyarrow")


def temperature_rates(ds, *, group_col: str, alpha: float = 0.3,
                      target_total: float | None = None,
                      count_col: str | None = None) -> dict:
    """Per-group keep rates for temperature-based mixture sampling (the
    mT5/XLM-R multilingual recipe): sample source ``g`` in proportion to
    ``p_g ** alpha`` where ``p_g`` is its corpus share — ``alpha < 1``
    flattens the mixture toward low-resource groups, ``alpha = 1`` keeps
    natural proportions. Returns ``{group: rate}`` for
    :func:`hash_rate_filter` (rates are keep PROBABILITIES, capped at 1 —
    a filter can down-sample only; the group that would need up-sampling
    anchors the scale when ``target_total`` is not given).

    ``count_col`` weights sizes by a column (e.g. ``n_tok`` for
    token-level shares); ``target_total`` asks for an expected total of
    that many rows/tokens in the output.

    One tiny grouped reduction (the driver sees one row per group) —
    compose with :func:`hash_rate_filter` for a deterministic,
    resume-safe streaming mixture.
    """
    from ballet_ray.functions.reduce import grouped_reduce

    if count_col:
        sizes = grouped_reduce(
            ds.select_columns([group_col, count_col]), group_col,
            {count_col: "sum"}, pre_combine=True,
        ).to_pandas().rename(columns={count_col: "n"})
    else:
        def ones(t: pa.Table) -> pa.Table:
            return t.append_column("__one", pa.array(np.ones(len(t), np.int64)))

        sizes = grouped_reduce(
            ds.select_columns([group_col]).map_batches(ones, batch_format="pyarrow"),
            group_col, {"__one": "sum"}, pre_combine=True,
        ).to_pandas().rename(columns={"__one": "n"})
    if not len(sizes) or "n" not in sizes.columns:
        return {}
    n = sizes["n"].to_numpy(dtype=np.float64)
    if not len(n) or n.sum() <= 0:
        return {}
    p = n / n.sum()
    q = p**alpha
    q /= q.sum()
    if target_total is None:
        # largest feasible mixture with the exact q proportions: scale so
        # the tightest group keeps 100%
        target_total = float(np.min(n / q))
    rates = np.minimum(1.0, target_total * q / n)
    return {g: float(r) for g, r in zip(sizes[group_col], rates)}


def temperature_sample(ds, *, group_col: str, key_col: str, alpha: float = 0.3,
                       target_total: float | None = None,
                       count_col: str | None = None, salt: str = "",
                       method: str = "siphash"):
    """Temperature-flattened mixture in one pass: compute
    :func:`temperature_rates`, then stream through
    :func:`hash_rate_filter` — deterministic and resume-safe."""
    rates = temperature_rates(ds, group_col=group_col, alpha=alpha,
                              target_total=target_total, count_col=count_col)
    return hash_rate_filter(ds, key_col=key_col, rates=rates,
                            group_col=group_col, salt=salt, method=method)


def unimax_rates(ds, *, group_col: str, budget: float, max_epochs: float = 1.0,
                 count_col: str | None = None) -> dict:
    """Per-group sampling rates for UniMax mixture allocation (Chung et
    al. 2023, arXiv:2304.09151): distribute ``budget`` rows/tokens as
    UNIFORMLY as possible across groups, subject to a per-group cap of
    ``max_epochs`` passes over its data — the fairness-first multilingual
    recipe (temperature sampling over-samples mid-resource groups and
    still starves the tail; UniMax gives every group the same allocation
    unless its epoch cap binds first).

    Water-filling: find the level ``t`` with ``Σ_g min(max_epochs·c_g, t)
    = budget``; group g's allocation is ``min(max_epochs·c_g, t)`` and its
    rate ``alloc_g / c_g ∈ (0, max_epochs]`` — rates above 1 mean
    up-sampling (extra epochs), materialized by :func:`unimax_sample`.

    One tiny grouped reduction (the driver sees one row per group, then a
    k-element water-fill). ``count_col`` switches sizes to token units
    (e.g. ``n_tok``). The fill mirrors the SQL-oracle formulation
    term-for-term (same candidate expression, same (cap, group) ordering,
    same max-over-feasible-candidates) so both sides agree bit-for-bit.
    """
    from ballet_ray.functions.reduce import grouped_reduce

    if budget <= 0:
        raise ValueError(f"budget must be positive, got {budget}")
    if max_epochs <= 0:
        raise ValueError(f"max_epochs must be positive, got {max_epochs}")
    if count_col:
        sizes = grouped_reduce(
            ds.select_columns([group_col, count_col]), group_col,
            {count_col: "sum"}, pre_combine=True,
        ).to_pandas().rename(columns={count_col: "n"})
    else:
        def ones(t: pa.Table) -> pa.Table:
            return t.append_column("__one", pa.array(np.ones(len(t), np.int64)))

        sizes = grouped_reduce(
            ds.select_columns([group_col]).map_batches(ones, batch_format="pyarrow"),
            group_col, {"__one": "sum"}, pre_combine=True,
        ).to_pandas().rename(columns={"__one": "n"})
    if not len(sizes) or "n" not in sizes.columns:
        return {}
    # ascending (cap, group) order — the cum/candidate arithmetic below
    # must match the SQL oracle's window ordering exactly
    sizes = sizes.assign(__cap=sizes["n"].astype(np.float64) * max_epochs)
    sizes = sizes.sort_values(["__cap", group_col]).reset_index(drop=True)
    c = sizes["n"].to_numpy(dtype=np.float64)
    cap = sizes["__cap"].to_numpy()
    k = len(cap)
    cum = np.cumsum(cap)
    prev_cap = np.concatenate([[0.0], cap[:-1]])
    cand = (budget - (cum - cap)) / (k - np.arange(k))
    valid = (cand >= prev_cap) & (cand <= cap)
    level = float(cand[valid].max()) if valid.any() else None
    alloc = cap if level is None else np.minimum(cap, level)
    rates = alloc / c
    return {g: float(r) for g, r in zip(sizes[group_col], rates)}


def unimax_sample(ds, *, group_col: str, key_col: str, budget: float,
                  max_epochs: float = 1.0, count_col: str | None = None,
                  salt: str = "", method: str = "siphash",
                  epoch_col: str = "epoch"):
    """UniMax mixture in one pass: :func:`unimax_rates`, then a map-only
    epoch expansion — each row appears ``floor(r)`` times (epochs
    0..floor(r)-1) plus once more when its deterministic hash uniform is
    below the fractional remainder, with the epoch number in
    ``epoch_col``. Rates ≤ 1 degenerate to a plain streaming filter
    (epoch 0 only); rates > 1 up-sample (the cap-bound tail groups get
    whole extra passes). Deterministic, partition-invariant, resume-safe
    — no shuffle anywhere."""
    rates = unimax_rates(ds, group_col=group_col, budget=budget,
                         max_epochs=max_epochs, count_col=count_col)

    def f(t: pa.Table) -> pa.Table:
        g = t.column(group_col).to_numpy(zero_copy_only=False)
        r = np.asarray([rates.get(x, 0.0) for x in g], dtype=np.float64)
        e_full = np.floor(r).astype(np.int64)
        keys = t.column(key_col).to_numpy(zero_copy_only=False)
        u = _priority_u(keys, salt, method)
        reps = e_full + (u < (r - e_full))
        idx = np.repeat(np.arange(len(reps)), reps)
        out = t.take(pa.array(idx))
        starts = np.repeat(np.cumsum(reps) - reps, reps)
        epoch = np.arange(len(idx), dtype=np.int64) - starts
        return out.append_column(epoch_col, pa.array(epoch))

    return ds.map_batches(f, batch_format="pyarrow")


def weighted_sample(
    ds, *, key_col: str, weight_col: str, n: int, group_col: str | None = None,
    salt: str = "", method: str = "siphash",
):
    """Weighted sampling WITHOUT replacement (Efraimidis-Spirakis 2006
    A-ES): keep the ``n`` rows with the smallest exponential race time
    ``-ln(u)/w`` where ``u`` is the key's deterministic uniform hash
    priority — each row's inclusion probability is proportional to its
    weight, drawn without replacement, and the selection is reproducible
    across runs/partitionings/cluster sizes (same contract as
    :func:`stratified_sample`; change ``salt`` for a fresh draw).

    With ``group_col``, ``n`` rows per group. Rows with weight <= 0 or a
    null weight are never selected. Scale shape: per-batch local top-n
    (the shuffle carries at most n rows per block per group), then one
    tiny per-group merge. Returns ([group_col,] key_col, weight_col).
    """
    cols = ([group_col] if group_col else []) + [key_col, weight_col]

    def add_race(t: pa.Table) -> pa.Table:
        k = t.column(key_col).to_numpy(zero_copy_only=False)
        w = t.column(weight_col).to_numpy(zero_copy_only=False).astype(np.float64)
        u = _priority_u(k, salt, method)
        # clamp u away from 0 so -ln(u) is finite; 2^-64 is below any
        # attainable siphash priority and any md5 32-bit priority
        race = -np.log(np.maximum(u, 2.0**-64))
        with np.errstate(divide="ignore", invalid="ignore"):
            race = race / w
        race[~(w > 0)] = np.inf  # non-positive / NaN weights never win
        return t.append_column("__race", pa.array(race))

    def local_top(t: pa.Table) -> pa.Table:
        t = add_race(t)
        race = t.column("__race").to_numpy(zero_copy_only=False)
        k = t.column(key_col).to_numpy(zero_copy_only=False)
        if group_col:
            g = t.column(group_col).to_numpy(zero_copy_only=False)
            order = np.lexsort((k, race, g))
            gs = g[order]
            new = np.concatenate([[True], gs[1:] != gs[:-1]])
            run_start = np.maximum.accumulate(np.where(new, np.arange(len(gs)), 0))
            pos = np.arange(len(gs)) - run_start
            sel = order[pos < n]
        else:
            order = np.lexsort((k, race))
            sel = order[:n]
        sel = sel[np.isfinite(race[sel])]
        out = t.take(pa.array(sel))
        if not group_col:
            out = out.append_column("__g", pa.array(np.zeros(len(out), np.int8)))
        return out

    # coarse-partition merge (see stratified_sample): hash-partition the
    # GROUPS, reduce each partition's groups in one vectorized pandas pass
    gcol = group_col or "__g"
    from ballet_ray.functions.partition import default_coarse_parts

    n_parts = default_coarse_parts()

    def add_part(t: pa.Table) -> pa.Table:
        from ballet_ray.functions.partition import stable_hash_array

        h = stable_hash_array(t.column(gcol).to_numpy(zero_copy_only=False))
        return t.append_column(
            "__part", pa.array((h % np.uint64(n_parts)).astype(np.int64)))

    def merge_part(grp: pd.DataFrame) -> pd.DataFrame:
        out = (grp.sort_values(["__race", key_col], kind="mergesort")
               .groupby(gcol, sort=False).head(n))
        return out[cols]

    parts = ds.select_columns(cols).map_batches(local_top, batch_format="pyarrow")
    return (parts.map_batches(add_part, batch_format="pyarrow")
            .groupby("__part").map_groups(merge_part, batch_format="pandas"))


def budget_sample(ds, *, group_col: str, key_col: str, token_col: str,
                  budgets: dict, salt: str = "", method: str = "siphash"):
    """Token-budget mixture construction: per group (source/domain), keep
    the hash-priority prefix of rows whose cumulative ``token_col`` stays
    within ``budgets[group]`` — "30 B tokens of web, 5 B of books", the
    pretraining-mix staple. Deterministic (pure content hash ⇒ same mix on
    any partitioning/cluster/run, resume-safe), unbiased within a group,
    and groups absent from ``budgets`` are dropped.

    Selection rule: order each group by (priority, key); keep the maximal
    PREFIX with running token sum ≤ budget (stop at first overflow — a
    prefix, not a knapsack, so the cut is reproducible and auditable).

    Scale shape (the counts-bin pattern of :func:`global_shuffle_index`):

    1. One map-only partials pass → (group, 4096-bin, Σtokens) via a
       coarse-partition grouped_reduce; the driver sees ≤ groups×4096
       rows, never data.
    2. The driver picks each group's boundary bin + residual budget.
    3. One map-only FILTER keeps bins strictly inside; only the ~1/4096
       boundary-bin slice of each group shuffles (one tiny map_groups) to
       resolve the exact cut. The kept payload never moves.
    """
    import ray as _ray

    if method not in ("md5", "siphash"):
        raise ValueError("method must be 'md5' or 'siphash'")
    HB = 4096

    def add_bin_cols(t: pa.Table) -> pa.Table:
        k = t.column(key_col).to_numpy(zero_copy_only=False)
        prio = _priority_sortable(k, salt, method)
        if method == "siphash":
            bins = (prio >> np.uint64(52)).astype(np.int64)
        else:
            bins = np.asarray([int(p[:3], 16) for p in prio], dtype=np.int64)
        return (t.append_column("__prio", pa.array(prio))
                 .append_column("__bin", pa.array(bins)))

    binned = ds.map_batches(add_bin_cols, batch_format="pyarrow").materialize()

    def partials(t: pa.Table) -> pa.Table:
        import pandas as pd  # noqa: F811

        g = t.column(group_col).to_numpy(zero_copy_only=False)
        b = t.column("__bin").to_numpy(zero_copy_only=False)
        tok = t.column(token_col).to_numpy(zero_copy_only=False).astype(np.int64)
        df = pd.DataFrame({"g": g, "b": b, "tok": tok})
        agg = df.groupby(["g", "b"], sort=False)["tok"].sum().reset_index()
        return pa.table({"g": pa.array(agg["g"]), "b": pa.array(agg["b"].astype(np.int64)),
                         "tok": pa.array(agg["tok"].astype(np.int64))})

    from ballet_ray.functions.reduce import grouped_reduce

    stats = grouped_reduce(
        binned.select_columns([group_col, "__bin", token_col]).map_batches(
            partials, batch_format="pyarrow"
        ),
        ["g", "b"],
        {"tok": "sum"},
        num_parts=16,
    ).to_pandas().sort_values(["g", "b"])

    # driver decision: per group, boundary bin + residual budget
    plan = {}  # group(str) -> (boundary_bin, residual); bins < boundary are fully kept
    for g, grp in stats.groupby("g", sort=False):
        if g not in {str(k) for k in budgets}:
            continue
        budget = int({str(k): v for k, v in budgets.items()}[g])
        cum = 0
        boundary, residual = HB, 0  # default: everything fits
        for b, tok in zip(grp["b"], grp["tok"]):
            if cum + tok > budget:
                boundary, residual = int(b), budget - cum
                break
            cum += tok
        plan[str(g)] = (boundary, residual)
    pref = _ray.put(plan)

    def _bounds_of(t: pa.Table, p: dict) -> np.ndarray:
        """Per-row boundary bin, resolved on DISTINCT group values only
        (dictionary encode; no per-row Python in the hot filter)."""
        col = t.column(group_col)
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        d = col.dictionary_encode()
        codes = d.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        distinct = d.dictionary.to_pylist()
        per_distinct = np.asarray([p.get(str(x), (-1, 0))[0] for x in distinct],
                                  dtype=np.int64)
        return per_distinct[codes]

    def keep_full(t: pa.Table) -> pa.Table:
        p = _ray.get(pref)
        b = t.column("__bin").to_numpy(zero_copy_only=False)
        return t.filter(pa.array(b < _bounds_of(t, p))).drop_columns(["__prio", "__bin"])

    def keep_boundary(t: pa.Table) -> pa.Table:
        p = _ray.get(pref)
        b = t.column("__bin").to_numpy(zero_copy_only=False)
        return t.filter(pa.array(b == _bounds_of(t, p)))

    full = binned.map_batches(keep_full, batch_format="pyarrow")
    boundary = binned.map_batches(keep_boundary, batch_format="pyarrow")

    def resolve(grp):
        import pandas as pd  # noqa: F811

        p = plan  # captured: tiny dict
        g = str(grp[group_col].iloc[0])
        residual = p[g][1]
        srt = grp.sort_values(["__prio", key_col])
        run = srt[token_col].cumsum().to_numpy()
        stop = np.flatnonzero(run > residual)  # prefix rule: stop at first overflow
        kept = srt.iloc[: stop[0]] if len(stop) else srt
        return kept.drop(columns=["__prio", "__bin"])

    resolved = boundary.groupby(group_col).map_groups(resolve, batch_format="pandas")
    return full.union(resolved)
