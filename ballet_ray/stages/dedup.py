"""Deduplication operators: exact, MinHash-LSH, SimHash, n-gram Jaccard,
embedding-cosine near-dup.

All are Dataset→Dataset and shuffle only small derived columns (hashes,
band buckets, pair ids) — never the payload. Patterns follow the standard
published LSH constructions (Broder '97 minhash, Charikar '02 simhash):

- exact:   128-bit content hash → groupby(hash) → emit LOSER ids (all but
           the min id) → anti-join. The loser set is bounded by the
           duplicate count; for worst-case inputs a fully distributed
           left-anti hash join path is available (``resolve="join"``).
- minhash: word-shingles → k minhashes → b bands → groupby (band,
           band_hash) over (id, band, band_hash) ONLY — the 64-perm
           signature ships once per doc through a hash join at verify
           time, not once per band through the bucket shuffle.
- simhash: 64-bit signature; near-dup = small Hamming distance found via
           16-bit pigeonhole band buckets.
- ngram-jaccard: exact verification of candidate pairs; texts are
           attached by two distributed hash joins (never a driver dict).
- embedding: cosine ≥ threshold within LSH buckets (see similarity.py).

Cluster resolution (``assign_clusters``) is size-adaptive: small edge
sets (bounded by the duplicate count) resolve with an exact driver-side
union-find; above ``driver_edges_threshold`` the fully distributed
min-label propagation takes over — edges and labels stay Datasets, each
round is two hash joins plus a grouped min, and convergence is one
aggregated changed-label count.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray

from ballet_ray.functions.hashing import mix
from ballet_ray.functions.partition import stable_hash_array
from ballet_ray.stages.text import _WORD_RE

_EMPTY_PAIRS = {"id_a": [], "id_b": []}


# ---------------------------------------------------------------------------
# vectorized shingle / word hashing (shared by minhash, simhash, jaccard)
# ---------------------------------------------------------------------------


def _word_hash_batch(texts: list, *, lower: bool = True) -> tuple[np.ndarray, np.ndarray]:
    """All texts of a batch → (flat uint64 word hashes, offsets[n+1]).

    The only per-row Python work is the regex ``findall``; hashing is ONE
    vectorized siphash pass (``pd.util.hash_array`` with its fixed
    process-stable key) over the flattened word list of the whole batch.
    """
    words: list[str] = []
    offsets = np.empty(len(texts) + 1, dtype=np.int64)
    offsets[0] = 0
    for i, t in enumerate(texts):
        ws = _WORD_RE.findall(t.lower() if lower else t) if t else []
        words.extend(ws)
        offsets[i + 1] = len(words)
    if not words:
        return np.empty(0, dtype=np.uint64), offsets
    flat = stable_hash_array(np.asarray(words, dtype=object))
    return flat.astype(np.uint64), offsets


def _shingle_hash_batch(texts: list, k: int = 3) -> tuple[np.ndarray, np.ndarray]:
    """Word k-shingle hashes for a whole batch → (flat uint64, offsets[n+1]).

    Docs with fewer than ``k`` words are padded (parity with the padded
    single-doc construction) so every doc contributes ≥1 shingle. Shingle
    hashes are a vectorized ``mix`` of the k member word hashes.
    """
    pad = stable_hash_array(np.asarray(["_"], dtype=object)).astype(np.uint64)[0]
    wh, woff = _word_hash_batch(texts)
    n = len(texts)
    sh_parts: list[np.ndarray] = []
    soff = np.empty(n + 1, dtype=np.int64)
    soff[0] = 0
    # group docs by the vectorization-friendly invariant: shingle i of a doc
    # mixes word hashes [i, i+k); doc boundaries forbid one flat pass, so
    # build a padded per-doc view then mix all shingles of the batch at once.
    lens = np.diff(woff)
    slens = np.maximum(lens, k) - k + 1
    total = int(slens.sum())
    cols = [np.empty(total, dtype=np.uint64) for _ in range(k)]
    pos = 0
    for i in range(n):
        m = lens[i]
        w = wh[woff[i] : woff[i + 1]]
        if m < k:
            w = np.concatenate([w, np.full(k - m, pad, dtype=np.uint64)])
            m = k
        s = m - k + 1
        for j in range(k):
            cols[j][pos : pos + s] = w[j : j + s]
        soff[i + 1] = pos + s
        pos += s
    flat = mix(*cols) if total else np.empty(0, dtype=np.uint64)
    return flat, soff


def _shingle_set(text: str, k: int = 3) -> np.ndarray:
    """Unique shingle hashes of one doc (used by jaccard verification)."""
    flat, _ = _shingle_hash_batch([text], k)
    return np.unique(flat)


# ---------------------------------------------------------------------------
# exact dedup
# ---------------------------------------------------------------------------

_H128_KEY_A = "0123456789123456"
_H128_KEY_B = "6543219876543210"


#: per-doc offset table sizes under this broadcast via ``ray.put`` (one
#: copy per node) instead of an id-keyed payload shuffle
_OFFS_BROADCAST_MAX = 128 << 20
#: loser (id, off) rows under this aggregate on the driver (one bounded
#: pull, multithreaded polars groupby; documented in SCALING.md) instead
#: of a second coarse groupby shuffle
_DRIVER_AGG_MAX = 256 << 20

#: per-worker-process cache of broadcast offset indexes (ref hex → built
#: lookup), so the pd.Index is constructed once per worker, not per batch
_BCAST_OFFS_MEMO: dict = {}


def _block_winner_mask(k: np.ndarray, ids: np.ndarray,
                       off: np.ndarray) -> np.ndarray:
    """True where a (k, id, off) row is its own block's (id, off)-minimal
    occurrence of k.

    Combiner before the key exchange: a row that is not even its block's
    first occurrence of k can never be the GLOBAL first occurrence, so it
    is a loser regardless of every other block and skips the k-shuffle —
    only one candidate per (k, block) enters the exchange. On
    boilerplate-heavy corpora this cuts the wide stage's rows by the mean
    within-block duplication factor. ``np.unique`` codes keep the lexsort
    in pure-int space while preserving the id ORDER the first-occurrence
    rule is defined on (sorted uniques → order-preserving ranks)."""
    if len(k) == 0:
        return np.zeros(0, dtype=bool)
    _, codes = np.unique(ids, return_inverse=True)
    order = np.lexsort((off, codes, k))
    k_s = k[order]
    first = np.empty(len(k_s), dtype=bool)
    first[0] = True
    first[1:] = k_s[1:] != k_s[:-1]
    w = np.zeros(len(k), dtype=bool)
    w[order[first]] = True
    return w


def _losers_from_keyed(keyed, *, id_col: str, kparts: int):
    """(k, id, off, w) rows → loser (id, off) rows.

    Certain losers (``w`` False, see :func:`_block_winner_mask`) bypass
    the key exchange entirely; block-winner candidates resolve the global
    first occurrence per k with one coarse-partition sort pass. ``keyed``
    is materialized so the two branches read the same single execution."""
    keyed = keyed.materialize()

    def cand(t: pa.Table) -> pa.Table:
        return t.filter(t.column("w")).select(["k", id_col, "off"])

    def certain(t: pa.Table) -> pa.Table:
        return t.filter(pc.invert(t.column("w"))).select([id_col, "off"])

    def part_by_k(t: pa.Table) -> pa.Table:
        k = t.column("k").to_numpy(zero_copy_only=False).view(np.uint64)
        return t.append_column(
            "__part", pa.array((k % np.uint64(kparts)).astype(np.int64)))

    def losers_part(t: pa.Table) -> pa.Table:
        # global first occurrence per k among the block winners; int-code
        # lexsort (np.unique ranks preserve id order), Arrow output so the
        # downstream exchange ships ~20 B/row instead of pandas objects
        k = t.column("k").to_numpy(zero_copy_only=False)
        id_arr = t.column(id_col)
        if isinstance(id_arr, pa.ChunkedArray):
            id_arr = id_arr.combine_chunks()
        off = t.column("off").to_numpy(zero_copy_only=False)
        if len(k) == 0:
            return pa.table({id_col: id_arr, "off": t.column("off")})
        _, codes = np.unique(
            id_arr.to_numpy(zero_copy_only=False), return_inverse=True)
        order = np.lexsort((off, codes, k))
        k_s = k[order]
        dup = np.empty(len(k_s), dtype=bool)
        dup[0] = False
        dup[1:] = k_s[1:] == k_s[:-1]
        sel = order[dup]
        return pa.table({id_col: id_arr.take(pa.array(sel)),
                         "off": pa.array(off[sel])})

    cand_losers = (
        keyed.map_batches(cand, batch_format="pyarrow")
        .map_batches(part_by_k, batch_format="pyarrow")
        .groupby("__part")
        .map_groups(losers_part, batch_format="pyarrow")
    )
    return cand_losers.union(keyed.map_batches(certain, batch_format="pyarrow"))


def _dataset_to_arrow_table(ds) -> pa.Table:
    """Pull a (small, size-gated) materialized Dataset to one Arrow table."""
    blocks = ray.get(ds.get_internal_block_refs())
    tables = [b if isinstance(b, pa.Table)
              else pa.Table.from_pandas(b, preserve_index=False)
              for b in blocks]
    return pa.concat_tables(tables, promote_options="permissive")


def _flat_offs_from_losers_tbl(tbl: pa.Table, id_col: str):
    """Driver-side per-doc aggregation of loser (id, off) rows via one
    multithreaded polars groupby: (ids, bounds, flat) where doc ids[i]'s
    offsets are flat[bounds[i]:bounds[i+1]] (ascending)."""
    import polars as pl

    agg = (
        pl.from_arrow(tbl)
        .sort("off")
        .group_by(id_col, maintain_order=False)
        .agg(pl.col("off"))
    )
    ids_np = agg[id_col].to_numpy()
    lens = agg["off"].list.len().to_numpy().astype(np.int64)
    flat = agg["off"].explode().to_numpy().astype(np.int32)
    bounds = np.concatenate([[0], np.cumsum(lens)]).astype(np.int64)
    return ids_np, bounds, flat


def _broadcast_offs(payload, ids_np, bounds, flat, id_col: str):
    """Attach ``__offs`` by broadcast lookup — the text/token payload never
    shuffles. The (ids, bounds, flat) triple ships once per node via
    ``ray.put``; each worker builds its pd.Index once (process memo)."""
    ref = ray.put((ids_np, bounds, flat))

    def add_offs(t: pa.Table) -> pa.Table:
        key = ref.hex()
        ent = _BCAST_OFFS_MEMO.get(key)
        if ent is None:
            i_np, b_np, f_np = ray.get(ref)
            ent = (pd.Index(i_np), b_np, f_np)
            if len(_BCAST_OFFS_MEMO) > 4:
                _BCAST_OFFS_MEMO.clear()
            _BCAST_OFFS_MEMO[key] = ent
        index, b_np, f_np = ent
        batch_ids = t.column(id_col).to_numpy(zero_copy_only=False)
        pos = index.get_indexer(batch_ids)
        hit = pos >= 0
        lens = np.zeros(len(pos), dtype=np.int64)
        lens[hit] = b_np[pos[hit] + 1] - b_np[pos[hit]]
        total = int(lens.sum())
        if total:
            take_starts = np.repeat(b_np[pos[hit]], lens[hit])
            excl = np.concatenate([[0], np.cumsum(lens[hit])[:-1]])
            flat_idx = take_starts + (np.arange(total) - np.repeat(excl, lens[hit]))
            values = pa.array(f_np[flat_idx], type=pa.int32())
        else:
            values = pa.array([], type=pa.int32())
        offsets = pa.array(np.concatenate([[0], np.cumsum(lens)]).astype(np.int32))
        arr = pa.ListArray.from_arrays(offsets, values,
                                       mask=pa.array(~hit))
        return t.append_column("__offs", arr)

    return payload.map_batches(add_offs, batch_format="pyarrow")


def _attach_offsets(payload, losers, *, ds, id_col: str, kparts: int,
                    num_partitions: int):
    """Loser (id, off) rows → payload with per-doc ``__offs`` lists (null
    when a doc has no losers). Size-gated ladder, cheapest first:

    1. losers ≤ ``_DRIVER_AGG_MAX`` → aggregate on the driver, broadcast
       lookup (no groupby, no join: zero payload movement);
    2. aggregated per-doc table ≤ ``_OFFS_BROADCAST_MAX`` → distributed
       coarse-partition aggregation, then broadcast join-back;
    3. both big (true 100-TB worst case: duplication spread over most
       docs) → distributed aggregation + id-keyed hash join, the one
       payload shuffle of the op.
    """
    from ballet_ray.stages.joins import hash_join, scrub_empty_blocks

    lm = losers.materialize()
    if lm.count() == 0:
        def add_null(t: pa.Table) -> pa.Table:
            return t.append_column(
                "__offs", pa.array([None] * len(t), pa.list_(pa.int32()))
            )

        return payload.map_batches(add_null, batch_format="pyarrow")

    if (lm.size_bytes() or 0) <= _DRIVER_AGG_MAX:
        ids_np, bounds, flat = _flat_offs_from_losers_tbl(
            _dataset_to_arrow_table(lm), id_col)
        return _broadcast_offs(payload, ids_np, bounds, flat, id_col)

    def part_by_id(t: pa.Table) -> pa.Table:
        ids = t.column(id_col).to_numpy(zero_copy_only=False)
        h = stable_hash_array(ids.astype(object) if ids.dtype == object else ids)
        return t.append_column(
            "__part", pa.array((h % np.uint64(kparts)).astype(np.int64)))

    def agg_offs(t: pa.Table) -> pa.Table:
        ids = t.column(id_col).to_numpy(zero_copy_only=False)
        off = t.column("off").to_numpy(zero_copy_only=False).astype(np.int32)
        codes, uniq = pd.factorize(ids)
        order = np.lexsort((off, codes))
        codes_s, off_s = codes[order], off[order]
        new_grp = np.concatenate([[True], codes_s[1:] != codes_s[:-1]])
        starts = np.flatnonzero(new_grp)
        offsets = np.concatenate([starts, [len(off_s)]]).astype(np.int32)
        return pa.table({
            id_col: pa.array(np.asarray(uniq)),
            "__offs": pa.ListArray.from_arrays(pa.array(offsets), pa.array(off_s)),
        })

    per_doc = (
        lm.map_batches(part_by_id, batch_format="pyarrow")
        .groupby("__part")
        .map_groups(agg_offs, batch_format="pyarrow")
    )
    per_doc = scrub_empty_blocks(per_doc, schema=pa.schema([
        pa.field(id_col, _id_arrow_type(ds, id_col)),
        pa.field("__offs", pa.list_(pa.int32())),
    ]))
    if (per_doc.size_bytes() or 0) <= _OFFS_BROADCAST_MAX:
        tbl = _dataset_to_arrow_table(per_doc).combine_chunks()
        offs_col = tbl.column("__offs").chunk(0) if tbl.num_rows else \
            pa.array([], pa.list_(pa.int32()))
        off0 = offs_col.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
        flat = offs_col.values.to_numpy(zero_copy_only=False).astype(np.int32)
        bounds = off0 - off0[0] if len(off0) else np.zeros(1, np.int64)
        flat = flat[off0[0]:off0[-1]] if len(off0) else flat
        ids_np = tbl.column(id_col).to_numpy(zero_copy_only=False)
        return _broadcast_offs(payload, ids_np, bounds, flat, id_col)
    return hash_join(payload, per_doc, on=(id_col,), how="left_outer",
                     num_partitions=num_partitions)


def _id_arrow_type(ds, col: str) -> pa.DataType:
    """Arrow type of an id column, for typed-empty join sides (falls back
    to string when the dataset's schema is pandas/object-dtyped)."""
    from ballet_ray.stages.joins import _arrow_schema_or_none

    s = _arrow_schema_or_none(ds)
    if s is not None and col in s.names:
        return s.field(col).type
    return pa.string()


def _list_row_hashes(col: pa.Array) -> tuple[np.ndarray, np.ndarray]:
    """Two independent 64-bit hashes per LIST row. Primitive lists
    (int/float/bool, the pre-tokenized ``tokens`` column case) go through a
    zero-copy binary reinterpretation of the values buffer — each row's
    bytes slice hashes as one siphash input, so [1,2],[3] and [1],[2,3]
    differ (the offsets define the byte boundaries). Non-primitive or
    null-bearing lists take an exact per-row ``repr`` slow path."""
    lt = col.type
    if pa.types.is_fixed_size_list(lt):
        k = lt.list_size
        off = np.arange(len(col) + 1, dtype=np.int64) * k
        flat = col.flatten()
    else:
        off = col.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
        off = off - off[0]
        flat = col.flatten()
    vt = flat.type
    primitive = (pa.types.is_integer(vt) or pa.types.is_floating(vt)
                 or pa.types.is_boolean(vt))
    if not primitive or flat.null_count:
        vals = np.array([repr(v) for v in col.to_pylist()], dtype=object)
        h1 = pd.util.hash_array(vals, hash_key=_H128_KEY_A, categorize=False)
        h2 = pd.util.hash_array(vals, hash_key=_H128_KEY_B, categorize=False)
    else:
        vals_np = np.ascontiguousarray(
            flat.to_numpy(zero_copy_only=False))
        raw = pa.py_buffer(vals_np.tobytes())
        byte_off = off * vals_np.dtype.itemsize
        if byte_off[-1] <= np.iinfo(np.int32).max:
            binarr = pa.BinaryArray.from_buffers(
                pa.binary(), len(col),
                [None, pa.py_buffer(byte_off.astype(np.int32).tobytes()),
                 raw])
        else:
            binarr = pa.LargeBinaryArray.from_buffers(
                pa.large_binary(), len(col),
                [None, pa.py_buffer(byte_off.astype(np.int64).tobytes()),
                 raw])
        b = binarr.to_numpy(zero_copy_only=False)
        h1 = pd.util.hash_array(b, hash_key=_H128_KEY_A, categorize=False)
        h2 = pd.util.hash_array(b, hash_key=_H128_KEY_B, categorize=False)
        if col.null_count:
            # a null row's offsets span zero bytes — separate it from []
            nulls = pc.is_null(col).to_numpy(zero_copy_only=False)
            h1 = np.where(nulls, h1 ^ np.uint64(0x9E3779B97F4A7C15), h1)
            h2 = np.where(nulls, h2 ^ np.uint64(0xC2B2AE3D27D4EB4F), h2)
    return h1.astype(np.int64), h2.astype(np.int64)


def add_content_hash(ds, col: str, out: str = "content_h"):
    """Append two independent 64-bit content hashes (vectorized siphash with
    two keys → 128 bits total: collision-safe at 10^12 docs, unlike a single
    64-bit hash whose birthday bound is ~10^4 collisions at that scale).
    Handles string/numeric columns AND list columns (exact sequence-level
    dedup over the pre-tokenized ``tokens`` table — see
    :func:`_list_row_hashes`)."""

    def f(t: pa.Table) -> pa.Table:
        c = t.column(col)
        if isinstance(c, pa.ChunkedArray):
            c = c.combine_chunks()
        if (pa.types.is_list(c.type) or pa.types.is_large_list(c.type)
                or pa.types.is_fixed_size_list(c.type)):
            h1, h2 = _list_row_hashes(c)
        else:
            vals = c.to_numpy(zero_copy_only=False).astype(object)
            h1 = pd.util.hash_array(
                vals, hash_key=_H128_KEY_A, categorize=False).astype(np.int64)
            h2 = pd.util.hash_array(
                vals, hash_key=_H128_KEY_B, categorize=False).astype(np.int64)
        return t.append_column(f"{out}1", pa.array(h1)).append_column(
            f"{out}2", pa.array(h2)
        )

    return ds.map_batches(f, batch_format="pyarrow")


def exact_dedup(ds, col: str, id_col: str, *, resolve: str = "broadcast",
                num_partitions: int | None = None,
                keep_col: str | None = None, keep: str = "max"):
    """Keep one row per distinct value of ``col``.

    Winner selection: by default the min ``id_col`` (deterministic; works
    for string and integer ids). With ``keep_col`` the winner is instead
    the row with the ``keep`` ("max"/"min") value of that column — the
    quality-aware retention real curation pipelines use (keep the longest
    / highest-scoring copy per canonical key, e.g. per canonical URL),
    with min-id tiebreak so the choice stays deterministic under ties.

    Only (hash128, id[, keep]) is shuffled; the grouped pass emits the
    LOSER ids (every id but the winner), a set bounded by the duplicate
    count — the inverse of collecting the near-corpus-sized winner set.

    resolve="broadcast" (default): losers are broadcast and anti-filtered —
    right when duplicates are a small fraction of the corpus.
    resolve="join": fully distributed left-anti hash join (losers carry a
    marker, ``Dataset.join`` left_outer, keep unmatched) — right when the
    duplicate count itself could exceed driver memory.
    """
    from ballet_ray.stages.joins import default_join_partitions

    if keep not in ("max", "min"):
        raise ValueError(f"keep must be 'max' or 'min', got {keep!r}")
    num_partitions = default_join_partitions(num_partitions)
    narrow = [col, id_col] + ([keep_col] if keep_col else [])
    keep_out = ["content_h1", "content_h2", id_col] + ([keep_col] if keep_col else [])
    hashed = add_content_hash(ds.select_columns(narrow), col).select_columns(keep_out)

    # coarse-partition loser kernel: hash-partition on h1 so all rows of a
    # content hash co-locate, then ONE vectorized pandas pass per partition
    # (sort + duplicated mask). A per-content-hash map_groups would pay
    # Ray's ~60 µs/group combine for every DISTINCT doc in the corpus.
    n_parts = max(8, num_partitions)

    def add_part(t: pa.Table) -> pa.Table:
        h1 = t.column("content_h1").to_numpy(zero_copy_only=False)
        return t.append_column(
            "__part", pa.array((h1.astype(np.uint64) % np.uint64(n_parts)).astype(np.int64))
        )

    def losers_part(df: pd.DataFrame) -> pd.DataFrame:
        if keep_col is None:
            df = df.sort_values(["content_h1", "content_h2", id_col])
        else:
            # winner first within each content group: best keep_col value,
            # min-id tiebreak (NaN scores sort last → never win over a
            # scored copy)
            df = df.sort_values(
                ["content_h1", "content_h2", keep_col, id_col],
                ascending=[True, True, keep == "min", True],
                na_position="last",
            )
        dup = df.duplicated(subset=["content_h1", "content_h2"], keep="first")
        return df.loc[dup, [id_col]]

    loser_ds = (
        hashed.map_batches(add_part, batch_format="pyarrow")
        .groupby("__part")
        .map_groups(losers_part, batch_format="pandas")
        .materialize()
    )
    if loser_ds.count() == 0:  # no duplicates at all → identity
        return ds

    from ballet_ray.stages.joins import semi_join_filter

    if resolve == "broadcast":
        ids = loser_ds.to_pandas()[id_col].to_numpy()
        return semi_join_filter(ds, ids, key=id_col, invert=True)

    from ballet_ray.stages.joins import left_anti_join

    return left_anti_join(ds, loser_ds, key=id_col, num_partitions=num_partitions)


# ---------------------------------------------------------------------------
# MinHash-LSH
# ---------------------------------------------------------------------------


def _chunked_affine_min(
    sh32: np.ndarray, offsets: np.ndarray, a: np.ndarray, b: np.ndarray
) -> np.ndarray:
    """Per-segment min of the affine permutations a*x+b over uint32 shingle
    hashes, chunked so the (positions × perms) temporary stays
    cache-resident (8 MB — measured 2.9× faster than 128 MB chunks; the
    kernel is memory-bandwidth-bound when many tasks run concurrently).
    Every segment must be non-empty."""
    n = len(offsets) - 1
    num_perm = len(a)
    out = np.empty((n, num_perm), dtype=np.uint64)
    CHUNK = 1 << 15
    row = 0
    # transposed (perms, positions) layout: the segment-min reduceat runs
    # over contiguous row-major segments per permutation (46× faster than
    # reduceat over axis 0, whose inner loop strides per element); the
    # chunk buffer is reused and multiply/add are in-place
    buf = np.empty((num_perm, CHUNK), dtype=a.dtype)
    with np.errstate(over="ignore"):
        while row < n:
            hi = row
            while hi < n and offsets[hi + 1] - offsets[row] <= CHUNK:
                hi += 1
            hi = max(hi, row + 1)
            lo_p, hi_p = offsets[row], offsets[hi]
            w = hi_p - lo_p
            p = buf[:, :w] if w <= CHUNK else np.empty((num_perm, w), a.dtype)
            np.multiply(a[:, None], sh32[None, lo_p:hi_p], out=p)
            p += b[:, None]
            out[row:hi] = np.minimum.reduceat(p, offsets[row:hi] - lo_p, axis=1).T
            row = hi
    return out


class MinHasher:
    """Actor-pool stage: text → num_perm minhash values.

    Shingle hashing is one vectorized pass per batch (`_shingle_hash_batch`);
    the per-doc signature is the column-min of the 32-bit affine
    permutations a*x+b over the doc's shingle slice (the standard
    one-permutation-family trick), chunked cache-resident.
    """

    def __init__(self, num_perm: int = 64, k: int = 3, seed: int = 1754, text_col: str = "text"):
        rng = np.random.RandomState(seed)
        self.a = rng.randint(1, 2**31, size=num_perm).astype(np.uint32) | np.uint32(1)
        self.b = rng.randint(0, 2**31, size=num_perm).astype(np.uint32)
        self.num_perm = num_perm
        self.k = k
        self.text_col = text_col

    def signatures(self, texts: list) -> np.ndarray:
        n = len(texts)
        if n == 0:
            return np.empty((0, self.num_perm), dtype=np.uint64)
        flat, off = _shingle_hash_batch(texts, self.k)
        sh32 = (flat >> np.uint64(32)).astype(np.uint32)
        return _chunked_affine_min(sh32, off, self.a, self.b)

    def signature(self, text: str) -> np.ndarray:
        return self.signatures([text])[0]

    def __call__(self, table: pa.Table) -> pa.Table:
        sigs = self.signatures(table.column(self.text_col).to_pylist())
        flat = sigs.astype(np.int64).ravel()
        arr = pa.FixedSizeListArray.from_arrays(pa.array(flat), self.num_perm)
        return table.append_column("minhash", arr)


def _emit_pairs(ids: np.ndarray, max_bucket: int) -> tuple[np.ndarray, np.ndarray]:
    """Candidate pairs within one bucket. Buckets above ``max_bucket`` rows
    degrade to star pairs (min id anchored to every member): O(n) instead of
    O(n²), connectivity preserved for identical docs; some near-dup pairs in
    a degenerate bucket may be missed (documented recall cap)."""
    n = len(ids)
    if n > max_bucket:
        return np.full(n - 1, ids[0]), ids[1:]
    iu = np.triu_indices(n, 1)
    return ids[iu[0]], ids[iu[1]]


def _partition_bucket_pairs(
    t: pa.Table, *, id_col: str, bucket_cols: list[str], max_bucket: int
) -> pa.Table:
    """All candidate pairs of one COARSE partition (many LSH buckets): one
    numpy lexsort, then a boundary scan over buckets — no per-bucket pandas
    group, no per-bucket task. Pairs are emitted (min, max)-ordered and
    deduped within the partition."""
    n = len(t)
    if n < 2:
        return pa.table(_EMPTY_PAIRS)
    keys = [t.column(c).to_numpy(zero_copy_only=False) for c in bucket_cols]
    ids = t.column(id_col).to_numpy(zero_copy_only=False)
    order = np.lexsort(tuple(reversed(keys)))
    keys = [k[order] for k in keys]
    ids = ids[order]
    boundary = np.zeros(n, dtype=bool)
    boundary[0] = True
    for k in keys:
        boundary[1:] |= k[1:] != k[:-1]
    starts = np.flatnonzero(boundary)
    ends = np.append(starts[1:], n)
    ia_parts, ib_parts = [], []
    for s, e in zip(starts, ends):
        if e - s < 2:
            continue
        ia, ib = _emit_pairs(np.sort(ids[s:e]), max_bucket)
        ia_parts.append(ia)
        ib_parts.append(ib)
    if not ia_parts:
        return pa.table(_EMPTY_PAIRS)
    ia = np.concatenate(ia_parts)
    ib = np.concatenate(ib_parts)
    # local dedupe (a pair can surface from several bands of this partition);
    # drop_duplicates works for string AND integer ids (np.unique(axis=0)
    # rejects object arrays)
    dd = pd.DataFrame({"id_a": ia, "id_b": ib}).drop_duplicates()
    return pa.table({"id_a": pa.array(dd["id_a"].to_numpy()), "id_b": pa.array(dd["id_b"].to_numpy())})


def minhash_lsh_pairs(
    ds,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_perm: int = 64,
    bands: int = 16,
    shingle_k: int = 3,
    est_threshold: float = 0.5,
    concurrency: int | None = None,
    max_bucket: int = 5000,
    num_partitions: int | None = None,
    broadcast_docs: int = 200_000,
):
    """Near-duplicate pairs via MinHash-LSH.

    sign → explode to (id, band, band_hash) rows — the signature itself is
    NOT replicated per band — → coarse-partitioned bucket scan → candidate
    (id_a, id_b) → dedupe → verify estimated Jaccard = fraction of agreeing
    minhashes; keep pairs ≥ est_threshold.

    Verification attaches signatures by size-adaptive strategy: corpora up
    to ``broadcast_docs`` (512 B/doc → ≤ ~100 MB) broadcast the signature
    matrix once through the object store; larger corpora hash-join the
    one-row-per-doc signature table onto the pairs (the 10^12-doc path).
    Returns a Dataset of (id_a, id_b, est_jaccard).
    """
    projected = ds.select_columns([id_col, text_col])
    # signatures are consumed twice (band explode + verify join): drop the
    # text payload, then materialize only (id, minhash) — 512 B/doc, not the
    # corpus. concurrency=None (the default) runs task-based: MinHasher init
    # is two tiny arrays — cheaper to rebuild per task than to spin an actor
    # pool, and a fixed pool can reserve every CPU of a small cluster and
    # starve an upstream shuffle (observed deadlock at num_cpus=4 behind a
    # line-dedup join). Pass an int only when signing cost dominates.
    if concurrency is None:
        mk = dict(num_perm=num_perm, k=shingle_k, text_col=text_col)
        signed_src = projected.map_batches(
            lambda t, _mk=mk: MinHasher(**_mk)(t), batch_format="pyarrow"
        )
    else:
        signed_src = projected.map_batches(
            MinHasher,
            fn_constructor_kwargs={"num_perm": num_perm, "k": shingle_k, "text_col": text_col},
            batch_format="pyarrow",
            concurrency=concurrency,
        )
    signed = signed_src.select_columns([id_col, "minhash"])
    return _lsh_pairs_from_signed(
        signed, id_col=id_col, num_perm=num_perm, bands=bands,
        est_threshold=est_threshold, max_bucket=max_bucket,
        num_partitions=num_partitions, broadcast_docs=broadcast_docs,
    )


def _lsh_pairs_from_signed(
    signed,
    *,
    id_col: str,
    num_perm: int = 64,
    bands: int = 16,
    est_threshold: float = 0.5,
    max_bucket: int = 5000,
    num_partitions: int | None = None,
    broadcast_docs: int = 200_000,
):
    """Band/bucket/verify machinery shared by the text and token signers:
    takes a (id, minhash) Dataset, returns (id_a, id_b, est_jaccard)."""
    from ballet_ray.stages.joins import default_join_partitions

    num_partitions = default_join_partitions(num_partitions)
    rows_per_band = num_perm // bands
    signed = signed.materialize()
    if signed.count() == 0:
        # all-filtered corpus (e.g. an aggressive quality gate upstream):
        # no docs → no pairs; downstream empty-pair handling takes over
        import ray.data as _rdata

        return _rdata.from_arrow(pa.table({
            "id_a": pa.array([], pa.int64()),
            "id_b": pa.array([], pa.int64()),
            "est_jaccard": pa.array([], pa.float64()),
        }))

    def explode(t: pa.Table) -> pa.Table:
        ids = t.column(id_col).to_numpy(zero_copy_only=False)
        sig = (
            np.asarray(
                t.column("minhash").combine_chunks().flatten().to_numpy(zero_copy_only=False)
            )
            .reshape(len(ids), num_perm)
            .astype(np.uint64)
        )
        out_ids, out_band, out_bh = [], [], []
        for b in range(bands):
            seg = sig[:, b * rows_per_band : (b + 1) * rows_per_band]
            # process-stable band hash (builtin hash() is salted per process
            # and would break cross-task bucketing)
            bh = (mix(*[seg[:, j] for j in range(rows_per_band)]) >> np.uint64(1)).astype(np.int64)
            out_ids.append(ids)
            out_band.append(np.full(len(ids), b, dtype=np.int32))
            out_bh.append(bh)
        return pa.table(
            {
                id_col: pa.array(np.concatenate(out_ids)),
                "band": pa.array(np.concatenate(out_band)),
                "band_hash": pa.array(np.concatenate(out_bh)),
            }
        )

    exploded = signed.map_batches(explode, batch_format="pyarrow")

    # coarse-partition the buckets (band_hash % P) and emit every bucket's
    # pairs with ONE numpy kernel per partition — per-bucket pandas groups
    # cost ~1 ms each and there are millions of tiny buckets at scale
    coarse = max(2, num_partitions)

    def add_part(t: pa.Table) -> pa.Table:
        bh = t.column("band_hash").to_numpy(zero_copy_only=False)
        return t.append_column("__part", pa.array((bh % coarse).astype(np.int32)))

    candidates = (
        exploded.map_batches(add_part, batch_format="pyarrow")
        .groupby("__part")
        .map_groups(
            lambda t: _partition_bucket_pairs(
                t, id_col=id_col, bucket_cols=["band", "band_hash"], max_bucket=max_bucket
            ),
            batch_format="pyarrow",
        )
    )
    n_docs = signed.count()  # materialized → metadata lookup, no pass
    # cross-partition dedupe (a pair can surface from bands in different
    # coarse partitions). Small corpora: one-block local drop_duplicates
    # (the hash-shuffle groupby's aggregator actors cost more than the whole
    # pair table); large corpora: tree-reduce groupby count.
    if n_docs <= broadcast_docs:
        pairs = candidates.repartition(1).map_batches(
            lambda t: pa.Table.from_pandas(
                t.to_pandas().drop_duplicates(subset=["id_a", "id_b"]), preserve_index=False
            ),
            batch_format="pyarrow",
            batch_size=None,  # whole block — dedupe must see every pair
        )
    else:
        from ballet_ray.functions.reduce import distinct_keys

        # coarse-partition distinct (groupby(id_a,id_b).count() would pay
        # Ray's per-group combine for every distinct PAIR); the repartition
        # also compacts away schema-less empty blocks before the Acero
        # signature joins
        pairs = distinct_keys(
            candidates, ["id_a", "id_b"], num_parts=max(2, num_partitions // 2)
        ).repartition(max(2, num_partitions // 2))
    if n_docs <= broadcast_docs:
        # small corpus: ship the (id → signature) matrix once via the object
        # store and verify inside map_batches — join startup costs more than
        # the whole signature table at this size
        sig_tbl = signed.to_pandas()
        ids_all = sig_tbl[id_col].to_numpy()
        mat = np.stack(
            [np.asarray(v, dtype=np.int64) for v in sig_tbl["minhash"].to_numpy()]
        ).astype(np.uint64)
        import ray as _ray

        idx = {v: i for i, v in enumerate(ids_all)}
        ref = _ray.put((idx, mat))

        def verify_bcast(t: pa.Table) -> pa.Table:
            if len(t) == 0 or "id_a" not in t.column_names:
                return pa.table(
                    {"id_a": pa.array([]), "id_b": pa.array([]),
                     "est_jaccard": pa.array([], type=pa.float64())}
                )
            lookup, m = _ray.get(ref)
            a = t.column("id_a").to_numpy(zero_copy_only=False)
            b = t.column("id_b").to_numpy(zero_copy_only=False)
            sa = m[[lookup[v] for v in a]]
            sb = m[[lookup[v] for v in b]]
            est = (sa == sb).mean(axis=1)
            out = pa.table(
                {"id_a": t.column("id_a"), "id_b": t.column("id_b"),
                 "est_jaccard": pa.array(est, type=pa.float64())}
            )
            return out.filter(pa.array(est >= est_threshold))

        return pairs.map_batches(verify_bcast, batch_format="pyarrow")

    # scale path: one-row-per-doc signature table joins in as binary blobs
    # (Acero joins reject list payloads)
    def sig_blob(t: pa.Table) -> pa.Table:
        sig = (
            np.asarray(
                t.column("minhash").combine_chunks().flatten().to_numpy(zero_copy_only=False)
            )
            .reshape(len(t), num_perm)
            .astype(np.uint64)
        )
        blobs = [row.tobytes() for row in sig]
        return pa.table({id_col: t.column(id_col), "sig": pa.array(blobs, type=pa.binary())})

    sigs = signed.map_batches(sig_blob, batch_format="pyarrow")
    sig_a = sigs.map_batches(lambda t: t.rename_columns(["id_a", "sig_a"]), batch_format="pyarrow")
    sig_b = sigs.map_batches(lambda t: t.rename_columns(["id_b", "sig_b"]), batch_format="pyarrow")
    joined = pairs.join(sig_a, join_type="inner", num_partitions=num_partitions, on=("id_a",))
    joined = joined.join(sig_b, join_type="inner", num_partitions=num_partitions, on=("id_b",))

    def verify(t: pa.Table) -> pa.Table:
        n = len(t)
        if n == 0:
            return pa.table(
                {
                    "id_a": t.column("id_a"),
                    "id_b": t.column("id_b"),
                    "est_jaccard": pa.array([], type=pa.float64()),
                }
            )
        sa = np.frombuffer(b"".join(t.column("sig_a").to_pylist()), dtype=np.uint64).reshape(n, num_perm)
        sb = np.frombuffer(b"".join(t.column("sig_b").to_pylist()), dtype=np.uint64).reshape(n, num_perm)
        est = (sa == sb).mean(axis=1)
        out = pa.table(
            {
                "id_a": t.column("id_a"),
                "id_b": t.column("id_b"),
                "est_jaccard": pa.array(est, type=pa.float64()),
            }
        )
        return out.filter(pa.array(est >= est_threshold))

    return joined.map_batches(verify, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------

_BIT_SHIFTS = np.arange(64, dtype=np.uint64)


class SimHasher:
    """64-bit SimHash over word hashes (Charikar '02) — batch-vectorized:
    one siphash pass over the batch's words, bit unpack + per-doc
    ``add.reduceat``, no per-word Python loop."""

    def __init__(self, text_col: str = "text"):
        self.text_col = text_col

    def signatures(self, texts: list) -> np.ndarray:
        n = len(texts)
        if n == 0:
            return np.empty(0, dtype=np.uint64)
        wh, off = _word_hash_batch(texts)
        if len(wh) == 0:
            return np.zeros(n, dtype=np.uint64)
        # empty docs contribute no rows, so the flat array is exactly the
        # concatenation of non-empty docs' words: reduceat over non-empty
        # starts reduces one doc per segment; empty docs keep acc == 0.
        # The (words × 64) ±1 matrix is built in cache-resident chunks
        # aligned to doc boundaries (bandwidth-bound, like the minhashers).
        lens = np.diff(off)
        nonempty = lens > 0
        ne_starts = off[:-1][nonempty]
        ne_rows = np.flatnonzero(nonempty)
        ne_ends = off[1:][nonempty]
        acc = np.zeros((n, 64), dtype=np.int64)
        CHUNK = 1 << 15
        i = 0
        while i < len(ne_rows):
            j = i
            while j < len(ne_rows) and ne_ends[j] - ne_starts[i] <= CHUNK:
                j += 1
            j = max(j, i + 1)
            lo, hi = ne_starts[i], ne_ends[j - 1]
            # transposed (bits, positions) layout for the same contiguous-
            # segment reduceat win as the minhash kernels
            bits = ((wh[None, lo:hi] >> _BIT_SHIFTS[:, None]) & np.uint64(1)).astype(np.int32)
            contrib = 2 * bits - 1
            acc[ne_rows[i:j]] = np.add.reduceat(contrib, ne_starts[i:j] - lo, axis=1).T
            i = j
        sig = ((acc > 0).astype(np.uint64) << _BIT_SHIFTS[None, :]).sum(axis=1, dtype=np.uint64)
        return sig

    def signature(self, text: str) -> int:
        return int(self.signatures([text])[0])

    def __call__(self, table: pa.Table) -> pa.Table:
        sigs = self.signatures(table.column(self.text_col).to_pylist())
        return table.append_column("simhash", pa.array(sigs.astype(np.int64)))


def _popcount64(x: np.ndarray) -> np.ndarray:
    """Vectorized popcount of a uint64 array."""
    b = np.unpackbits(x.view(np.uint8).reshape(-1, 8), axis=1)
    return b.sum(axis=1).astype(np.int64)


def simhash_pairs(
    ds,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_hamming: int = 3,
    concurrency: int | None = None,
    max_bucket: int = 5000,
):
    """Near-dup pairs whose 64-bit simhash Hamming distance <= max_hamming.
    Bucket by each of 4 16-bit bands (pigeonhole: distance<=3 ⇒ at least one
    band equal), verify distance within buckets (vectorized popcount).
    ``concurrency=None`` (default) signs task-based — same rationale as
    :func:`minhash_lsh_pairs` (a fixed actor pool can starve an upstream
    shuffle on a small cluster)."""
    if concurrency is None:
        signed = ds.map_batches(
            lambda t, _tc=text_col: SimHasher(text_col=_tc)(t),
            batch_format="pyarrow",
        )
    else:
        signed = ds.map_batches(
            SimHasher,
            fn_constructor_kwargs={"text_col": text_col},
            batch_format="pyarrow",
            concurrency=concurrency,
        )
    return hamming_pairs(
        signed, id_col=id_col, hash_col="simhash",
        max_hamming=max_hamming, max_bucket=max_bucket,
    )


def hamming_pairs(
    signed,
    *,
    id_col: str = "doc_id",
    hash_col: str = "simhash",
    max_hamming: int = 3,
    max_bucket: int = 5000,
    bands: int = 4,
):
    """Near-dup pairs over ANY 64-bit signature column (simhash, image
    dhash/phash, …) whose Hamming distance <= ``max_hamming``.

    Bucket each row by its ``bands`` equal-width bit bands (pigeonhole:
    distance < bands ⇒ at least one band equal, so recall is EXACT for
    ``max_hamming <= bands - 1`` and probabilistic above), then verify
    the true distance within buckets with a vectorized popcount. Shared
    kernel of :func:`simhash_pairs` and image near-dup
    (``stages/image_hash.py``)."""
    if 64 % bands:
        raise ValueError("bands must divide 64")
    width = 64 // bands
    band_mask = np.uint64((1 << width) - 1)

    def explode(t: pa.Table) -> pa.Table:
        ids = t.column(id_col).to_numpy(zero_copy_only=False)
        sig = t.column(hash_col).to_numpy(zero_copy_only=False).astype(np.uint64)
        parts = []
        for b in range(bands):
            band = ((sig >> np.uint64(width * b)) & band_mask).astype(np.int64)
            parts.append(
                pa.table(
                    {
                        id_col: pa.array(ids),
                        "band": pa.array(np.full(len(ids), b, dtype=np.int32)),
                        "band_val": pa.array(band),
                        "__sig": pa.array(sig.astype(np.int64)),
                    }
                )
            )
        return pa.concat_tables(parts)

    exploded = signed.select_columns([id_col, hash_col]).map_batches(explode, batch_format="pyarrow")

    from ballet_ray.stages.joins import default_join_partitions

    coarse = default_join_partitions(None)

    def add_part(t: pa.Table) -> pa.Table:
        bv = t.column("band_val").to_numpy(zero_copy_only=False)
        b = t.column("band").to_numpy(zero_copy_only=False).astype(np.int64)
        return t.append_column("__part", pa.array(((bv + 7919 * b) % coarse).astype(np.int32)))

    def part_pairs(t: pa.Table) -> pa.Table:
        """All buckets of one coarse partition in one numpy pass (see
        _partition_bucket_pairs — same boundary-scan pattern, plus the
        Hamming verify against each pair's signatures)."""
        n = len(t)
        empty = pa.table({"id_a": pa.array([]), "id_b": pa.array([]), "hamming": pa.array([], type=pa.int64())})
        if n < 2:
            return empty
        band = t.column("band").to_numpy(zero_copy_only=False)
        bval = t.column("band_val").to_numpy(zero_copy_only=False)
        ids = t.column(id_col).to_numpy(zero_copy_only=False)
        sigs = t.column("__sig").to_numpy(zero_copy_only=False).astype(np.uint64)
        order = np.lexsort((bval, band))
        band, bval, ids, sigs = band[order], bval[order], ids[order], sigs[order]
        boundary = np.zeros(n, dtype=bool)
        boundary[0] = True
        boundary[1:] = (band[1:] != band[:-1]) | (bval[1:] != bval[:-1])
        starts = np.flatnonzero(boundary)
        ends = np.append(starts[1:], n)
        ia_p, ib_p, hd_p = [], [], []
        for s, e in zip(starts, ends):
            if e - s < 2:
                continue
            sub_order = np.argsort(ids[s:e], kind="stable")
            sub_ids = ids[s:e][sub_order]
            sub_sig = sigs[s:e][sub_order]
            ia, ib = _emit_pairs(sub_ids, max_bucket)
            if not len(ia):
                continue
            sa = sub_sig[np.searchsorted(sub_ids, ia)]
            sb = sub_sig[np.searchsorted(sub_ids, ib)]
            dist = _popcount64(sa ^ sb)
            keep = dist <= max_hamming
            ia_p.append(ia[keep])
            ib_p.append(ib[keep])
            hd_p.append(dist[keep])
        if not ia_p:
            return empty
        dd = pd.DataFrame(
            {"id_a": np.concatenate(ia_p), "id_b": np.concatenate(ib_p), "hamming": np.concatenate(hd_p)}
        ).drop_duplicates(subset=["id_a", "id_b"])
        return pa.table(
            {"id_a": pa.array(dd["id_a"].to_numpy()), "id_b": pa.array(dd["id_b"].to_numpy()),
             "hamming": pa.array(dd["hamming"].to_numpy().astype(np.int64))}
        )

    pairs = (
        exploded.map_batches(add_part, batch_format="pyarrow")
        .groupby("__part")
        .map_groups(part_pairs, batch_format="pyarrow")
    )

    # cross-partition dedupe: hamming is a pure function of the two fixed
    # signatures, so a grouped min dedupes AND preserves it. grouped_reduce
    # keeps Ray's shuffle keyed on the COARSE partition — per-pair groups
    # (millions of 1-2 row groups) would pay ~60 µs/pair combine overhead.
    from ballet_ray.functions.reduce import grouped_reduce

    return grouped_reduce(
        pairs, ["id_a", "id_b"], {"hamming": "min"}, num_parts=max(2, coarse // 2)
    ).repartition(max(2, coarse // 2))


# ---------------------------------------------------------------------------
# connected components / end-to-end dedup
# ---------------------------------------------------------------------------


def _rename(ds, names: list[str]):
    return ds.map_batches(lambda t, n=tuple(names): t.rename_columns(list(n)), batch_format="pyarrow")


def _unionfind_labels(edges_df: pd.DataFrame, id_col: str) -> pd.DataFrame:
    """Driver-side union-find for SMALL edge sets (size-gated by
    assign_clusters): exact min-label components in O(E α(E))."""
    parent: dict = {}

    def find(x):
        root = x
        while parent.get(root, root) != root:
            root = parent[root]
        while parent.get(x, x) != x:
            parent[x], x = root, parent[x]
        return root

    for a, b in zip(edges_df["id_a"], edges_df["id_b"]):
        ra, rb = find(a), find(b)
        if ra != rb:
            # union by min so the representative IS the component minimum
            lo, hi = (ra, rb) if ra < rb else (rb, ra)
            parent[hi] = lo
    nodes = pd.unique(pd.concat([edges_df["id_a"], edges_df["id_b"]], ignore_index=True))
    return pd.DataFrame({id_col: nodes, "cluster_rep": [find(v) for v in nodes]})


def assign_clusters(
    pairs, *, id_col: str = "doc_id", max_rounds: int = 30,
    num_partitions: int | None = None, driver_edges_threshold: int = 50_000,
):
    """Near-dup pairs → per-id cluster representative (the minimum id of its
    connected component) via fully distributed min-label propagation.

    Edges and labels stay Datasets end to end: each round hash-joins the
    current labels onto both endpoints of every edge, emits (node,
    min(label_a, label_b)) both ways, reduces by a grouped ``Min``, and
    decides convergence from an aggregated changed-label count — the driver
    only ever sees that one integer. Works for integer AND string ids
    (lexicographic min). Converges in O(component diameter) rounds;
    near-dup clusters are almost always tiny, so ``max_rounds`` is a
    formality. Returns (id, cluster_rep) rows for every id in a pair.
    """
    from ballet_ray.stages.joins import default_join_partitions

    num_partitions = default_join_partitions(num_partitions)

    def seed(t: pa.Table) -> pa.Table:
        a = t.column("id_a").to_numpy(zero_copy_only=False)
        b = t.column("id_b").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                id_col: pa.array(np.concatenate([a, b])),
                "label": pa.array(np.concatenate([np.minimum(a, b)] * 2)),
            }
        )

    # .repartition() after every aggregate/join: Ray's hash-shuffle operators
    # emit schema-less empty blocks for empty partitions, which Acero joins
    # reject; repartition compacts them away.
    edges = pairs.select_columns(["id_a", "id_b"]).repartition(num_partitions).materialize()
    # size-adaptive: small pair sets (the common case — near-dup edges are
    # bounded by the duplicate count) resolve with an exact driver-side
    # union-find; above the threshold the fully distributed propagation
    # below takes over (the 10^12-doc insurance path).
    if edges.count() <= driver_edges_threshold:
        import ray.data as _rdata

        edges_df = edges.to_pandas()
        # a fully-empty pair set can arrive schema-less (no id_a/id_b cols)
        if len(edges_df) == 0 or "id_a" not in edges_df.columns:
            labels_df = pd.DataFrame({id_col: [], "cluster_rep": []})
        else:
            labels_df = _unionfind_labels(edges_df, id_col)
        if len(labels_df) == 0:
            labels_df = pd.DataFrame({id_col: [], "cluster_rep": []})
        return _rdata.from_pandas(labels_df)

    from ballet_ray.functions.reduce import grouped_reduce

    # label reductions are keyed by doc id (high-cardinality) → the coarse-
    # partition grouped_reduce, not Ray's per-group combine (~60 µs/key)
    labels = (
        grouped_reduce(
            edges.map_batches(seed, batch_format="pyarrow"),
            id_col,
            {"label": "min"},
            num_parts=num_partitions,
            pre_combine=True,
        )
        .repartition(num_partitions)
        .materialize()
    )

    def disagreeing(t: pa.Table) -> pa.Table:
        # join partitions can emit empty schema-less blocks — guard
        if "label_a" not in t.column_names:
            return pa.table({"one": pa.array([], type=pa.int8())})
        t = t.filter(pc.not_equal(t.column("label_a"), t.column("label_b")))
        return pa.table({"one": pa.array(np.ones(len(t), dtype=np.int8))})

    def emit(t: pa.Table) -> pa.Table:
        if "label_a" not in t.column_names:
            return pa.table({id_col: pa.array([]), "label": pa.array([])})
        a = t.column("id_a").to_numpy(zero_copy_only=False)
        b = t.column("id_b").to_numpy(zero_copy_only=False)
        m = np.minimum(
            t.column("label_a").to_numpy(zero_copy_only=False),
            t.column("label_b").to_numpy(zero_copy_only=False),
        )
        return pa.table(
            {id_col: pa.array(np.concatenate([a, b])), "label": pa.array(np.concatenate([m, m]))}
        )

    converged = False
    for _ in range(max_rounds + 1):
        # attach both endpoints' labels to every edge (two hash joins)
        la = edges.join(
            _rename(labels, ["id_a", "label_a"]),
            join_type="inner", num_partitions=num_partitions, on=("id_a",),
        )
        lab = la.join(
            _rename(labels, ["id_b", "label_b"]),
            join_type="inner", num_partitions=num_partitions, on=("id_b",),
        ).materialize()
        # fixed point: no edge's endpoints disagree. The driver sees one int.
        changed = lab.map_batches(disagreeing, batch_format="pyarrow").count()
        if changed == 0:
            converged = True
            break
        # every emitted candidate min(label_a, label_b) ≤ the endpoint's own
        # current label (label_a IS id_a's label), so the grouped Min both
        # propagates and preserves — no union with the old labels needed.
        labels = (
            grouped_reduce(
                lab.map_batches(emit, batch_format="pyarrow"),
                id_col,
                {"label": "min"},
                num_parts=num_partitions,
                pre_combine=True,
            )
            .repartition(num_partitions)
            .materialize()
        )
    if not converged:
        # propagation moves the component minimum one hop per round, so a
        # component with diameter > max_rounds exits unconverged — that
        # silently under-dedups (split clusters). Surface it loudly.
        import warnings

        warnings.warn(
            f"assign_clusters: min-label propagation did not converge within "
            f"{max_rounds} rounds ({changed} edge endpoints still disagree); "
            f"clusters with diameter > {max_rounds} are split. "
            f"Raise max_rounds.",
            RuntimeWarning,
            stacklevel=2,
        )
    return _rename(labels, [id_col, "cluster_rep"])


def cluster_losers(
    clusters, ds=None, *, id_col: str = "doc_id", keep_col: str | None = None,
    keep: str = "max", num_partitions: int | None = None,
):
    """(id, cluster_rep) membership → the ids to DROP, one winner per
    cluster.

    Default winner = the representative itself (the component's min id).
    With ``keep_col`` the winner is instead the member with the ``keep``
    ("max"/"min") value of that ``ds`` column — quality-aware retention
    (keep the longest / highest-scoring near-duplicate), min-id tiebreak,
    NaN scores sort last so they never beat a scored copy.

    Scale shape: member scores attach via ONE distributed hash join
    (cluster membership is bounded by the duplicate count, never
    corpus-sized), then one coarse-partition vectorized pandas pass keyed
    on cluster_rep — never a per-cluster map_groups."""
    from ballet_ray.stages.joins import default_join_partitions

    if keep_col is None:
        return clusters.map_batches(
            lambda t: t.filter(
                pc.not_equal(t.column(id_col), t.column("cluster_rep"))
            ).select([id_col]),
            batch_format="pyarrow",
        )
    if keep not in ("max", "min"):
        raise ValueError(f"keep must be 'max' or 'min', got {keep!r}")
    if ds is None:
        raise ValueError("keep_col requires the source dataset (ds)")
    num_partitions = default_join_partitions(num_partitions)
    scored = clusters.join(
        ds.select_columns([id_col, keep_col]),
        join_type="inner", num_partitions=num_partitions, on=(id_col,),
    )
    n_parts = max(8, num_partitions)

    def add_part(t: pa.Table) -> pa.Table:
        rep = t.column("cluster_rep").to_numpy(zero_copy_only=False)
        h = pd.util.hash_array(rep.astype(object), categorize=False)
        return t.append_column(
            "__part", pa.array((h % np.uint64(n_parts)).astype(np.int64))
        )

    def losers_part(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(
            ["cluster_rep", keep_col, id_col],
            ascending=[True, keep == "min", True],
            na_position="last",
        )
        dup = df.duplicated(subset=["cluster_rep"], keep="first")
        return df.loc[dup, [id_col]]

    return (
        scored.map_batches(add_part, batch_format="pyarrow")
        .groupby("__part")
        .map_groups(losers_part, batch_format="pandas")
    )


def dedup_by_minhash(
    ds, *, text_col: str = "text", id_col: str = "doc_id", resolve: str = "broadcast",
    num_partitions: int | None = None, keep_col: str | None = None, keep: str = "max",
    **lsh_kwargs,
):
    """End-to-end near-dedup: MinHash-LSH candidate pairs → connected
    components → keep one representative row per cluster (the min id by
    default; the best ``keep_col`` member with ``keep_col=...`` — see
    :func:`cluster_losers`).

    The loser set (ids whose cluster_rep differs) is bounded by the
    duplicate count. resolve="broadcast" anti-filters via a broadcast id
    set; resolve="join" does a fully distributed left-anti hash join for
    corpora where even the duplicate count exceeds driver memory.
    """
    from ballet_ray.stages.joins import default_join_partitions

    num_partitions = default_join_partitions(num_partitions)
    pairs = minhash_lsh_pairs(ds, text_col=text_col, id_col=id_col, **lsh_kwargs)
    clusters = assign_clusters(pairs, id_col=id_col, num_partitions=num_partitions)
    if keep_col is not None and clusters.count() == 0:
        return ds  # no near-dups at all (empty clusters can be schema-less)
    loser_ds = cluster_losers(
        clusters, ds, id_col=id_col, keep_col=keep_col, keep=keep,
        num_partitions=num_partitions,
    )
    if resolve == "broadcast":
        losers_df = loser_ds.to_pandas()
        if id_col not in losers_df.columns:  # no dups at all: schema-less empty
            return ds
        losers = losers_df[id_col].to_numpy()
        from ballet_ray.stages.joins import semi_join_filter

        return semi_join_filter(ds, losers, key=id_col, invert=True)

    from ballet_ray.stages.joins import left_anti_join

    return left_anti_join(ds, loser_ds, key=id_col, num_partitions=num_partitions)


# ---------------------------------------------------------------------------
# n-gram Jaccard verification
# ---------------------------------------------------------------------------


def ngram_jaccard_pairs(
    ds, pairs, *, text_col="text", id_col="doc_id", k: int = 3, threshold: float = 0.0,
    num_partitions: int | None = None,
):
    """Exact n-gram Jaccard for candidate pairs. Texts are attached via TWO
    distributed hash joins (pairs⋈texts on id_a, then id_b) — the corpus is
    never collected to the driver."""
    from ballet_ray.stages.joins import default_join_partitions

    num_partitions = default_join_partitions(num_partitions)
    texts = ds.select_columns([id_col, text_col])
    ta = _rename(texts, ["id_a", "__text_a"])
    tb = _rename(texts, ["id_b", "__text_b"])
    joined = pairs.join(ta, join_type="inner", num_partitions=num_partitions, on=("id_a",))
    joined = joined.join(tb, join_type="inner", num_partitions=num_partitions, on=("id_b",))

    def verify(t: pa.Table) -> pa.Table:
        texts_a = t.column("__text_a").to_pylist()
        texts_b = t.column("__text_b").to_pylist()
        fa, oa = _shingle_hash_batch([x or "" for x in texts_a], k)
        fb, ob = _shingle_hash_batch([x or "" for x in texts_b], k)
        ja = np.empty(len(texts_a), dtype=np.float64)
        for i in range(len(texts_a)):
            sa = np.unique(fa[oa[i] : oa[i + 1]])
            sb = np.unique(fb[ob[i] : ob[i + 1]])
            inter = len(np.intersect1d(sa, sb, assume_unique=True))
            ja[i] = inter / max(1, len(sa) + len(sb) - inter)
        out = t.drop_columns(["__text_a", "__text_b"]).append_column(
            "jaccard", pa.array(ja, type=pa.float64())
        )
        return out.filter(pa.array(ja >= threshold))

    return joined.map_batches(verify, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# token-level MinHash (the north-rule canonical table needs no text pass)
# ---------------------------------------------------------------------------


class TokenMinHasher:
    """MinHash signatures straight from the canonical ``tokens:list<int32>``
    column: shingle hashes are a vectorized ``mix`` of k consecutive token
    ids over the batch's flattened token buffer — NO regex, NO Python-level
    text handling anywhere. The right dedup signer for the 10^12-sequence
    pre-tokenized corpus."""

    def __init__(self, num_perm: int = 64, k: int = 3, seed: int = 1754, tokens_col: str = "tokens"):
        rng = np.random.RandomState(seed)
        # 32-bit permutations: uint32 multiplies vectorize ~4× better than
        # uint64 and halve the (shingles × perms) temporary; 2^-32 per-perm
        # collision probability is ample for near-dup banding
        self.a = rng.randint(1, 2**31, size=num_perm).astype(np.uint32) | np.uint32(1)
        self.b = rng.randint(0, 2**31, size=num_perm).astype(np.uint32)
        self.num_perm = num_perm
        self.k = k
        self.tokens_col = tokens_col

    def signatures_from_flat(self, flat_tokens: np.ndarray, offsets: np.ndarray) -> np.ndarray:
        """(flat int tokens, row offsets[n+1]) → (n, num_perm) uint64.

        Fully vectorized: k-1 pad tokens are np.insert-ed after EVERY row so
        each row contributes exactly len(row) shingle positions (≥1 when the
        row is non-empty); one global ``mix`` over k shifted views hashes
        every shingle; pad-crossing positions are masked to UINT64_MAX
        before a chunked ``np.minimum.reduceat`` — no per-row Python."""
        n = len(offsets) - 1
        if n == 0:
            return np.empty((0, self.num_perm), dtype=np.uint64)
        k = self.k
        lens = np.diff(offsets)
        flat = flat_tokens.astype(np.uint64)
        if k > 1:
            flat = np.insert(flat, np.repeat(offsets[1:], k - 1), np.uint64(0))
        m = len(flat) - k + 1
        if m <= 0:  # all rows empty — same uint32-max sentinel as masked rows
            return np.full((n, self.num_perm), np.iinfo(np.uint32).max, dtype=np.uint64)
        sh = (mix(*[flat[j : m + j] for j in range(k)]) >> np.uint64(32)).astype(np.uint32)
        noff = (offsets[:-1] + np.arange(n, dtype=np.int64) * (k - 1)).clip(0, m - 1)
        ends = np.minimum(noff + np.maximum(lens, 1), m)  # empty rows get 1 masked pos
        # valid-shingle mask via range-marking cumsum
        marks = np.zeros(m + 1, dtype=np.int32)
        np.add.at(marks, noff, 1)
        np.add.at(marks, np.minimum(noff + lens, m), -1)
        valid = np.cumsum(marks[:-1]) > 0
        UMAX = np.uint32(np.iinfo(np.uint32).max)
        out = np.empty((n, self.num_perm), dtype=np.uint64)
        CHUNK = 1 << 15  # 32k positions → 8 MB temporary: cache-resident
        # (measured 2.9× faster than 512k chunks — the kernel is bandwidth-bound)
        row = 0
        # TRANSPOSED layout: p is (perms, positions), so the segment-min
        # reduceat runs over contiguous row-major segments per permutation —
        # measured 46× faster than reduceat over axis 0 of a (positions,
        # perms) array, whose inner loop strides per element. The chunk
        # buffer is reused across chunks; mult/add are in-place.
        buf = np.empty((self.num_perm, CHUNK), dtype=np.uint32)
        with np.errstate(over="ignore"):
            while row < n:
                hi = row
                while hi < n and ends[hi] - noff[row] <= CHUNK:
                    hi += 1
                hi = max(hi, row + 1)  # a single huge row still advances
                a, b = noff[row], ends[hi - 1]
                p = buf[:, : b - a] if b - a <= CHUNK else np.empty((self.num_perm, b - a), np.uint32)
                np.multiply(self.a[:, None], sh[None, a:b], out=p)
                p += self.b[:, None]
                p[:, ~valid[a:b]] = UMAX
                out[row:hi] = np.minimum.reduceat(p, noff[row:hi] - a, axis=1).T
                row = hi
        empty_rows = lens == 0
        if empty_rows.any():
            # k==1 inserts no pad tokens, so an empty row's reduceat start
            # coincides with its successor's and would copy the neighbor's
            # first permutation value — force the sentinel explicitly
            out[empty_rows] = np.uint64(UMAX)
        return out

    def __call__(self, table: pa.Table) -> pa.Table:
        col = table.column(self.tokens_col)
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        if pa.types.is_list(col.type) or pa.types.is_large_list(col.type):
            flat = np.asarray(col.flatten().to_numpy(zero_copy_only=False))
            offsets = np.asarray(col.offsets).astype(np.int64)
        else:
            # Ray tensor-extension / object fallback (from_pandas ndarray
            # columns): rebuild the flat buffer + offsets
            rows = col.to_numpy(zero_copy_only=False)
            offsets = np.zeros(len(rows) + 1, dtype=np.int64)
            for i, r in enumerate(rows):
                offsets[i + 1] = offsets[i] + len(r)
            flat = (
                np.concatenate([np.asarray(r) for r in rows])
                if len(rows)
                else np.empty(0, dtype=np.int64)
            )
        sigs = self.signatures_from_flat(flat, offsets)
        arr = pa.FixedSizeListArray.from_arrays(pa.array(sigs.astype(np.int64).ravel()), self.num_perm)
        return table.append_column("minhash", arr)


def token_minhash_lsh_pairs(
    ds, *, tokens_col: str = "tokens", id_col: str = "doc_id",
    num_perm: int = 64, shingle_k: int = 3, **lsh_kwargs,
):
    """minhash_lsh_pairs over the pre-tokenized ``tokens:list<int32>``
    column: same band/bucket/verify machinery, token-level signer — no
    regex or text handling anywhere in the hot path."""
    projected = ds.select_columns([id_col, tokens_col])
    signed = projected.map_batches(
        lambda t, np_=num_perm, k_=shingle_k, tc=tokens_col: TokenMinHasher(
            num_perm=np_, k=k_, tokens_col=tc
        )(t),
        batch_format="pyarrow",
        batch_size=4096,  # chunked kernel bounds the temporary regardless
    ).select_columns([id_col, "minhash"])
    return _lsh_pairs_from_signed(signed, id_col=id_col, num_perm=num_perm, **lsh_kwargs)


def dedup_by_token_minhash(
    ds, *, tokens_col: str = "tokens", id_col: str = "doc_id",
    resolve: str = "broadcast", num_partitions: int | None = None,
    keep_col: str | None = None, keep: str = "max", **lsh_kwargs,
):
    """End-to-end near-dedup of the PRE-TOKENIZED canonical table
    (doc_id, tokens:list<int32>, …): :func:`token_minhash_lsh_pairs` →
    connected components → keep one row per cluster — the min id by
    default, the best ``keep_col`` member (e.g. ``n_tok`` for
    keep-the-longest) via :func:`cluster_losers`. The token twin of
    :func:`dedup_by_minhash`; no text or regex anywhere in the hot path,
    and the loser set stays bounded by the duplicate count."""
    from ballet_ray.stages.joins import default_join_partitions

    num_partitions = default_join_partitions(num_partitions)
    pairs = token_minhash_lsh_pairs(
        ds, tokens_col=tokens_col, id_col=id_col, **lsh_kwargs)
    clusters = assign_clusters(pairs, id_col=id_col, num_partitions=num_partitions)
    if keep_col is not None and clusters.count() == 0:
        return ds  # no near-dups at all (empty clusters can be schema-less)
    loser_ds = cluster_losers(
        clusters, ds, id_col=id_col, keep_col=keep_col, keep=keep,
        num_partitions=num_partitions,
    )
    if resolve == "broadcast":
        losers_df = loser_ds.to_pandas()
        if id_col not in losers_df.columns:  # no dups: schema-less empty
            return ds
        from ballet_ray.stages.joins import semi_join_filter

        return semi_join_filter(
            ds, losers_df[id_col].to_numpy(), key=id_col, invert=True)

    from ballet_ray.stages.joins import left_anti_join

    return left_anti_join(ds, loser_ds, key=id_col, num_partitions=num_partitions)


def duplicate_passages(
    ds, *, text_col: str = "text", id_col: str = "doc_id", n: int = 8,
    min_count: int = 2, key: str = "hash", return_docs: bool = False,
):
    """Corpus-wide duplicate passage detection — the building block of
    substring-level exact dedup (Lee et al. 2022, "Deduplicating Training
    Data Makes Language Models Better", arXiv:2107.06499: duplicated
    spans, not whole documents, dominate web corpora).

    Every overlapping ``n``-word window of every document becomes a keyed
    row; one groupby counts window occurrences corpus-wide; windows seen
    ``>= min_count`` times are the duplicated passages. Per batch the
    window materialization is vectorized (one Arrow split + one
    ``binary_join`` over reused int32 gather indices — no per-row
    Python); with ``key='hash'`` (the scale mode) only a uint64 siphash
    per window is shuffled, never the window text; ``key='text'`` ships
    the passage strings themselves (SQL-oracle-able, and what you want
    for small-corpus auditing anyway).

    Returns (passage_key, dup_count) rows, or with ``return_docs`` the
    (passage_key, id) pairs of every document containing a duplicated
    passage (dedup'd per doc×passage).
    """
    wins = _passage_windows(ds, text_col=text_col, id_col=id_col, n=n,
                            key=key, return_docs=return_docs)
    return _count_dup_keys(wins, id_col=id_col, min_count=min_count, return_docs=return_docs)


def _passage_windows(ds, *, text_col: str, id_col: str, n: int, key: str,
                     return_docs: bool):
    """(window-key[, id]) rows for every overlapping n-word window — the
    shared front of duplicate_passages / duplication_scores."""
    import pyarrow.compute as pc

    from ballet_ray.functions.partition import stable_hash_array

    def windows(t: pa.Table) -> pa.Table:
        words = pc.split_pattern(
            pc.fill_null(pc.cast(t.column(text_col), pa.string()), ""), " "
        )
        if isinstance(words, pa.ChunkedArray):
            words = words.combine_chunks()
        lens = pc.list_value_length(words).to_numpy(zero_copy_only=False).astype(np.int64)
        row_starts = np.concatenate([[0], np.cumsum(lens)[:-1]])
        n_win = np.maximum(lens - n + 1, 0)
        total = int(n_win.sum())
        if total == 0:
            empty = pa.table({"k": pa.array([], pa.string() if key == "text" else pa.int64())})
            return empty.append_column(id_col, t.column(id_col).slice(0, 0)) if return_docs else empty
        row_idx = np.repeat(np.arange(len(lens)), n_win)
        excl = np.concatenate([[0], np.cumsum(n_win)[:-1]])
        win_start = (np.arange(total, dtype=np.int64) - np.repeat(excl, n_win)
                     + row_starts[row_idx])
        # one (total*n) int32 gather builds all windows as a list array
        idx = (np.repeat(win_start, n).astype(np.int32)
               + np.tile(np.arange(n, dtype=np.int32), total))
        flat = pc.list_flatten(words).take(pa.array(idx))
        offsets = pa.array(np.arange(0, (total + 1) * n, n, dtype=np.int32))
        joined = pc.binary_join(pa.ListArray.from_arrays(offsets, flat), " ")
        if key == "hash":
            # int64 view — Ray's aggregate sort path rejects uint64 keys
            ks = pa.array(stable_hash_array(joined.to_numpy(zero_copy_only=False)).view(np.int64))
        else:
            ks = joined
        out = pa.table({"k": ks})
        if return_docs:
            out = out.append_column(id_col, t.column(id_col).take(pa.array(row_idx)))
        return out

    return ds.select_columns([id_col, text_col]).map_batches(windows, batch_format="pyarrow")


def duplication_scores(
    ds, *, text_col: str = "text", id_col: str = "doc_id", n: int = 8,
    min_count: int = 2, key: str = "hash", tokens_col: str | None = None,
):
    """Per-document duplication fraction — the Dolma/RefinedWeb quality
    signal "how much of this doc exists elsewhere in the corpus": for each
    doc, the fraction of its DISTINCT ``n``-word windows that appear in at
    least ``min_count`` distinct documents. 0 = fully unique, 1 = every
    passage is shared. Docs shorter than ``n`` words have no windows and
    emit no row.

    Plan (text never shuffles; all exchanged rows are keys/ids):

    1. the :func:`duplicate_passages` window pass → (window-key, id);
    2. distinct (key, id) via one keyed count; distinct docs per key via a
       second; keys at or above ``min_count`` become a __dup=1 flag table;
    3. one LEFT join flags each (key, id) row, and one coarse grouped
       reduction per id yields (n_windows, n_dup_windows, dup_frac).

    Returns a Dataset (id, n_windows, n_dup_windows, dup_frac).
    """
    import pyarrow.compute as pc

    from ballet_ray.functions.reduce import grouped_reduce
    from ballet_ray.stages.joins import (
        default_join_partitions,
        hash_join,
        scrub_empty_blocks,
    )

    if tokens_col is not None:
        # north-rule-native mode: Horner-hash windows over the canonical
        # tokens column (no text materialization); keys are always hashes
        key = "hash"
        wins = _token_passage_windows(ds, tokens_col=tokens_col,
                                      id_col=id_col, n=n, return_docs=True)
    else:
        wins = _passage_windows(ds, text_col=text_col, id_col=id_col, n=n,
                                key=key, return_docs=True)
    per_doc = wins.groupby(["k", id_col]).count().drop_columns(["count()"])
    counts = per_doc.groupby("k").count()

    def flag(t: pa.Table) -> pa.Table:
        t = t.filter(pc.greater_equal(t.column("count()"), min_count))
        return pa.table({"k": t.column("k"),
                         "__dup": pa.array(np.ones(len(t), np.int64))})

    dup_keys = scrub_empty_blocks(
        counts.map_batches(flag, batch_format="pyarrow"),
        schema=pa.schema([
            pa.field("k", pa.int64() if key == "hash" else pa.string()),
            pa.field("__dup", pa.int64()),
        ]),
    )

    if dup_keys.count() == 0:
        def all_unique(t: pa.Table) -> pa.Table:
            return t.append_column("__dup", pa.array(np.zeros(len(t), np.int64)))

        flagged = per_doc.map_batches(all_unique, batch_format="pyarrow")
    else:
        flagged = hash_join(per_doc, dup_keys, on=("k",), how="left_outer",
                            num_partitions=default_join_partitions(None))

    def to_partials(t: pa.Table) -> pa.Table:
        dup = pc.fill_null(t.column("__dup"), 0)
        return pa.table({
            id_col: t.column(id_col),
            "n_windows": pa.array(np.ones(len(t), np.int64)),
            "n_dup_windows": dup.cast(pa.int64()),
        })

    scores = grouped_reduce(
        flagged.map_batches(to_partials, batch_format="pyarrow"),
        id_col, {"n_windows": "sum", "n_dup_windows": "sum"}, pre_combine=True,
    )

    def finish(t: pa.Table) -> pa.Table:
        nw = t.column("n_windows").to_numpy(zero_copy_only=False).astype(np.float64)
        nd = t.column("n_dup_windows").to_numpy(zero_copy_only=False).astype(np.float64)
        return t.append_column("dup_frac", pa.array(nd / np.maximum(nw, 1.0)))

    return scores.map_batches(finish, batch_format="pyarrow")


def _count_dup_keys(wins, *, id_col: str, min_count: int, return_docs: bool):
    """Shared tail of the duplicate-passage operators: count window keys
    corpus-wide (docs mode: distinct docs per key) and keep keys seen
    ``>= min_count`` times; docs mode joins the kept keys back fully
    distributed."""
    import pyarrow.compute as pc

    def keep_dups(t: pa.Table) -> pa.Table:
        return t.filter(pc.greater_equal(t.column("count()"), min_count))

    if not return_docs:
        counts = wins.groupby("k").count()
        dup = counts.map_batches(keep_dups, batch_format="pyarrow")
        return _rename(dup, ["passage_key", "dup_count"])
    # docs mode: count distinct docs per window, keep windows above the
    # bar, then emit (passage, doc) pairs — both sides stay Datasets
    per_doc = wins.groupby(["k", id_col]).count().drop_columns(["count()"])
    counts = per_doc.groupby("k").count()
    dup_keys = counts.map_batches(keep_dups, batch_format="pyarrow").drop_columns(["count()"])
    from ballet_ray.stages.joins import (
        _arrow_schema_or_none,
        default_join_partitions,
        hash_join,
        scrub_empty_blocks,
    )

    # the kept-keys side is small (keys above the bar); scrubbing it also
    # catches the no-duplicates corpus, where a zero-row join side would
    # leave Ray's join aggregators schema-less
    dup_keys = scrub_empty_blocks(dup_keys, schema=pa.schema([pa.field("k", pa.int64())]))
    if dup_keys.count() == 0:
        import ray.data as rd

        s = _arrow_schema_or_none(per_doc)
        id_type = s.field(id_col).type if s is not None and id_col in s.names else pa.string()
        return rd.from_arrow(pa.schema([
            pa.field("passage_key", pa.int64()), pa.field(id_col, id_type),
        ]).empty_table())
    out = hash_join(per_doc, dup_keys, on=("k",), num_partitions=default_join_partitions(None))
    return _rename(out, ["passage_key", id_col])


def token_duplicate_passages(
    ds, *, tokens_col: str = "tokens", id_col: str = "doc_id", n: int = 16,
    min_count: int = 2, return_docs: bool = False, window_chunk: int = 1 << 20,
):
    """:func:`duplicate_passages` over the canonical ``tokens:list<int32>``
    column — no text, no regex, no string materialization anywhere: each
    overlapping ``n``-token window is reduced to a uint64 key by a
    vectorized Horner polynomial over the flat token buffer (processed in
    ``window_chunk``-window chunks so the working set stays ~8·n bytes per
    window in flight), finished with the splitmix64 mixer. Only (key[,
    id]) rows ever shuffle — the token payload stays in the map stage.
    """
    wins = _token_passage_windows(ds, tokens_col=tokens_col, id_col=id_col,
                                  n=n, return_docs=return_docs,
                                  window_chunk=window_chunk)
    return _count_dup_keys(wins, id_col=id_col, min_count=min_count, return_docs=return_docs)


def _token_passage_windows(ds, *, tokens_col: str, id_col: str, n: int,
                           return_docs: bool, window_chunk: int = 1 << 20):
    """(Horner-hash window key[, id]) rows over the flat token buffer —
    the shared front of token_duplicate_passages / duplication_scores."""

    def windows(t: pa.Table) -> pa.Table:
        keys, n_win = _token_window_hashes(t.column(tokens_col), n, window_chunk)
        if keys is None:
            out = pa.table({"k": pa.array([], pa.int64())})
            return out.append_column(id_col, t.column(id_col).slice(0, 0)) if return_docs else out
        # int64 view: Ray's aggregate sort path rejects uint64 keys
        # (falls back to pickled-object arrays); the bit pattern is what
        # matters, not the sign
        out = pa.table({"k": pa.array(keys.view(np.int64))})
        if return_docs:
            row_idx = np.repeat(np.arange(len(n_win)), n_win)
            out = out.append_column(id_col, t.column(id_col).take(pa.array(row_idx)))
        return out

    return ds.select_columns([id_col, tokens_col]).map_batches(windows, batch_format="pyarrow")


def _token_window_hashes(col, n: int, window_chunk: int = 1 << 20):
    """(splitmix64-finished Horner keys of every overlapping ``n``-token
    window, per-row window counts) over a ``list<int>`` column — the
    vectorized kernel shared by token_duplicate_passages /
    duplication_scores / find_contaminated_tokens. Keys is ``None`` when
    the batch has no windows. Processed in ``window_chunk``-window chunks
    so the in-flight working set stays ~8·n bytes per window."""
    from ballet_ray.functions.hashing import splitmix64

    P = np.uint64(0x100000001B3)  # FNV prime, odd => full-period mod 2^64

    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    lens = pc.list_value_length(col)
    lens = pc.fill_null(lens, 0).to_numpy(zero_copy_only=False).astype(np.int64)
    flat = pc.list_flatten(col).to_numpy(zero_copy_only=False).astype(np.uint64)
    row_starts = np.concatenate([[0], np.cumsum(lens)[:-1]])
    n_win = np.maximum(lens - n + 1, 0)
    total = int(n_win.sum())
    if total == 0:
        return None, n_win
    row_idx = np.repeat(np.arange(len(lens)), n_win)
    excl = np.concatenate([[0], np.cumsum(n_win)[:-1]])
    win_start = (np.arange(total, dtype=np.int64) - np.repeat(excl, n_win)
                 + row_starts[row_idx])
    keys = np.empty(total, np.uint64)
    with np.errstate(over="ignore"):
        for lo in range(0, total, window_chunk):
            hi = min(total, lo + window_chunk)
            ws = win_start[lo:hi]
            h = flat[ws].copy()
            for j in range(1, n):
                h *= P
                h += flat[ws + j]
            keys[lo:hi] = h
    return splitmix64(keys), n_win


def remove_duplicate_spans(
    ds, *, tokens_col: str = "tokens", id_col: str = "doc_id", n: int = 16,
    num_partitions: int | None = None, window_chunk: int = 1 << 20,
):
    """Exact substring-level dedup over the canonical tokens column (Lee
    et al. 2022, arXiv:2107.06499 §3: remove every duplicated ``n``-token
    span, keeping its first occurrence): rows come back with the
    duplicated spans cut out.

    Plan (all stages bounded; the token payload shuffles exactly once,
    in the final id-keyed join):

    1. window pass — every overlapping ``n``-token window → (key, id,
       off) rows, Horner-hashed like :func:`token_duplicate_passages`;
    2. loser selection — coarse hash-partition on key, ONE vectorized
       sort + ``duplicated(key)`` pass per partition (no per-key
       map_groups): every occurrence except the global lexicographic
       first (min id, then min offset) is a loser;
    3. per-doc aggregation — loser offsets coarse-partitioned by id and
       list-aggregated, so the doc join is one row per affected doc;
    4. left join + rewrite — losers join the token table (left outer,
       list payload auto-packed); affected rows clear the union of
       [off, off+n) ranges via one cumulative-sum mask and gather.

    Winner spans survive verbatim; overlapping loser windows merge into
    single removed spans (the mask union). Docs without duplicated spans
    pass through untouched. Output: (id, tokens, n_tok, n_removed).
    """
    from ballet_ray.functions.hashing import splitmix64
    from ballet_ray.stages.joins import default_join_partitions, hash_join

    num_partitions = default_join_partitions(num_partitions)
    P = np.uint64(0x100000001B3)

    def windows(t: pa.Table) -> pa.Table:
        col = t.column(tokens_col)
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        lens = pc.fill_null(pc.list_value_length(col), 0).to_numpy(zero_copy_only=False).astype(np.int64)
        fvals = pc.list_flatten(col)
        if pa.types.is_string(fvals.type) or pa.types.is_large_string(fvals.type):
            # string lists (word sequences): one vectorized siphash pass
            flat = stable_hash_array(fvals.to_numpy(zero_copy_only=False)).astype(np.uint64)
        else:
            flat = fvals.to_numpy(zero_copy_only=False).astype(np.uint64)
        row_starts = np.concatenate([[0], np.cumsum(lens)[:-1]])
        n_win = np.maximum(lens - n + 1, 0)
        total = int(n_win.sum())
        if total == 0:
            return pa.table({"k": pa.array([], pa.int64()),
                             id_col: t.column(id_col).slice(0, 0),
                             "off": pa.array([], pa.int32()),
                             "w": pa.array([], pa.bool_())})
        row_idx = np.repeat(np.arange(len(lens)), n_win)
        excl = np.concatenate([[0], np.cumsum(n_win)[:-1]])
        off = (np.arange(total, dtype=np.int64) - np.repeat(excl, n_win))
        win_start = off + row_starts[row_idx]
        keys = np.empty(total, np.uint64)
        with np.errstate(over="ignore"):
            for lo in range(0, total, window_chunk):
                hi = min(total, lo + window_chunk)
                ws = win_start[lo:hi]
                h = flat[ws].copy()
                for j in range(1, n):
                    h *= P
                    h += flat[ws + j]
                keys[lo:hi] = h
        id_arr = t.column(id_col).take(pa.array(row_idx))
        off32 = off.astype(np.int32)
        kk = splitmix64(keys)
        w = _block_winner_mask(
            kk, id_arr.to_numpy(zero_copy_only=False), off32)
        return pa.table({"k": pa.array(kk.view(np.int64)),
                         id_col: id_arr,
                         "off": pa.array(off32),
                         "w": pa.array(w)})

    keyed = ds.select_columns([id_col, tokens_col]).map_batches(
        windows, batch_format="pyarrow")

    kparts = max(8, num_partitions)
    losers = _losers_from_keyed(keyed, id_col=id_col, kparts=kparts)
    joined = _attach_offsets(ds.select_columns([id_col, tokens_col]), losers,
                             ds=ds, id_col=id_col, kparts=kparts,
                             num_partitions=num_partitions)

    def rewrite(t: pa.Table) -> pa.Table:
        col = t.column(tokens_col)
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        lens = pc.fill_null(pc.list_value_length(col), 0).to_numpy(zero_copy_only=False).astype(np.int64)
        flat = pc.list_flatten(col)
        row_starts = np.concatenate([[0], np.cumsum(lens)[:-1]])
        offs_col = t.column("__offs").to_pylist()
        total = int(lens.sum())
        keep = np.ones(total, dtype=np.int8)
        for i, offs in enumerate(offs_col):
            if offs is None or len(offs) == 0:
                continue
            base = row_starts[i]
            # union of [off, off+n) via a difference array
            diff = np.zeros(int(lens[i]) + 1, np.int32)
            o = np.asarray(offs, dtype=np.int64)
            np.add.at(diff, o, 1)
            np.add.at(diff, np.minimum(o + n, lens[i]), -1)
            covered = np.cumsum(diff[:-1]) > 0
            keep[base : base + lens[i]] = ~covered
        sel = np.flatnonzero(keep)
        new_flat = flat.take(pa.array(sel.astype(np.int64)))
        cs = np.concatenate([[0], np.cumsum(keep, dtype=np.int64)])
        row_ends = row_starts + lens
        kept_per_row = cs[row_ends] - cs[row_starts]
        offsets = np.concatenate([[0], np.cumsum(kept_per_row)])
        return pa.table({
            id_col: t.column(id_col),
            tokens_col: pa.ListArray.from_arrays(pa.array(offsets, pa.int32()), new_flat),
            "n_tok": pa.array(kept_per_row.astype(np.int32)),
            "n_removed": pa.array((lens - kept_per_row).astype(np.int32)),
        })

    return joined.map_batches(rewrite, batch_format="pyarrow")


def remove_duplicate_lines(
    ds, *, text_col: str = "text", id_col: str = "doc_id",
    normalize: bool = True, min_chars: int = 1, num_partitions: int | None = None,
    carry_cols: tuple = (), unit: str = "line",
):
    """Corpus-wide exact LINE dedup (the C4 / RefinedWeb / Dolma text-side
    counterpart of :func:`remove_duplicate_spans`): every line whose
    normalized text occurs anywhere else in the corpus is removed except
    the global first occurrence (min id, then min line number). Boilerplate
    nav bars, cookie banners and licence footers — the dominant web-crawl
    duplication mode — disappear while each doc keeps its unique content.

    ``normalize`` keys lines on ``lower(strip(line))`` (removal still
    rewrites the ORIGINAL lines); lines shorter than ``min_chars`` after
    normalization (blank lines by default) are structural and never keyed.

    Plan (same bounded shape as remove_duplicate_spans — the text payload
    shuffles exactly once, in the final id-keyed join):

    1. key pass — Arrow ``split_pattern`` lines → (line-hash, id, line_no);
    2. loser selection — coarse hash-partition on the key, one vectorized
       sort + ``duplicated`` pass per partition;
    3. per-doc aggregation of loser line numbers (Arrow list offsets);
    4. left join + rewrite — drop loser lines, ``binary_join`` the rest.

    Output: (id, text, n_lines, n_removed, *carry_cols) — ``carry_cols``
    ride the payload side of the one id-keyed join untouched, so callers
    that need extra columns downstream (e.g. a mixture group column)
    avoid a second corpus-wide re-join.

    ``unit="paragraph"`` dedups blank-line-separated paragraphs instead of
    single lines (the Dolma/RefinedWeb paragraph-level variant — catches
    multi-line boilerplate blocks a per-line pass would only trim line by
    line): split key becomes ``"\\n\\n"``, rejoin mirrors it, everything
    else (first-occurrence rule, plan shape, carry_cols) is identical.
    """
    if unit not in ("line", "paragraph"):
        raise ValueError(f"unit must be 'line' or 'paragraph', got {unit!r}")
    sep = "\n" if unit == "line" else "\n\n"
    from ballet_ray.stages.joins import (
        default_join_partitions,
        hash_join,
        scrub_empty_blocks,
    )

    num_partitions = default_join_partitions(num_partitions)

    def _line_lists(t: pa.Table) -> pa.ListArray:
        col = t.column(text_col)
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        return pc.split_pattern(
            pc.fill_null(pc.cast(col, pa.string()), ""), sep
        )

    def keys(t: pa.Table) -> pa.Table:
        lines = _line_lists(t)
        lens = pc.list_value_length(lines).to_numpy(zero_copy_only=False).astype(np.int64)
        flat = pc.list_flatten(lines)
        norm = pc.utf8_lower(pc.utf8_trim_whitespace(flat)) if normalize else flat
        nlen = pc.utf8_length(norm).to_numpy(zero_copy_only=False).astype(np.int64)
        h = stable_hash_array(norm.to_numpy(zero_copy_only=False))
        total = int(lens.sum())
        row_idx = np.repeat(np.arange(len(lens)), lens)
        excl = np.concatenate([[0], np.cumsum(lens)[:-1]])
        line_no = np.arange(total, dtype=np.int64) - np.repeat(excl, lens)
        mask = nlen >= min_chars
        id_arr = t.column(id_col).take(pa.array(row_idx[mask]))
        off_np = line_no[mask].astype(np.int32)
        w = _block_winner_mask(
            h[mask], id_arr.to_numpy(zero_copy_only=False), off_np)
        return pa.table({
            "k": pa.array(h[mask].view(np.int64)),
            id_col: id_arr,
            "off": pa.array(off_np),
            "w": pa.array(w),
        })

    keyed = ds.select_columns([id_col, text_col]).map_batches(
        keys, batch_format="pyarrow")

    kparts = max(8, num_partitions)
    losers = _losers_from_keyed(keyed, id_col=id_col, kparts=kparts)
    payload_cols = [id_col, text_col, *carry_cols]
    joined = _attach_offsets(ds.select_columns(payload_cols), losers,
                             ds=ds, id_col=id_col, kparts=kparts,
                             num_partitions=num_partitions)

    def rewrite(t: pa.Table) -> pa.Table:
        lines = _line_lists(t)
        lens = pc.list_value_length(lines).to_numpy(zero_copy_only=False).astype(np.int64)
        flat = pc.list_flatten(lines)
        row_starts = np.concatenate([[0], np.cumsum(lens)[:-1]])
        total = int(lens.sum())
        keep = np.ones(total, dtype=bool)
        for i, offs in enumerate(t.column("__offs").to_pylist()):
            if offs:
                keep[row_starts[i] + np.asarray(offs, dtype=np.int64)] = False
        sel = np.flatnonzero(keep)
        new_flat = flat.take(pa.array(sel.astype(np.int64)))
        cs = np.concatenate([[0], np.cumsum(keep, dtype=np.int64)])
        kept_per_row = cs[row_starts + lens] - cs[row_starts]
        offsets = np.concatenate([[0], np.cumsum(kept_per_row)]).astype(np.int32)
        rebuilt = pc.binary_join(
            pa.ListArray.from_arrays(pa.array(offsets), new_flat), sep
        )
        out = {
            id_col: t.column(id_col),
            text_col: rebuilt,
            "n_lines": pa.array(kept_per_row.astype(np.int32)),
            "n_removed": pa.array((lens - kept_per_row).astype(np.int32)),
        }
        for c in carry_cols:
            out[c] = t.column(c)
        return pa.table(out)

    return joined.map_batches(rewrite, batch_format="pyarrow")


def find_contaminated(
    corpus, eval_ds, *, text_col: str = "text", id_col: str = "doc_id",
    n: int = 8, key: str = "hash", with_fraction: bool = False,
):
    """Benchmark decontamination (the GPT-3/PaLM appendix procedure): count,
    per corpus document, how many of its ``n``-word windows appear anywhere
    in the evaluation set.

    ``with_fraction=True`` additionally emits ``n_windows`` (the doc's
    total window count) and ``hit_frac = n_hits / n_windows`` — PaLM's
    decision rule drops a doc when ≥70% of its 8-grams are contaminated,
    so the fraction, not the raw count, is what a filter thresholds.
    The division is int/int in float64 on both this side and the SQL
    oracle, so values are bit-identical.

    Scale shape: the eval side is small by definition — its distinct
    window keys are collected once and broadcast via ``ray.put``; the
    corpus side streams through one ``map_batches`` doing a sorted-array
    membership test (``np.searchsorted``) and per-doc segment sums. No
    shuffle at all on the corpus side. ``key='hash'`` broadcasts uint64
    siphashes (the scale mode); ``key='text'`` broadcasts the window
    strings themselves (exact, SQL-oracle-able).

    Returns (id, n_hits) for corpus docs with ``n_hits > 0``.
    """
    import ray as _ray

    def batch_windows(t: pa.Table):
        words = pc.split_pattern(
            pc.fill_null(pc.cast(t.column(text_col), pa.string()), ""), " "
        )
        if isinstance(words, pa.ChunkedArray):
            words = words.combine_chunks()
        lens = pc.list_value_length(words).to_numpy(zero_copy_only=False).astype(np.int64)
        row_starts = np.concatenate([[0], np.cumsum(lens)[:-1]])
        n_win = np.maximum(lens - n + 1, 0)
        total = int(n_win.sum())
        if total == 0:
            return None, n_win
        row_idx = np.repeat(np.arange(len(lens)), n_win)
        excl = np.concatenate([[0], np.cumsum(n_win)[:-1]])
        win_start = (np.arange(total, dtype=np.int64) - np.repeat(excl, n_win)
                     + row_starts[row_idx])
        idx = (np.repeat(win_start, n).astype(np.int32)
               + np.tile(np.arange(n, dtype=np.int32), total))
        flat = pc.list_flatten(words).take(pa.array(idx))
        offsets = pa.array(np.arange(0, (total + 1) * n, n, dtype=np.int32))
        joined = pc.binary_join(pa.ListArray.from_arrays(offsets, flat), " ")
        if key == "hash":
            return stable_hash_array(joined.to_numpy(zero_copy_only=False)), n_win
        return joined.to_numpy(zero_copy_only=False), n_win

    def eval_keys(t: pa.Table) -> pa.Table:
        ks, _ = batch_windows(t)
        if ks is None:
            ks = np.empty(0, np.uint64 if key == "hash" else object)
        return pa.table({"k": pa.array(np.unique(ks))})

    ev = eval_ds.select_columns([id_col, text_col]).map_batches(eval_keys, batch_format="pyarrow").to_pandas()
    # an eval set with no windows at all comes back as a column-less frame
    evk = ev["k"].to_numpy() if "k" in ev.columns else np.empty(
        0, np.uint64 if key == "hash" else object)
    eval_set = np.sort(np.unique(evk))
    sref = _ray.put(eval_set)

    def hits(t: pa.Table) -> pa.Table:
        es = _ray.get(sref)
        ks, n_win = batch_windows(t)
        nh = np.zeros(len(t), np.int64)
        if ks is not None and len(es):
            pos = np.searchsorted(es, ks)
            pos[pos >= len(es)] = len(es) - 1
            member = (es[pos] == ks).astype(np.int64)
            nz = n_win > 0
            starts = np.concatenate([[0], np.cumsum(n_win)[:-1]])
            cs = np.concatenate([[0], np.cumsum(member)])
            nh[nz] = cs[(starts + n_win)[nz]] - cs[starts[nz]]
        cols = {id_col: t.column(id_col), "n_hits": pa.array(nh)}
        if with_fraction:
            cols["n_windows"] = pa.array(n_win)
            with np.errstate(divide="ignore", invalid="ignore"):
                frac = np.where(n_win > 0, nh / np.maximum(n_win, 1), 0.0)
            cols["hit_frac"] = pa.array(frac)
        out = pa.table(cols)
        return out.filter(pc.greater(out.column("n_hits"), 0))

    return corpus.select_columns([id_col, text_col]).map_batches(hits, batch_format="pyarrow")


def find_contaminated_tokens(
    corpus, eval_ds, *, tokens_col: str = "tokens", id_col: str = "doc_id",
    n: int = 16, with_fraction: bool = False, window_chunk: int = 1 << 20,
):
    """:func:`find_contaminated` over the canonical pre-tokenized
    ``tokens: list<int32>`` column — benchmark decontamination exactly as
    a tokenized-corpus pipeline runs it (GPT-3/PaLM appendix rule applied
    to token n-grams): count, per corpus document, how many of its ``n``-
    token windows appear anywhere in the evaluation set; with
    ``with_fraction=True`` also emit ``n_windows`` and
    ``hit_frac = n_hits / n_windows`` (PaLM drops at ≥70%).

    No text, no regex, no string materialization: windows reduce to
    uint64 keys via the shared vectorized Horner kernel
    (:func:`_token_window_hashes`). The eval side is small by definition —
    its distinct window keys collect once and broadcast via ``ray.put``;
    the corpus side streams through ONE ``map_batches`` doing a
    sorted-array membership test + per-doc segment sums. Zero shuffle.

    Returns (id, n_hits[, n_windows, hit_frac]) for docs with
    ``n_hits > 0``.
    """
    import ray as _ray

    def eval_keys(t: pa.Table) -> pa.Table:
        ks, _ = _token_window_hashes(t.column(tokens_col), n, window_chunk)
        if ks is None:
            ks = np.empty(0, np.uint64)
        return pa.table({"k": pa.array(np.unique(ks))})

    ev = (eval_ds.select_columns([tokens_col])
          .map_batches(eval_keys, batch_format="pyarrow").to_pandas())
    # an eval set with no windows at all comes back as a column-less frame
    ks = ev["k"].to_numpy() if "k" in ev.columns else np.empty(0, np.uint64)
    eval_set = np.sort(np.unique(ks)).astype(np.uint64)
    sref = _ray.put(eval_set)

    def hits(t: pa.Table) -> pa.Table:
        es = _ray.get(sref)
        ks, n_win = _token_window_hashes(t.column(tokens_col), n, window_chunk)
        nh = np.zeros(len(t), np.int64)
        if ks is not None and len(es):
            pos = np.searchsorted(es, ks)
            pos[pos >= len(es)] = len(es) - 1
            member = (es[pos] == ks).astype(np.int64)
            nz = n_win > 0
            starts = np.concatenate([[0], np.cumsum(n_win)[:-1]])
            cs = np.concatenate([[0], np.cumsum(member)])
            nh[nz] = cs[(starts + n_win)[nz]] - cs[starts[nz]]
        cols = {id_col: t.column(id_col), "n_hits": pa.array(nh)}
        if with_fraction:
            cols["n_windows"] = pa.array(n_win)
            with np.errstate(divide="ignore", invalid="ignore"):
                frac = np.where(n_win > 0, nh / np.maximum(n_win, 1), 0.0)
            cols["hit_frac"] = pa.array(frac)
        out = pa.table(cols)
        return out.filter(pc.greater(out.column("n_hits"), 0))

    return corpus.select_columns([id_col, tokens_col]).map_batches(hits, batch_format="pyarrow")
