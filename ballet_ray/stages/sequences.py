"""Sequence-shaping operators for tokenized training corpora.

The north-rule corpus is ``(doc_id, tokens:list<int32>, n_tok, source)``;
before training, pipelines reshape it into fixed-length examples:

- :func:`chunk_sequences` — split every row's list into stride-spaced
  context windows of at most ``max_len`` (HF ``return_overflowing_tokens``
  shape). One-to-many ``map_batches``; no shuffle, no Python loop over
  rows — windows are materialized with one vectorized gather over the
  flattened child values.
- :func:`pack_sequences` — greedy first-fit-decreasing packing of
  whole rows into bins of capacity ``max_len`` (GPT-style example
  packing, doc boundaries preserved as a list of spans). Packing is
  partition-local by design: bins never span blocks, so the stage is a
  plain ``map_batches`` with no all-to-all movement — the 100 TB shape.

Reference anchor: these are corpus-scale siblings of the reference's
row-wise transformer steps (ballet/eng/base.py) applied to the
tokenized table; the reference has no sequence ops (its inputs are
feature matrices), so semantics follow the public HF/GPT conventions.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def _list_parts(col: "pa.ChunkedArray | pa.Array"):
    """(values, lens, row_starts) of a list column, slice-safe."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    lens = pc.list_value_length(col)
    lens = pc.fill_null(lens, 0).to_numpy(zero_copy_only=False).astype(np.int64)
    values = pc.list_flatten(col)
    row_starts = np.concatenate([[0], np.cumsum(lens)[:-1]])
    return values, lens, row_starts


def _exclusive_cumsum(x: np.ndarray) -> np.ndarray:
    out = np.empty_like(x)
    out[0] = 0
    np.cumsum(x[:-1], out=out[1:])
    return out


def chunk_table(
    table: pa.Table,
    *,
    list_col: str,
    id_col: str,
    max_len: int,
    stride: int | None = None,
    drop_remainder: bool = False,
    out_col: str | None = None,
    carry_cols: tuple[str, ...] = (),
) -> pa.Table:
    """Batch kernel for :func:`chunk_sequences` (exposed for reuse/tests).

    Window starts are ``0, stride, 2*stride, ...`` while ``start < len``
    (every offset gets a window until the row is exhausted — DuckDB
    parity: ``[w[i:i+max_len-1] FOR i IN range(1, len(w)+1, stride)]``).
    With ``drop_remainder`` only full ``max_len`` windows survive.
    Empty/null rows emit no chunks.
    """
    if stride is None:
        stride = max_len
    if stride <= 0 or max_len <= 0:
        raise ValueError("max_len and stride must be positive")
    out_col = out_col or list_col
    values, lens, row_starts = _list_parts(table.column(list_col))

    if drop_remainder:
        n_chunks = np.where(lens >= max_len, (lens - max_len) // stride + 1, 0)
    else:
        n_chunks = np.where(lens > 0, (lens - 1) // stride + 1, 0)
    total = int(n_chunks.sum())
    row_idx = np.repeat(np.arange(len(lens), dtype=np.int64), n_chunks)
    chunk_id = np.arange(total, dtype=np.int64) - np.repeat(_exclusive_cumsum(n_chunks), n_chunks)
    start = chunk_id * stride
    chunk_len = np.minimum(max_len, lens[row_idx] - start)
    global_start = row_starts[row_idx] + start

    # gather flattened window values: one arange + two repeats — except in
    # the non-overlapping case (stride == max_len, remainders kept), where
    # consecutive windows tile each row exactly and, concatenated in row
    # order, ARE the flattened values buffer: reuse it zero-copy
    n_out = int(chunk_len.sum())
    if total == 0:
        gathered = values.slice(0, 0)
        offsets = np.zeros(1, dtype=np.int64)
    elif stride == max_len and not drop_remainder:
        gathered = values
        offsets = np.concatenate([[0], np.cumsum(chunk_len)])
    else:
        # int32 index math: batches never hold 2^31 values, and halving
        # index bytes measurably speeds the repeat+take (bandwidth-bound)
        seg = np.repeat((global_start - _exclusive_cumsum(chunk_len)).astype(np.int32), chunk_len)
        seg += np.arange(n_out, dtype=np.int32)
        gathered = values.take(pa.array(seg))
        offsets = np.concatenate([[0], np.cumsum(chunk_len)])
    chunks = pa.ListArray.from_arrays(pa.array(offsets, type=pa.int32()), gathered)

    cols: dict[str, object] = {id_col: table.column(id_col).take(pa.array(row_idx))}
    for c in carry_cols:
        cols[c] = table.column(c).take(pa.array(row_idx))
    cols["chunk_id"] = pa.array(chunk_id.astype(np.int32))
    cols[out_col] = chunks
    cols["chunk_len"] = pa.array(chunk_len.astype(np.int32))
    return pa.table(cols)


def chunk_sequences(
    ds,
    *,
    list_col: str = "tokens",
    id_col: str = "doc_id",
    max_len: int,
    stride: int | None = None,
    drop_remainder: bool = False,
    out_col: str | None = None,
    carry_cols: tuple[str, ...] = (),
    batch_size: int | None = None,
):
    """Explode each row's list into context windows (one-to-many).

    Scale shape: pure ``map_batches`` over Arrow — each input block maps
    to an output block ~``max_len/stride``× its token mass, streaming
    through the object store with no shuffle. Pick ``batch_size`` so
    (batch token mass × expansion) fits the worker heap; default lets
    Ray size blocks.
    """
    kwargs = dict(
        list_col=list_col,
        id_col=id_col,
        max_len=max_len,
        stride=stride,
        drop_remainder=drop_remainder,
        out_col=out_col,
        carry_cols=carry_cols,
    )

    def f(t: pa.Table) -> pa.Table:
        return chunk_table(t, **kwargs)

    mb: dict = {"batch_format": "pyarrow"}
    if batch_size is not None:
        mb["batch_size"] = batch_size
    return ds.map_batches(f, **mb)


def pack_table(
    table: pa.Table,
    *,
    list_col: str,
    id_col: str,
    max_len: int,
    sep_token: int | None = None,
    member_cols: tuple[str, ...] = (),
) -> pa.Table:
    """Batch kernel for :func:`pack_sequences`.

    ``member_cols`` names per-row scalar columns to carry into the pack
    as list columns aligned with ``doc_ids``/``span_lens`` (one entry per
    pack member, in member order) — e.g. a per-window ``n_prefix`` loss
    boundary. Incompatible with the long-row pre-chunk fallback
    (splitting a row would invalidate its scalar metadata), so every
    input row must already fit ``max_len`` when member columns ride.

    Best-fit-decreasing over the batch's rows (rows longer than
    ``max_len`` are pre-chunked): each row goes to the open pack with the
    SMALLEST remaining capacity that still fits it, found by bisection
    over a sorted capacity list — O(rows·log packs) placement instead of
    first-fit's O(rows·packs) scan (measured 4× on 8k-row batches), with
    equal-or-better fill. The Python loop is over *rows* (bin placement
    is inherently sequential); all token movement is one vectorized
    gather. ``pack_id`` = id of the pack's first (longest) row; when the
    input carries a ``chunk_id`` column (rows produced by
    :func:`chunk_table` / :func:`chunk_sequences`, where many rows share
    one doc id) the pack_id is the composite string ``"{id}#{chunk_id}"``
    of that first row — unique because every row opens at most one pack
    and (id, chunk_id) identifies a row.
    """
    from bisect import bisect_left, insort

    values, lens, row_starts = _list_parts(table.column(list_col))
    eff_max = max_len if sep_token is None else max_len  # rows alone must fit
    if len(lens) and lens.max() > eff_max:
        # pre-chunk long rows so every candidate fits a bin (skipped when
        # nothing exceeds max_len — the common case after an upstream
        # chunk_sequences — saving a full values gather per batch)
        if member_cols:
            raise ValueError(
                f"rows longer than max_len={max_len} with member_cols="
                f"{member_cols}: pre-chunking would split rows and "
                "invalidate their scalar metadata — chunk upstream or "
                "raise max_len"
            )
        table = chunk_table(table, list_col=list_col, id_col=id_col, max_len=eff_max)
        values, lens, row_starts = _list_parts(table.column(list_col))
    n = len(lens)
    sep = 0 if sep_token is None else 1  # extra slot a non-first member costs
    order = np.lexsort((np.arange(n), -lens))  # len desc, stable by position
    bin_rows: list[list[int]] = []
    open_caps: list[tuple[int, int]] = []  # sorted (remaining, bin_idx)
    for r in order.tolist():
        length = int(lens[r])
        if length <= 0:
            continue
        i = bisect_left(open_caps, (length + sep, -1))
        if i < len(open_caps):
            rem, b = open_caps.pop(i)
            bin_rows[b].append(r)
            rem -= length + sep
            if rem > 0:
                insort(open_caps, (rem, b))
        else:
            b = len(bin_rows)
            bin_rows.append([r])
            rem = max_len - length
            if rem > 0:
                insort(open_caps, (rem, b))

    ids = table.column(id_col)
    if isinstance(ids, pa.ChunkedArray):
        ids = ids.combine_chunks()
    packed_rows = np.array([r for rows in bin_rows for r in rows], dtype=np.int64)
    docs_per_bin = np.array([len(rows) for rows in bin_rows], dtype=np.int64)
    seg_lens = lens[packed_rows]
    if sep_token is not None and len(packed_rows):
        # every non-first member is prefixed by one separator: bake it
        # into the span by gathering (sep + row tokens) per member
        first_of_bin = np.zeros(len(packed_rows), bool)
        first_of_bin[_exclusive_cumsum(docs_per_bin)[docs_per_bin > 0]] = True
        seg_lens = seg_lens + (~first_of_bin)
        n_out = int(seg_lens.sum())
        out_np = np.empty(n_out, dtype=np.int64)
        # positions: for each member, [sep?] + tokens
        dst = _exclusive_cumsum(seg_lens)
        sep_pos = dst[~first_of_bin]
        tok_dst_start = dst + (~first_of_bin)
        tok_lens = lens[packed_rows]
        seg = np.repeat(tok_dst_start - _exclusive_cumsum(tok_lens), tok_lens) + np.arange(int(tok_lens.sum()), dtype=np.int64)
        src_idx = np.repeat(row_starts[packed_rows] - _exclusive_cumsum(tok_lens), tok_lens) + np.arange(int(tok_lens.sum()), dtype=np.int64)
        vals_np = values.to_numpy(zero_copy_only=False)
        out_np[seg] = vals_np[src_idx]
        out_np[sep_pos] = sep_token
        gathered = pa.array(out_np.astype(vals_np.dtype))
    else:
        n_out = int(seg_lens.sum())
        if len(packed_rows):
            seg = np.repeat(row_starts[packed_rows] - _exclusive_cumsum(seg_lens), seg_lens)
            gathered = values.take(pa.array(seg + np.arange(n_out, dtype=np.int64)))
        else:
            gathered = values.slice(0, 0)

    tok_per_bin = np.add.reduceat(seg_lens, _exclusive_cumsum(docs_per_bin)) if len(bin_rows) else np.zeros(0, np.int64)
    bin_tok_offsets = np.concatenate([[0], np.cumsum(tok_per_bin)])
    bin_doc_offsets = np.concatenate([[0], np.cumsum(docs_per_bin)])
    tokens = pa.ListArray.from_arrays(pa.array(bin_tok_offsets, type=pa.int32()), gathered)
    # per-pack member ids + spans (doc boundaries inside the pack)
    member_ids = pa.ListArray.from_arrays(
        pa.array(bin_doc_offsets, type=pa.int32()), ids.take(pa.array(packed_rows))
    )
    span_lens = pa.ListArray.from_arrays(
        pa.array(bin_doc_offsets, type=pa.int32()), pa.array(seg_lens.astype(np.int32))
    )
    first_rows = pa.array(np.asarray([rows[0] for rows in bin_rows], dtype=np.int64))
    pack_id = ids.take(first_rows)
    if "chunk_id" in table.column_names:
        # chunked input: many rows share one doc id — disambiguate with the
        # first row's chunk ordinal (globally unique per (id, chunk_id))
        ck = table.column("chunk_id")
        if isinstance(ck, pa.ChunkedArray):
            ck = ck.combine_chunks()
        pack_id = pc.binary_join_element_wise(
            pc.cast(pack_id, pa.string()), pc.cast(ck.take(first_rows), pa.string()), "#"
        )
    cols = {
        "pack_id": pack_id,
        list_col: tokens,
        "doc_ids": member_ids,
        "span_lens": span_lens,
        "n_docs": pa.array(docs_per_bin.astype(np.int32)),
        "n_tok": pa.array(tok_per_bin.astype(np.int32)),
    }
    for c in member_cols:
        mc = table.column(c)
        if isinstance(mc, pa.ChunkedArray):
            mc = mc.combine_chunks()
        cols[c] = pa.ListArray.from_arrays(
            pa.array(bin_doc_offsets, type=pa.int32()), mc.take(pa.array(packed_rows))
        )
    return pa.table(cols)


def pack_sequences(
    ds,
    *,
    list_col: str = "tokens",
    id_col: str = "doc_id",
    max_len: int,
    batch_size: int | None = None,
    sep_token: int | None = None,
    member_cols: tuple[str, ...] = (),
):
    """Pack rows into ≤``max_len`` training examples, partition-locally.

    Each batch packs independently (best-fit-decreasing), so the stage
    streams with zero shuffle; cross-block packing would buy a few
    percent fill at the cost of an all-to-all — the wrong trade at
    corpus scale. Invariants: token mass is preserved exactly, every
    (possibly pre-chunked) row appears in exactly one pack, and
    ``n_tok <= max_len`` for every pack.

    ``batch_size=None`` (default) packs whole blocks — forcing a fixed
    batch size makes Ray re-slice/concatenate the list payload to exact
    row counts, which costs more than the packing itself (measured ~2×
    the stage time at 8192-row batches on 256-token rows).

    ``sep_token`` (e.g. an EOS id) is inserted between consecutive
    documents inside a pack — GPT-style boundary marking; separator mass
    counts toward ``max_len`` (placement reserves one slot per added
    row) and appears in ``n_tok``/``span_lens``.
    """

    def f(t: pa.Table) -> pa.Table:
        return pack_table(t, list_col=list_col, id_col=id_col, max_len=max_len,
                          sep_token=sep_token, member_cols=member_cols)

    mb: dict = {"batch_format": "pyarrow"}
    if batch_size is not None:
        mb["batch_size"] = batch_size
    return ds.map_batches(f, **mb)


def _gather_seg(out: np.ndarray, src: np.ndarray, dst_start: np.ndarray,
                src_start: np.ndarray, seg_len: np.ndarray) -> None:
    """``out[dst_start_i : +len_i] = src[src_start_i : +len_i]`` for every
    row i, as ONE vectorized gather (repeat/arange indexing) — the same
    trick chunk_table uses; no Python loop over rows."""
    m = seg_len > 0
    if not m.any():
        return
    d, s, ln = dst_start[m], src_start[m], seg_len[m]
    tot = int(ln.sum())
    rel = np.arange(tot, dtype=np.int64) - np.repeat(_exclusive_cumsum(ln), ln)
    out[np.repeat(d, ln) + rel] = src[np.repeat(s, ln) + rel]


def _fim_uniforms(ids, method: str, chunk=None):
    """Three per-row uniforms in [0,1) derived from the row id —
    (selection, split a, split b). ``siphash`` is the vectorized scale
    mode; ``md5`` is the row-wise SQL-audit mode with DuckDB parity
    ``CAST('0x' || substr(md5(CAST(id AS VARCHAR)), k, 8) AS UBIGINT)
    / 2^32`` at k = 1, 9, 17 (one md5 yields all three). With ``chunk``
    (per-row chunk indices, for rows that are context windows of one
    document) the key is (id, chunk) — md5 hashes ``"{id}#{chunk}"``
    (still SQL-expressible), siphash mixes the chunk index in — so each
    window of a document draws independently."""
    if method == "md5":
        import hashlib

        keys = ([str(k) for k in ids] if chunk is None
                else [f"{k}#{c}" for k, c in zip(ids, chunk)])
        hexes = [hashlib.md5(k.encode()).hexdigest() for k in keys]
        den = float(2 ** 32)
        us = np.fromiter((int(h[:8], 16) for h in hexes), np.float64, len(hexes)) / den
        ua = np.fromiter((int(h[8:16], 16) for h in hexes), np.float64, len(hexes)) / den
        ub = np.fromiter((int(h[16:24], 16) for h in hexes), np.float64, len(hexes)) / den
        return us, ua, ub
    from ballet_ray.functions.hashing import mix, splitmix64
    from ballet_ray.functions.partition import stable_hash_array

    h = stable_hash_array(ids)
    if chunk is not None:
        h = mix(h, np.asarray(chunk, np.uint64))
    h2 = splitmix64(h)
    h3 = splitmix64(h2)
    den = float(2 ** 64)
    return (h.astype(np.float64) / den, h2.astype(np.float64) / den,
            h3.astype(np.float64) / den)


def fim_transform(ds, *, tokens_col: str = "tokens", id_col: str = "doc_id",
                  rate: float = 0.5, pre_id: int = -1, suf_id: int = -2,
                  mid_id: int = -3, method: str = "siphash"):
    """Fill-in-the-middle transform (Bavarian et al. 2022,
    arXiv:2207.14255): with probability ``rate`` per document
    (deterministic in the row id — reproducible under any repartitioning,
    rows decide, not blocks), cut the token sequence at two uniform split
    points u <= v and reorder to the PSM layout

        [PRE] tokens[:u] [SUF] tokens[v:] [MID] tokens[u:v]

    so an autoregressive model learns to infill. Sentinel ids default to
    negative values (out of any real vocab); untouched rows pass through
    verbatim; ``n_tok`` is recomputed (selected rows grow by 3).

    Scale shape: pure one-pass ``map_batches`` — zero shuffle, zero
    per-row Python in ``siphash`` mode (three splitmix64 chains off one
    vectorized hash; segment moves are the same repeat/arange gather
    chunk_table uses). ``method='md5'`` is the row-wise SQL-audit mode
    the DuckDB oracle reproduces."""
    if not 0.0 <= rate <= 1.0:
        raise ValueError("rate must be in [0, 1]")

    def fim(t: pa.Table) -> pa.Table:
        return fim_table(t, tokens_col=tokens_col, id_col=id_col, rate=rate,
                         pre_id=pre_id, suf_id=suf_id, mid_id=mid_id,
                         method=method)

    return ds.select_columns([id_col, tokens_col]).map_batches(fim, batch_format="pyarrow")


def fim_table(t: pa.Table, *, tokens_col: str = "tokens",
              id_col: str = "doc_id", rate: float = 0.5, pre_id: int = -1,
              suf_id: int = -2, mid_id: int = -3, method: str = "siphash",
              chunk_col: str | None = None,
              carry_cols: tuple[str, ...] = ()) -> pa.Table:
    """Batch kernel for :func:`fim_transform` (exposed for reuse — the
    pack job applies it between chunking and packing). With ``chunk_col``
    the (id, chunk) pair keys the uniforms, so every context window of a
    document draws its own selection and split points; ``carry_cols``
    ride through untouched (row order preserved)."""
    col = t.column(tokens_col)
    values, lens, row_starts = _list_parts(col)
    if pa.types.is_null(values.type):
        values = values.cast(pa.int64())
    flat = values.to_numpy(zero_copy_only=False).astype(np.int64)
    ids = t.column(id_col).to_numpy(zero_copy_only=False)
    chunk = (t.column(chunk_col).to_numpy(zero_copy_only=False)
             if chunk_col and chunk_col in t.column_names else None)
    us, ua, ub = _fim_uniforms(ids, method, chunk=chunk)
    sel = us < rate
    a = np.floor(ua * (lens + 1)).astype(np.int64)
    b = np.floor(ub * (lens + 1)).astype(np.int64)
    u = np.minimum(a, b)
    v = np.maximum(a, b)
    out_lens = lens + np.where(sel, 3, 0)
    out_starts = _exclusive_cumsum(out_lens) if len(out_lens) else out_lens
    out = np.empty(int(out_lens.sum()), np.int64)

    un = ~sel
    if un.any():
        _gather_seg(out, flat, out_starts[un], row_starts[un], lens[un])
    if sel.any():
        os_, rs_ = out_starts[sel], row_starts[sel]
        L_, u_, v_ = lens[sel], u[sel], v[sel]
        out[os_] = pre_id
        out[os_ + 1 + u_] = suf_id
        out[os_ + 2 + u_ + (L_ - v_)] = mid_id
        _gather_seg(out, flat, os_ + 1, rs_, u_)                           # prefix
        _gather_seg(out, flat, os_ + 2 + u_, rs_ + v_, L_ - v_)            # suffix
        _gather_seg(out, flat, os_ + 3 + u_ + (L_ - v_), rs_ + u_, v_ - u_)  # middle
    vals = pa.array(out)
    if pa.types.is_integer(values.type) and values.type.bit_width >= 32:
        vals = vals.cast(values.type)  # preserve the canonical int32
    toks = pa.ListArray.from_arrays(
        pa.array(np.concatenate([[0], np.cumsum(out_lens)]).astype(np.int64)), vals
    )
    cols = {id_col: t.column(id_col)}
    for c in carry_cols:
        if c in t.column_names:
            cols[c] = t.column(c)
    cols[tokens_col] = toks
    cols["n_tok"] = pa.array(out_lens)
    return pa.table(cols)


def _seg_excl_cumsum(x: np.ndarray, counts: np.ndarray) -> np.ndarray:
    """Per-row exclusive cumsum of a row-major flat array (``counts``
    entries per row): global exclusive cumsum minus each row's base."""
    cs = np.concatenate([[0], np.cumsum(x)[:-1]])
    base = cs[_exclusive_cumsum(counts)] if len(counts) else cs
    return cs - np.repeat(base, counts)


def _random_segmentation(m: np.ndarray, k: np.ndarray, h: np.ndarray,
                         salt: int) -> np.ndarray:
    """T5's ``_random_segmentation`` vectorized across rows: partition
    ``m_i`` items into exactly ``k_i`` parts, each >= 1, uniformly at
    random — by choosing ``k_i - 1`` cut gaps out of the ``m_i - 1``
    candidates with the smallest deterministic keys
    ``mix(row_hash, gap_index, salt)``. Returns the part lengths as one
    row-major flat array (``k_i`` entries per row). No RNG state: pure
    function of (row hash, salt), so any shard reproduces independently."""
    from ballet_ray.functions.hashing import mix

    g = m - 1
    tot = int(g.sum())
    row_starts = _exclusive_cumsum(g) if len(g) else g
    gap_rel = np.arange(tot, dtype=np.int64) - np.repeat(row_starts, g)
    key = mix(np.repeat(h, g), gap_rel.astype(np.uint64), np.uint64(salt))
    row_of_gap = np.repeat(np.arange(len(g)), g)
    need = k - 1

    # EXACT threshold pre-selection before the sort: a row's k-1 smallest
    # keys are certainly among its keys below thr as long as >= k-1 of
    # them survive, so sorting only the survivors yields identical cuts.
    # Keys are uniform in [0, 2^64): thr ~ alpha*(k-1)/g of the key space
    # keeps ~alpha*(k-1) survivors; rows that come up short (binomial
    # tail) retry with 4x alpha until covered (frac >= 1 degenerates to
    # all-gaps, so termination is guaranteed). Cuts the O(G log G)
    # two-key lexsort over the full gap mass (~0.85x token mass at T5
    # defaults) to O(G) passes + a sort over ~4x the cut count
    # (~0.2x token mass) — measured 2x end-to-end on span_corruption.
    alpha = np.full(len(g), 4.0)
    while True:
        frac = alpha * np.maximum(need, 1) / np.maximum(g, 1)
        full = frac >= 1.0
        thr = (np.minimum(frac, 1.0) * float(2**63)).astype(np.uint64) << np.uint64(1)
        mask = (key < np.repeat(thr, g)) | np.repeat(full, g)
        cnt = np.bincount(row_of_gap[mask], minlength=len(g)).astype(np.int64)
        bad = cnt < need
        if not bad.any():
            break
        alpha[bad] *= 4.0
    sel = np.flatnonzero(mask)
    key_s, row_s, gaprel_s = key[sel], row_of_gap[sel], gap_rel[sel]
    srow_starts = _exclusive_cumsum(cnt) if len(cnt) else cnt
    order = np.lexsort((key_s, row_s))        # grouped by row, key-ascending
    rank = np.arange(len(sel), dtype=np.int64) - np.repeat(srow_starts, cnt)
    chosen = order[rank < np.repeat(need, cnt)]
    # ascending cut positions per row
    o2 = np.lexsort((gaprel_s[chosen], row_s[chosen]))
    cuts = gaprel_s[chosen][o2] + 1           # cut after item c: c in [1, m-1]
    # bounds per row = [cuts..., m]; lengths = diff against shifted bounds
    k_tot = int(k.sum())
    w = np.arange(k_tot, dtype=np.int64) - np.repeat(_exclusive_cumsum(k) if len(k) else k, k)
    ends = np.empty(k_tot, np.int64)
    is_last = w == np.repeat(k - 1, k)
    ends[~is_last] = cuts
    ends[is_last] = m  # one last-segment slot per row, in row order
    starts = np.empty(k_tot, np.int64)
    starts[w == 0] = 0
    starts[1:][w[1:] > 0] = ends[:-1][w[1:] > 0]
    return ends - starts


def span_corruption(ds, *, tokens_col: str = "tokens", id_col: str = "doc_id",
                    noise_density: float = 0.15, mean_span_len: float = 3.0,
                    seed: int = 2718):
    """T5 span corruption (Raffel 2020, arXiv:1910.10683 §3.1.4; UL2's
    R/X denoisers are parameterizations of the same transform): mask
    random token spans and emit the (inputs, targets) pair

        inputs:  p_1 [S1] p_2 [S2] ... p_k [Sk]
        targets: [S1] q_1 [S2] q_2 ... [Sk] q_k [T]

    where p/q are the interleaved keep/noise spans (sequence starts with
    a keep span and ends with a noise span, exactly T5's layout), span
    count and lengths follow T5's rounding rules (num_noise =
    round(L·density) clamped to [1, L-1]; num_spans =
    round(num_noise / mean_span) clamped so every span on both sides is
    >= 1), and both segmentations are uniform via the deterministic
    keyed-gap construction (:func:`_random_segmentation`). Sentinels are
    negative: span k gets -(k+1), the terminal gets -(num_spans+1).

    Deterministic in (row id, seed) — reproducible under any
    repartitioning, any shard independently. Rows with fewer than 2
    tokens pass through with empty targets. Scale shape: one map-only
    pass, zero shuffle, zero per-row Python — segmentation is two
    lexsorts over the gap keys, segment moves are repeat/arange gathers.
    """
    if not 0.0 < noise_density < 1.0:
        raise ValueError("noise_density must be in (0, 1)")
    if mean_span_len < 1.0:
        raise ValueError("mean_span_len must be >= 1")

    def corrupt(t: pa.Table) -> pa.Table:
        return span_corruption_table(
            t, tokens_col=tokens_col, id_col=id_col,
            noise_density=noise_density, mean_span_len=mean_span_len,
            seed=seed)

    return ds.select_columns([id_col, tokens_col]).map_batches(corrupt, batch_format="pyarrow")


def span_corruption_table(t: pa.Table, *, tokens_col: str = "tokens",
                          id_col: str = "doc_id", noise_density: float = 0.15,
                          mean_span_len: float = 3.0, seed: int = 2718,
                          chunk_col: str | None = None,
                          carry_cols: tuple[str, ...] = (),
                          layout: str = "pair") -> pa.Table:
    """Batch kernel for :func:`span_corruption` (exposed for reuse — the
    pack job applies it between chunking and packing). With ``chunk_col``
    the hash is keyed by (id, chunk), so each context window of a
    document segments independently; ``carry_cols`` ride through
    untouched. ``layout='pair'`` emits (inputs, targets) columns;
    ``layout='decoder'`` concatenates them back into ``tokens_col``
    (the decoder-only UL2 shape: ``inputs ⊕ targets`` as one stream, the
    sentinels delimiting the corrupted spans) plus ``n_in`` — the loss
    boundary (positions ≥ n_in are the prediction targets)."""
    from ballet_ray.functions.hashing import mix
    from ballet_ray.functions.partition import stable_hash_array

    if not 0.0 < noise_density < 1.0:
        raise ValueError("noise_density must be in (0, 1)")
    if mean_span_len < 1.0:
        raise ValueError("mean_span_len must be >= 1")
    if layout not in ("pair", "decoder"):
        raise ValueError("layout must be 'pair' or 'decoder'")
    col = t.column(tokens_col)
    values, lens, row_starts = _list_parts(col)
    if pa.types.is_null(values.type):
        values = values.cast(pa.int64())
    flat = values.to_numpy(zero_copy_only=False).astype(np.int64)
    ids = t.column(id_col).to_numpy(zero_copy_only=False)
    h = mix(stable_hash_array(ids), np.uint64(seed))
    if chunk_col and chunk_col in t.column_names:
        chunk = t.column(chunk_col).to_numpy(zero_copy_only=False)
        h = mix(h, np.asarray(chunk, np.uint64))
    L = lens
    e = L >= 2
    nn = np.clip(np.round(L * noise_density).astype(np.int64), 1,
                 np.maximum(L - 1, 1))
    ns = np.maximum(np.round(nn / mean_span_len).astype(np.int64), 1)
    ns = np.minimum(np.minimum(ns, nn), np.maximum(L - nn, 1))
    in_lens = np.where(e, L - nn + ns, L)
    tgt_lens = np.where(e, nn + ns + 1, 0)
    in_starts = _exclusive_cumsum(in_lens) if len(in_lens) else in_lens
    tgt_starts = _exclusive_cumsum(tgt_lens) if len(tgt_lens) else tgt_lens
    inputs = np.empty(int(in_lens.sum()), np.int64)
    targets = np.empty(int(tgt_lens.sum()), np.int64)

    if (~e).any():
        _gather_seg(inputs, flat, in_starts[~e], row_starts[~e], L[~e])
    if e.any():
        he, Le, nne, nse = h[e], L[e], nn[e], ns[e]
        rs_, is_, ts_ = row_starts[e], in_starts[e], tgt_starts[e]
        p = _random_segmentation(Le - nne, nse, he, seed * 2 + 1)  # keep spans
        q = _random_segmentation(nne, nse, he, seed * 2 + 2)      # noise spans
        rep = np.repeat(np.arange(len(nse)), nse)
        w = np.arange(int(nse.sum()), dtype=np.int64) - np.repeat(
            _exclusive_cumsum(nse) if len(nse) else nse, nse)
        src_p = rs_[rep] + _seg_excl_cumsum(p + q, nse)            # p_k source
        src_q = src_p + p                                          # q_k source
        dst_p = is_[rep] + _seg_excl_cumsum(p + 1, nse)            # p_k in inputs
        _gather_seg(inputs, flat, dst_p, src_p, p)
        inputs[dst_p + p] = -(w + 1)                               # [Sk] in inputs
        dst_s = ts_[rep] + _seg_excl_cumsum(q + 1, nse)            # [Sk] in targets
        targets[dst_s] = -(w + 1)
        _gather_seg(targets, flat, dst_s + 1, src_q, q)
        targets[ts_ + nne + nse] = -(nse + 1)                      # terminal

    mk = lambda v, ln: pa.ListArray.from_arrays(
        pa.array(np.concatenate([[0], np.cumsum(ln)]).astype(np.int64)), v)
    narrow = pa.types.is_integer(values.type) and values.type.bit_width >= 32
    cols: dict = {id_col: t.column(id_col)}
    for c in carry_cols:
        if c in t.column_names:
            cols[c] = t.column(c)
    if layout == "decoder":
        out_lens = in_lens + tgt_lens
        out_starts = _exclusive_cumsum(out_lens) if len(out_lens) else out_lens
        out = np.empty(int(out_lens.sum()), np.int64)
        _gather_seg(out, inputs, out_starts, in_starts, in_lens)
        _gather_seg(out, targets, out_starts + in_lens, tgt_starts, tgt_lens)
        vals = pa.array(out)
        if narrow:
            vals = vals.cast(values.type)
        cols[tokens_col] = mk(vals, out_lens)
        cols["n_in"] = pa.array(in_lens.astype(np.int32))
        cols["n_tok"] = pa.array(out_lens)
        return pa.table(cols)
    ivals, tvals = pa.array(inputs), pa.array(targets)
    if narrow:
        ivals = ivals.cast(values.type)
        tvals = tvals.cast(values.type)
    cols["inputs"] = mk(ivals, in_lens)
    cols["targets"] = mk(tvals, tgt_lens)
    cols["n_in"] = pa.array(in_lens)
    cols["n_tgt"] = pa.array(tgt_lens)
    return pa.table(cols)


def fit_vocab_prune(ds, *, tokens_col: str = "tokens", keep: int):
    """Fit half of vocabulary pruning: count token-id frequencies across
    the corpus (per-batch np.unique combiners → one id-keyed groupby
    bounded by the live vocab) and keep the ``keep`` most frequent ids
    (count desc, id asc tie-break — deterministic at the cap boundary).

    Returns ``(kept_ids_sorted_ascending, new_ids)`` numpy arrays: kept id
    ``kept_ids[j]`` remaps to dense id ``new_ids[j]`` in 1..keep (rank
    order), everything else maps to the UNK id. The artifact is O(keep) —
    broadcast it, never the counts table."""

    def counts(t: pa.Table) -> pa.Table:
        col = t.column(tokens_col)
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        if pa.types.is_null(col.values.type if hasattr(col, "values") else col.type):
            return pa.table({"tok": pa.array([], pa.int64()),
                             "c": pa.array([], pa.int64())})
        flat = pc.list_flatten(col).to_numpy(zero_copy_only=False).astype(np.int64)
        u, c = np.unique(flat, return_counts=True)
        return pa.table({"tok": pa.array(u), "c": pa.array(c.astype(np.int64))})

    agg = (ds.select_columns([tokens_col])
           .map_batches(counts, batch_format="pyarrow")
           .groupby("tok").sum("c"))
    top = (agg.sort(["sum(c)", "tok"], descending=[True, False])
           .limit(int(keep)).to_pandas())
    order = top["tok"].to_numpy().astype(np.int64)        # rank order
    new_ids = np.arange(1, len(order) + 1, dtype=np.int64)
    asc = np.argsort(order)
    return order[asc], new_ids[asc]


def apply_vocab_prune(ds, kept_ids: np.ndarray, new_ids: np.ndarray, *,
                      tokens_col: str = "tokens", id_col: str = "doc_id",
                      unk_id: int = 0):
    """Apply half: remap every token through the pruned vocabulary
    (sorted-array binary search per batch; out-of-vocab → ``unk_id``) and
    recount ``n_unk``. Map-only — the O(keep) remap table rides each task
    via one ``ray.put``; the token payload never shuffles."""
    import ray as _ray

    ref = _ray.put((np.asarray(kept_ids, np.int64), np.asarray(new_ids, np.int64)))

    def remap(t: pa.Table) -> pa.Table:
        kept, new = _ray.get(ref)
        col = t.column(tokens_col)
        values, lens, _ = _list_parts(col)
        if pa.types.is_null(values.type):
            values = values.cast(pa.int64())
        flat = values.to_numpy(zero_copy_only=False).astype(np.int64)
        out = np.full(len(flat), unk_id, np.int64)
        if len(kept) and len(flat):
            pos = np.searchsorted(kept, flat)
            pos[pos >= len(kept)] = len(kept) - 1
            hit = kept[pos] == flat
            out[hit] = new[pos[hit]]
        vals = pa.array(out)
        if pa.types.is_integer(values.type) and values.type.bit_width >= 32:
            vals = vals.cast(values.type)
        toks = pa.ListArray.from_arrays(
            pa.array(np.concatenate([[0], np.cumsum(lens)]).astype(np.int64)), vals)
        n_unk = np.zeros(len(lens), np.int64)
        if len(flat):
            miss = (out == unk_id).astype(np.int64)
            cs = np.concatenate([[0], np.cumsum(miss)])
            ends = np.cumsum(lens)
            n_unk = cs[ends] - cs[ends - lens]
        return pa.table({id_col: t.column(id_col), tokens_col: toks,
                         "n_unk": pa.array(n_unk)})

    return ds.select_columns([id_col, tokens_col]).map_batches(remap, batch_format="pyarrow")


def prefix_lm_split(ds, *, tokens_col: str = "tokens", id_col: str = "doc_id",
                    rate: float = 1.0, method: str = "siphash"):
    """UL2's S-denoiser / prefix-LM objective (Tay 2022, arXiv:2205.05131;
    the sequential denoiser of the R/S/X mixture — R and X are
    :func:`span_corruption` parameterizations, FIM is the infilling
    sibling): split each selected sequence at one uniform point c in
    [1, L-1] so BOTH sides are non-empty, emitting ``inputs = tokens[:c]``
    and ``targets = tokens[c:]``. Selection and the split point derive
    from the row id exactly like :func:`fim_transform` (same first two
    uniforms; ``method='md5'`` is the SQL-audit mode), so the transform is
    reproducible under any repartitioning with no RNG state. Unselected
    and too-short (L < 2) rows pass through with empty targets. Map-only,
    zero shuffle, zero copies beyond the two list slices."""
    if not 0.0 <= rate <= 1.0:
        raise ValueError("rate must be in [0, 1]")

    def split(t: pa.Table) -> pa.Table:
        col = t.column(tokens_col)
        values, lens, row_starts = _list_parts(col)
        if pa.types.is_null(values.type):
            values = values.cast(pa.int64())
        ids = t.column(id_col).to_numpy(zero_copy_only=False)
        us, ua, _ = _fim_uniforms(ids, method)
        sel = (us < rate) & (lens >= 2)
        c = np.where(sel, 1 + np.floor(ua * (lens - 1)).astype(np.int64), lens)
        starts = row_starts + c
        tgt_lens = lens - c
        inputs = pa.ListArray.from_arrays(
            pa.array(np.concatenate([[0], np.cumsum(c)]).astype(np.int64)),
            values.take(pa.array(
                (np.repeat(row_starts, c)
                 + (np.arange(int(c.sum())) - np.repeat(_exclusive_cumsum(c) if len(c) else c, c))))))
        targets = pa.ListArray.from_arrays(
            pa.array(np.concatenate([[0], np.cumsum(tgt_lens)]).astype(np.int64)),
            values.take(pa.array(
                (np.repeat(starts, tgt_lens)
                 + (np.arange(int(tgt_lens.sum()))
                    - np.repeat(_exclusive_cumsum(tgt_lens) if len(tgt_lens) else tgt_lens, tgt_lens))))))
        return pa.table({id_col: t.column(id_col), "inputs": inputs,
                         "targets": targets, "n_in": pa.array(c),
                         "n_tgt": pa.array(tgt_lens)})

    return ds.select_columns([id_col, tokens_col]).map_batches(split, batch_format="pyarrow")

def prefix_lm_mark_table(t: pa.Table, *, tokens_col: str = "tokens",
                         id_col: str = "doc_id", rate: float = 1.0,
                         method: str = "siphash",
                         chunk_col: str | None = None,
                         carry_cols: tuple[str, ...] = ()) -> pa.Table:
    """Decoder-only marking form of :func:`prefix_lm_split`: tokens pass
    through UNCHANGED and the split point rides as ``n_prefix`` — the
    loss boundary (positions < n_prefix are the bidirectional prefix,
    positions >= n_prefix are the causal targets; n_prefix == len means
    "no targets", the unselected/too-short passthrough). Same uniforms as
    the split form (with ``chunk_col``, keyed by (id, chunk) so every
    context window of a document draws independently — the pack-job
    shape). One column append, zero copies of the token payload."""
    if not 0.0 <= rate <= 1.0:
        raise ValueError("rate must be in [0, 1]")
    col = t.column(tokens_col)
    lens = pc.fill_null(pc.list_value_length(col), 0).to_numpy(
        zero_copy_only=False).astype(np.int64)
    ids = t.column(id_col).to_numpy(zero_copy_only=False)
    chunk = (t.column(chunk_col).to_numpy(zero_copy_only=False)
             if chunk_col and chunk_col in t.column_names else None)
    us, ua, _ = _fim_uniforms(ids, method, chunk=chunk)
    sel = (us < rate) & (lens >= 2)
    c = np.where(sel, 1 + np.floor(ua * (lens - 1)).astype(np.int64), lens)
    cols: dict = {id_col: t.column(id_col)}
    for cc in carry_cols:
        if cc in t.column_names:
            cols[cc] = t.column(cc)
    cols[tokens_col] = col
    cols["n_prefix"] = pa.array(c.astype(np.int32))
    return pa.table(cols)
