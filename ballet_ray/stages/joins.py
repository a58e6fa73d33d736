"""Equi-joins: broadcast (small side) and partitioned hash (both large).

- ``broadcast_join``: the small side is collected to a plain dict of numpy
  arrays, ``ray.put`` once, and each map task looks rows up vectorized —
  no shuffle. Correct choice for dimension tables (category dicts,
  nation/region, model vocabularies).
- ``hash_join``: both sides large → Ray Data's native hash-partitioned
  ``Dataset.join`` with an explicit partition count.
- ``semi_join_filter`` / ``anti_join_filter``: broadcast the key set and
  filter inside ``map_batches``.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray


def default_join_partitions(requested: int | None = None) -> int:
    """Pick a hash-join partition count that cannot starve the cluster.

    Ray's hash-shuffle join runs one aggregator actor per partition; asking
    for more partitions than cores on a small cluster deadlocks the
    streaming executor (observed at 16 partitions on 4 CPUs). Default to
    half the cluster CPUs, capped at 32 — callers running on a real
    multi-node cluster should pass an explicit count sized to the data.
    """
    if requested is not None:
        return requested
    try:
        cpus = int(ray.cluster_resources().get("CPU", 4))
    except Exception:
        cpus = 4
    return max(2, min(32, cpus // 2))


def _small_side_to_frame(small) -> pd.DataFrame:
    if isinstance(small, pd.DataFrame):
        return small
    if isinstance(small, pa.Table):
        return small.to_pandas()
    # assume a Dataset
    return small.to_pandas()


def broadcast_join(
    ds,
    small,
    *,
    key: str,
    right_key: str | None = None,
    value_cols: list[str] | None = None,
    how: str = "left",
):
    """Join a Dataset against a small in-memory side without a shuffle.

    The small side is shipped via the object store once (``ray.put``) and
    merged into each Arrow batch with a pandas hash merge on the two key
    columns only (payload columns never convert to pandas).
    """
    right_key = right_key or key
    sdf = _small_side_to_frame(small)
    if value_cols is None:
        value_cols = [c for c in sdf.columns if c != right_key]
    sdf = sdf[[right_key] + value_cols].drop_duplicates(subset=[right_key])
    ref = ray.put(sdf)

    def merge(t: pa.Table) -> pa.Table:
        small_df = ray.get(ref)
        keys = pd.DataFrame({key: t.column(key).to_numpy(zero_copy_only=False)})
        m = keys.merge(
            small_df, how="left", left_on=key, right_on=right_key, sort=False
        )
        if how == "inner":
            mask = ~m[value_cols[0]].isna() if value_cols else np.ones(len(m), bool)
            sel = pa.array(mask.to_numpy())
            t = t.filter(sel)
            m = m[mask.to_numpy()]
        for c in value_cols:
            t = t.append_column(c, pa.Array.from_pandas(m[c]))
        return t

    return ds.map_batches(merge, batch_format="pyarrow")


def _arrow_schema_or_none(ds) -> pa.Schema | None:
    """Best-effort Arrow schema of a Dataset; None when unknowable (e.g.
    object-dtype pandas blocks whose Arrow types can't be inferred)."""
    try:
        s = ds.schema()
        base = getattr(s, "base_schema", None)
        if isinstance(base, pa.Schema):
            return base
        return pa.schema(
            [pa.field(n, t if isinstance(t, pa.DataType) else pa.from_numpy_dtype(t))
             for n, t in zip(s.names, s.types)]
        )
    except Exception:
        return None


def _normalize_side(schema: pa.Schema | None):
    """map_batches fn for a join input: conform schema-less empty blocks
    (Ray's sort-based groupby emits zero-column blocks for partitions with
    no groups, which poison the join aggregator's partition tables) to the
    side's schema, then binary-pack list payload columns for Acero."""

    def f(t: pa.Table) -> pa.Table:
        if t.num_columns == 0 and schema is not None:
            t = schema.empty_table()
        return pack_list_columns(t)

    return f


def scrub_empty_blocks(ds, *, schema: pa.Schema | None = None):
    """Drop EMPTY blocks (zero rows — typed or schema-less) from a Dataset.

    Ray 2.49's ``Dataset.join`` breaks when ANY input block is empty: the
    aggregator's per-partition Arrow table loses the key field ("No match
    or multiple matches for key field ..."). Sort-based groupby emits
    schema-less empties for ranges with no groups, selective filters leave
    typed empties, and ``map_batches`` forwards both untouched (the fn
    never runs on a block that yields no batches). Feed any such dataset
    through this before joining — and short-circuit the join entirely when
    the result ``count()`` is 0 (a fully-empty side cannot be joined).

    Materializes ``ds`` (it is already the small aggregated side in every
    caller); the probe is one zero-CPU metadata task per block — block DATA
    never moves to the driver. If every block is empty, returns an empty
    dataset of ``schema`` (or the input unchanged when no schema is known).
    """
    import ray.data as rd

    if schema is None:
        schema = _arrow_schema_or_none(ds)
    m = ds.materialize()
    refs = m.get_internal_block_refs()

    @ray.remote(num_cpus=0)
    def _probe(b):
        return len(b) > 0

    @ray.remote(num_cpus=0)
    def _to_arrow(b):
        return b if isinstance(b, pa.Table) else pa.Table.from_pandas(b, preserve_index=False)

    keep = ray.get([_probe.remote(r) for r in refs])
    kept = [r for r, k in zip(refs, keep) if k]
    if not kept:
        if schema is None:
            return m  # can't type an empty fallback; caller sees it unchanged
        return rd.from_arrow(schema.empty_table())
    if len(kept) == len(refs):
        return m
    return rd.from_arrow_refs([_to_arrow.remote(r) for r in kept])


def hash_join(left, right, *, on, right_on=None, how: str = "inner",
              num_partitions: int | None = None):
    """Large-large equi-join via Ray Data's hash-partitioned Dataset.join.

    ``num_partitions=None`` sizes the aggregator-actor count to the cluster
    via :func:`default_join_partitions` — a hard-coded count larger than
    the CPU total deadlocks the streaming executor on small clusters.

    List-typed payload columns (e.g. the canonical ``tokens:list<int32>``)
    are transparently binary-packed around the join — Acero rejects list
    non-key fields — and restored in the output. Packing is unconditional:
    Dataset.schema() reports numpy dtypes for pandas-block datasets, so a
    schema probe can MISS list columns (pack is a no-op relabel otherwise).
    Schema-less empty blocks on either side are conformed to the side's
    schema before the shuffle."""
    num_partitions = default_join_partitions(num_partitions)
    on = (on,) if isinstance(on, str) else tuple(on)
    right_on = (right_on,) if isinstance(right_on, str) else (tuple(right_on) if right_on else None)

    def _prep(side):
        # attach the pack map only when the side's schema is unknown (a
        # pandas-block dataset can hide object-dtype lists) or actually has
        # list columns: the map would turn any 0-row block schema-less
        # (fn never runs on empty blocks), and Ray's join chokes on those
        s = _arrow_schema_or_none(side)
        needs_pack = s is None or any(
            pa.types.is_list(f.type) or pa.types.is_large_list(f.type) for f in (s or [])
        )
        if needs_pack:
            side = side.map_batches(_normalize_side(s), batch_format="pyarrow")
        return side

    out = _prep(left).join(
        _prep(right),
        join_type=how,
        num_partitions=num_partitions,
        on=on,
        right_on=right_on,
    )
    return out.map_batches(unpack_list_columns, batch_format="pyarrow")


def semi_join_filter(ds, keys, *, key: str, invert: bool = False):
    """Keep (or drop) rows whose key is in the broadcast key set.

    Membership is pandas' C hash table (`pd.Index.get_indexer`), NOT
    np.isin — np.isin on object (string) keys sort-merges with per-element
    Python compares, re-sorting the broadcast set for EVERY batch
    (measured seconds/batch at a 10^5-key set)."""
    arr = np.asarray(list(keys) if not isinstance(keys, np.ndarray) else keys)
    ref = ray.put(pd.unique(arr))  # get_indexer needs a unique index

    def flt(t: pa.Table) -> pa.Table:
        idx = pd.Index(ray.get(ref))
        mask = idx.get_indexer(t.column(key).to_numpy(zero_copy_only=False)) >= 0
        if invert:
            mask = ~mask
        return t.filter(pa.array(mask))

    return ds.map_batches(flt, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# list-payload-safe joins (Acero rejects list<...> non-key fields)
# ---------------------------------------------------------------------------

_PACK_PREFIX = "__packed__"
_PACK_STR_PREFIX = "__packedstr__"
_PACK_STR_LENS_PREFIX = "__packedstrlens__"


def _pack_fixed_list(arr: pa.Array, vt) -> pa.Array:
    """list<fixed-width> → large_binary by buffer relabel (no row loop)."""
    width = vt.bit_width // 8
    flat = arr.flatten().to_numpy(zero_copy_only=False)
    byte_off = np.asarray(arr.offsets).astype(np.int64) * width
    byte_off -= byte_off[0]  # sliced arrays carry non-zero base offsets
    return pa.Array.from_buffers(
        pa.large_binary(),
        len(arr),
        [None, pa.py_buffer(byte_off.tobytes()), pa.py_buffer(flat.tobytes())],
    )


def pack_list_columns(t: pa.Table) -> pa.Table:
    """Encode list columns as binary so they survive an Acero join as
    non-key payload (Acero rejects list non-key fields).

    - list<fixed-width>: the flat value buffer becomes the binary data
      buffer, offsets scale by item width — two buffer re-labels, no
      per-row Python. Renamed ``__packed__<type>__<name>``.
    - list<string>: two columns — the row's concatenated utf8 bytes
      (``__packedstr__<type>__<name>``, a buffer relabel of the values
      data) and the per-value byte lengths as a packed list<int32>
      (``__packedstrlens__<name>``) — both pure offset arithmetic.

    :func:`unpack_list_columns` restores the exact original types."""
    for name in list(t.column_names):
        col = t.column(name)
        typ = col.type
        if not (pa.types.is_list(typ) or pa.types.is_large_list(typ)):
            continue
        vt = typ.value_type
        arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
        i = t.column_names.index(name)
        if pa.types.is_integer(vt) or pa.types.is_floating(vt):
            t = t.set_column(i, f"{_PACK_PREFIX}{vt}__{name}", _pack_fixed_list(arr, vt))
        elif pa.types.is_string(vt) or pa.types.is_large_string(vt):
            ls_off = np.asarray(arr.offsets).astype(np.int64)
            ls_off -= ls_off[0]
            vals = arr.flatten()  # StringArray of exactly the in-range values
            odt = np.int64 if pa.types.is_large_string(vals.type) else np.int32
            v_off = np.frombuffer(vals.buffers()[1], dtype=odt)[
                vals.offset : vals.offset + len(vals) + 1
            ].astype(np.int64)
            v_data = np.frombuffer(vals.buffers()[2], dtype=np.uint8)[v_off[0] : v_off[-1]]
            v_off = v_off - v_off[0]
            row_byte_off = v_off[ls_off]
            data_col = pa.Array.from_buffers(
                pa.large_binary(),
                len(arr),
                [None, pa.py_buffer(row_byte_off.tobytes()), pa.py_buffer(v_data.tobytes())],
            )
            lens_list = pa.ListArray.from_arrays(
                pa.array(ls_off.astype(np.int32)),
                pa.array(np.diff(v_off).astype(np.int32)),
            )
            t = t.set_column(i, f"{_PACK_STR_PREFIX}{vt}__{name}", data_col)
            t = t.append_column(
                f"{_PACK_STR_LENS_PREFIX}{name}", _pack_fixed_list(lens_list, pa.int32())
            )
    return t


def unpack_list_columns(t: pa.Table) -> pa.Table:
    """Inverse of :func:`pack_list_columns`."""
    for name in list(t.column_names):
        if name.startswith(_PACK_STR_PREFIX):
            typestr, orig = name[len(_PACK_STR_PREFIX):].split("__", 1)
            lens_name = f"{_PACK_STR_LENS_PREFIX}{orig}"
            data = t.column(name)
            data = data.combine_chunks() if isinstance(data, pa.ChunkedArray) else data
            lens_packed = t.column(lens_name)
            lens_packed = (
                lens_packed.combine_chunks() if isinstance(lens_packed, pa.ChunkedArray) else lens_packed
            )
            blobs = data.to_pylist()
            lens_rows = [
                np.frombuffer(b, dtype=np.int32) if b is not None else np.empty(0, np.int32)
                for b in lens_packed.to_pylist()
            ]
            counts = np.array([len(r) for r in lens_rows], dtype=np.int64)
            ls_off = np.concatenate([[0], np.cumsum(counts)]).astype(np.int64)
            all_lens = np.concatenate(lens_rows) if len(lens_rows) else np.empty(0, np.int32)
            v_off = np.concatenate([[0], np.cumsum(all_lens.astype(np.int64))])
            v_data = b"".join(b or b"" for b in blobs)
            values = pa.Array.from_buffers(
                pa.utf8(),
                len(all_lens),
                [None, pa.py_buffer(v_off.astype(np.int32).tobytes()), pa.py_buffer(v_data)],
            )
            rebuilt = pa.ListArray.from_arrays(pa.array(ls_off.astype(np.int32)), values)
            i = t.column_names.index(name)
            t = t.set_column(i, orig, rebuilt)
            t = t.drop_columns([lens_name])
            continue
        if not name.startswith(_PACK_PREFIX):
            continue
        typestr, orig = name[len(_PACK_PREFIX):].split("__", 1)
        vt = pa.type_for_alias(typestr)
        width = vt.bit_width // 8
        col = t.column(name)
        arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
        np_dtype = np.dtype(vt.to_pandas_dtype())
        try:
            # buffer path: relabel (offsets, data) back to a list array —
            # no per-row Python
            off_buf = arr.buffers()[1]
            dtype_off = np.int64 if pa.types.is_large_binary(arr.type) else np.int32
            bo = np.frombuffer(off_buf, dtype=dtype_off)[arr.offset : arr.offset + len(arr) + 1]
            data = np.frombuffer(arr.buffers()[2], dtype=np_dtype)
            flat = data[bo[0] // width : bo[-1] // width]
            offsets = ((bo - bo[0]) // width).astype(np.int32)
        except Exception:  # exotic layout → row-wise fallback
            blobs = arr.to_pylist()
            flat = np.frombuffer(b"".join(b or b"" for b in blobs), dtype=np_dtype)
            lens = np.array([0 if b is None else len(b) // width for b in blobs], dtype=np.int64)
            offsets = np.zeros(len(lens) + 1, dtype=np.int32)
            np.cumsum(lens, out=offsets[1:])
        rebuilt = pa.ListArray.from_arrays(pa.array(offsets), pa.array(flat, type=vt))
        i = t.column_names.index(name)
        t = t.set_column(i, orig, rebuilt)
    return t


def left_anti_join(ds, keys_ds, *, key: str, num_partitions: int | None = None):
    """Fully distributed left-anti join: keep ds rows whose key does NOT
    appear in keys_ds. List-typed payload columns are binary-packed around
    the Acero join (which rejects list non-key fields) and restored after."""
    num_partitions = default_join_partitions(num_partitions)
    marked = keys_ds.select_columns([key]).map_batches(
        lambda t: t.append_column("__hit", pa.array(np.ones(len(t), dtype=np.int8))),
        batch_format="pyarrow",
    )
    packed = ds.map_batches(pack_list_columns, batch_format="pyarrow")
    joined = packed.join(marked, join_type="left_outer", num_partitions=num_partitions, on=(key,))

    def keep_miss(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        if "__hit" not in t.column_names:
            return unpack_list_columns(t)
        t = t.filter(pc.is_null(t.column("__hit"))).drop_columns(["__hit"])
        return unpack_list_columns(t)

    return joined.map_batches(keep_miss, batch_format="pyarrow")
