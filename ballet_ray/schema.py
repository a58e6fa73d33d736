"""Canonical north-rule input schema + deterministic synthetic corpus generator.

Input table shape (BASELINE.json ``input_hint``):

    doc_id: string, tokens: list<int32>, n_tok: int32, source: string

The generator is a pure function of ``(seed, row_index)`` (FIXTURES.md §A):
any shard can be regenerated independently, which is what makes
checkpoint-resume tests meaningful. Skew is built in — one hot ``doc_id``
owns ~25% of rows — to exercise the engine's skew-splitting paths.

``event_ts`` is derived in-pipeline (not stored), strictly increasing per
``doc_id``:  ts(i) = T0 + i*37s + floor(i/97)*2h  is monotone in the global
row index i, and each doc's occurrences have increasing i.  Every 97th row
introduces a >1h jump so gap-based sessionization is non-trivial.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ballet_ray.functions.hashing import mix

SEED = 1754  # reference RANDOM_STATE (ballet/util/__init__.py:18)
VOCAB = 50257
SOURCES = np.array(["web", "book", "code", "wiki"])
T0_US = np.int64(1577836800_000_000)  # 2020-01-01T00:00:00Z in microseconds

TOKEN_SCHEMA = pa.schema(
    [
        ("doc_id", pa.string()),
        ("tokens", pa.list_(pa.int32())),
        ("n_tok", pa.int32()),
        ("source", pa.string()),
    ]
)


def _doc_base(idx: np.ndarray, n_docs: int, seed: int) -> np.ndarray:
    """Skewed doc assignment: base 0 is hot (~25% of rows); the rest are
    spread geometrically (bucket k owns ~2^-k of the remaining rows)."""
    h = mix(idx, seed, 11)
    hot = (h % np.uint64(4)) == 0
    # geometric bucket from trailing-zero count of a second hash
    h2 = mix(idx, seed, 13)
    k = np.minimum((h2 & np.uint64(0xFF)).astype(np.int64).copy(), 6)
    # shrink the candidate id space by 2^k -> small ids appear more often
    k = np.zeros(len(idx), dtype=np.int64)
    tz = h2
    for _ in range(6):  # count up to 6 trailing zero bits, vectorized
        zero = (tz & np.uint64(1)) == 0
        k += zero.astype(np.int64)
        tz = tz >> np.uint64(1)
        tz[~zero] = np.uint64(1)  # stop counting once a 1 bit is seen
    space = np.maximum(1, (n_docs >> k).astype(np.int64))
    base = 1 + (mix(idx, seed, 17) % space.astype(np.uint64)).astype(np.int64)
    return np.where(hot, 0, base)


def generate_shard(
    shard: int,
    rows_per_shard: int,
    *,
    n_docs: int = 10_000,
    seed: int = SEED,
    with_ts: bool = False,
) -> pa.Table:
    """Generate one shard of the synthetic token corpus, fully vectorized.

    Pure in ``(seed, shard, rows_per_shard, n_docs)`` — regenerating a shard
    after a failure yields byte-identical data.
    """
    lo = shard * rows_per_shard
    idx = np.arange(lo, lo + rows_per_shard, dtype=np.uint64)

    base = _doc_base(idx, n_docs, seed)
    doc_id = np.char.add("doc", np.char.zfill(base.astype("U8"), 8))

    lengths = (16 + (mix(idx, seed, 23) % np.uint64(496)).astype(np.int64)).astype(np.int32)
    offsets = np.zeros(len(idx) + 1, dtype=np.int64)
    np.cumsum(lengths, out=offsets[1:])
    total = int(offsets[-1])
    # per-token hash: seed_row repeated + intra-row position
    row_seed = mix(idx, seed, 29)
    flat_seed = np.repeat(row_seed, lengths)
    pos = np.arange(total, dtype=np.uint64) - np.repeat(offsets[:-1].astype(np.uint64), lengths)
    tokens_flat = (mix(flat_seed, pos) % np.uint64(VOCAB)).astype(np.int32)

    tokens = pa.ListArray.from_arrays(pa.array(offsets, type=pa.int32()), pa.array(tokens_flat))
    source = SOURCES[(mix(base.astype(np.uint64), seed, 31) % np.uint64(4)).astype(np.int64)]

    cols = {
        "doc_id": pa.array(doc_id),
        "tokens": tokens,
        "n_tok": pa.array(lengths, type=pa.int32()),
        "source": pa.array(source),
    }
    if with_ts:
        cols["event_ts"] = pa.array(event_ts_for(idx.astype(np.int64)), type=pa.timestamp("us"))
    return pa.table(cols)


def event_ts_for(global_idx: np.ndarray) -> np.ndarray:
    """Derived event timestamp (µs since epoch); strictly increasing in the
    global row index, with a >1h jump every 97 rows (session boundaries)."""
    i = np.asarray(global_idx, dtype=np.int64)
    return T0_US + i * 37_000_000 + (i // 97) * 7_200_000_000


def write_corpus(
    path: str,
    rows: int,
    *,
    shards: int = 16,
    n_docs: int = 10_000,
    seed: int = SEED,
    with_ts: bool = False,
) -> str:
    """Write a sharded synthetic corpus to ``path`` (one file per shard)."""
    import os

    import pyarrow.parquet as pq

    os.makedirs(path, exist_ok=True)
    rows_per_shard = (rows + shards - 1) // shards
    for s in range(shards):
        n = min(rows_per_shard, rows - s * rows_per_shard)
        if n <= 0:
            break
        tbl = generate_shard(s, n, n_docs=n_docs, seed=seed, with_ts=with_ts)
        pq.write_table(tbl, os.path.join(path, f"shard-{s:05d}.parquet"))
    return path
