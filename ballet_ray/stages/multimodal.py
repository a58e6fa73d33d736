"""Multimodal (image/audio/video) column plumbing.

Media travel as opaque ``binary`` columns plus typed metadata columns; all
Ray-side plumbing (schema, small batches for wide rows, actor-pool decode
stages, output layout) is real and tested. The actual codec work is STUBBED
— the decode libraries are not available in this environment — behind
``decode_fn``: pass a real decoder in production, or leave the default
deterministic fake (which hashes bytes into a fixed-size feature vector)
for tests.

Batch-size guidance: with payloads of p bytes, choose
``batch_size ≈ target_block_bytes / p`` so a batch × actor-pool concurrency
fits the worker heap (SURVEY.md §4.2).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

MEDIA_SCHEMA = pa.schema(
    [
        ("media_id", pa.string()),
        ("payload", pa.binary()),
        ("mime", pa.string()),
        ("width", pa.int32()),
        ("height", pa.int32()),
        ("duration_ms", pa.int32()),
    ]
)


def _fake_decode(payload: bytes, out_dim: int) -> np.ndarray:
    """Deterministic stand-in for a real decoder: hash → feature vector."""
    h = hashlib.blake2b(payload, digest_size=out_dim * 4).digest()
    return np.frombuffer(h, dtype=np.uint32).astype(np.float32) / np.float32(2**32)


class MediaFeaturizer:
    """Actor-pool stage: binary payload → fixed-size feature vector.

    ``decoder`` (loaded once per actor in __init__) would be the real
    image/audio model; here it raises NotImplementedError unless
    ``use_fake=True`` supplies the deterministic fake.
    """

    def __init__(self, out_dim: int = 16, use_fake: bool = True):
        self.out_dim = out_dim
        if use_fake:
            self.decode = lambda b: _fake_decode(b, out_dim)
        else:  # pragma: no cover - real decoders unavailable in this env
            raise NotImplementedError(
                "real media decoding requires image/audio libraries not present "
                "in this environment; pass use_fake=True"
            )

    def __call__(self, table: pa.Table) -> pa.Table:
        payloads = table.column("payload").to_pylist()
        feats = (
            np.stack([self.decode(p) for p in payloads])
            if payloads
            else np.empty((0, self.out_dim), np.float32)
        )
        arr = pa.FixedSizeListArray.from_arrays(
            pa.array(feats.ravel(), type=pa.float32()), self.out_dim
        )
        return table.append_column("media_feat", arr)


def featurize_media(ds, *, out_dim: int = 16, batch_size: int = 64, concurrency: int = 2):
    """Run the (stub) decoder as an actor pool with media-sized batches."""
    return ds.map_batches(
        MediaFeaturizer,
        fn_constructor_kwargs={"out_dim": out_dim, "use_fake": True},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )


def synthetic_media_table(n: int, payload_bytes: int = 4096, seed: int = 1754) -> pa.Table:
    """Deterministic fake media rows for plumbing tests."""
    rng = np.random.RandomState(seed)
    payloads = [rng.bytes(payload_bytes) for _ in range(n)]
    return pa.table(
        {
            "media_id": pa.array([f"m{i:06d}" for i in range(n)]),
            "payload": pa.array(payloads, type=pa.binary()),
            "mime": pa.array(["image/fake"] * n),
            "width": pa.array(np.full(n, 64, dtype=np.int32)),
            "height": pa.array(np.full(n, 64, dtype=np.int32)),
            "duration_ms": pa.array(np.zeros(n, dtype=np.int32)),
        }
    )
