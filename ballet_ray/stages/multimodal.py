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


class MediaResizer:
    """Actor-pool stage: payload → resized payload + updated metadata.

    The Ray-side plumbing (per-actor transcoder setup, payload-in →
    payload-out schema, width/height metadata rewrite, media-sized batches)
    is real; the pixel work is STUBBED behind ``transcode_fn`` — pass a real
    ``bytes -> bytes`` resizer in production, or leave the deterministic
    fake (re-hash to a size proportional to the target area)."""

    def __init__(self, width: int, height: int, transcode_fn=None, use_fake: bool = True):
        self.width, self.height = width, height
        if transcode_fn is not None:
            self.transcode = transcode_fn
        elif use_fake:
            out_bytes = max(16, (width * height) // 64)
            self.transcode = lambda b: hashlib.blake2b(b, digest_size=min(64, out_bytes)).digest()
        else:  # pragma: no cover - real codecs unavailable in this env
            raise NotImplementedError(
                "real image resizing requires codec libraries not present in "
                "this environment; pass transcode_fn or use_fake=True"
            )

    def __call__(self, table: pa.Table) -> pa.Table:
        payloads = [self.transcode(p) for p in table.column("payload").to_pylist()]
        n = len(table)
        cols = {c: table.column(c) for c in table.column_names}
        cols["payload"] = pa.array(payloads, type=pa.binary())
        cols["width"] = pa.array(np.full(n, self.width, dtype=np.int32))
        cols["height"] = pa.array(np.full(n, self.height, dtype=np.int32))
        return pa.table(cols)


def resize_media(ds, *, width: int, height: int, batch_size: int = 64, concurrency: int = 2):
    return ds.map_batches(
        MediaResizer,
        fn_constructor_kwargs={"width": width, "height": height},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )


class FrameSampler:
    """Actor-pool ONE-TO-MANY stage: each video row → ``n_frames`` frame
    rows sampled uniformly over ``duration_ms``. Output schema:
    (media_id, frame_idx, frame_ts_ms, payload). The frame-extraction codec
    is STUBBED behind ``extract_fn(payload, ts_ms) -> bytes`` (deterministic
    fake: keyed hash of payload+timestamp); the explode plumbing, schema and
    batch sizing are real."""

    def __init__(self, n_frames: int = 4, extract_fn=None, use_fake: bool = True):
        self.n_frames = n_frames
        if extract_fn is not None:
            self.extract = extract_fn
        elif use_fake:
            self.extract = lambda b, ts: hashlib.blake2b(
                b, digest_size=32, key=int(ts).to_bytes(8, "little")
            ).digest()
        else:  # pragma: no cover
            raise NotImplementedError(
                "real frame extraction requires video codecs not present in "
                "this environment; pass extract_fn or use_fake=True"
            )

    def __call__(self, table: pa.Table) -> pa.Table:
        ids = table.column("media_id").to_pylist()
        payloads = table.column("payload").to_pylist()
        durations = table.column("duration_ms").to_numpy(zero_copy_only=False)
        out_id, out_idx, out_ts, out_payload = [], [], [], []
        for mid, payload, dur in zip(ids, payloads, durations):
            # uniform sampling: frame j at (j + 0.5)/n of the duration
            for j in range(self.n_frames):
                ts = int((j + 0.5) * max(int(dur), 1) / self.n_frames)
                out_id.append(mid)
                out_idx.append(j)
                out_ts.append(ts)
                out_payload.append(self.extract(payload, ts))
        return pa.table(
            {
                "media_id": pa.array(out_id),
                "frame_idx": pa.array(np.asarray(out_idx, dtype=np.int32)),
                "frame_ts_ms": pa.array(np.asarray(out_ts, dtype=np.int64)),
                "payload": pa.array(out_payload, type=pa.binary()),
            }
        )


def sample_frames(ds, *, n_frames: int = 4, batch_size: int = 16, concurrency: int = 2):
    """Video table → frame table (rows × n_frames). Small batches: each
    output batch is n_frames× wider than its input."""
    return ds.map_batches(
        FrameSampler,
        fn_constructor_kwargs={"n_frames": n_frames},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )
