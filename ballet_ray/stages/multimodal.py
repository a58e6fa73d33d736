"""Multimodal (image/audio/video) column plumbing.

Media travel as opaque ``binary`` columns plus typed metadata columns; all
Ray-side plumbing (schema, small batches for wide rows, actor-pool decode
stages, output layout) is real and tested. Decoding is REAL for the
formats the pure-numpy codecs cover (PPM/BMP/PNG/baseline-JPEG images —
PNG via stdlib zlib inflate + per-row unfilter, JPEG via the baseline
DCT/Huffman decoder — RIFF PCM16 WAV audio, concatenated-PPM frame
sequences; see stages/codecs.py), selected by magic-byte sniffing
per payload. Formats that genuinely need external
codec libraries (progressive JPEG/MP4/...) remain stubbed behind
``decode_fn``/``transcode_fn``/``extract_fn`` — pass a real codec in
production, or leave ``use_fake=True`` for a deterministic hash-based
stand-in in tests.

Batch-size guidance: with payloads of p bytes, choose
``batch_size ≈ target_block_bytes / p`` so a batch × actor-pool concurrency
fits the worker heap (SURVEY.md §4.2).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

from ballet_ray.stages import codecs as _codecs

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

    Per payload, magic-byte dispatch: PPM/BMP/PNG/baseline-JPEG → decode
    + grayscale thumbnail embedding; WAV → decode + windowed-RMS
    embedding; PPM-SEQ → first frame's image embedding (all real numpy
    decode paths, stages/codecs.py). Anything else uses ``decode_fn`` if
    given, the deterministic fake if ``use_fake``, else raises
    NotImplementedError (progressive JPEG/MP4/... need codec libraries
    this environment lacks)."""

    def __init__(self, out_dim: int = 16, use_fake: bool = True, decode_fn=None):
        self.out_dim = out_dim
        self.decode_fn = decode_fn
        self.use_fake = use_fake

    def _features(self, payload: bytes) -> np.ndarray:
        mime = _codecs.detect_mime(payload)
        if mime in ("image/x-ppm", "image/bmp", "image/png", "image/jpeg"):
            return _codecs.image_features(_codecs.decode_image(payload), self.out_dim)
        if mime == "audio/wav":
            samples, rate = _codecs.decode_wav(payload)
            return _codecs.audio_features(samples, self.out_dim)
        if mime == "video/x-ppm-seq":
            first = _codecs.extract_ppm_frame(payload, 0, 1)
            return _codecs.image_features(_codecs.decode_ppm(first), self.out_dim)
        if self.decode_fn is not None:
            return np.asarray(self.decode_fn(payload), dtype=np.float32)[: self.out_dim]
        if self.use_fake:
            return _fake_decode(payload, self.out_dim)
        raise NotImplementedError(
            "payload format not decodable with the built-in numpy codecs "
            "(PPM/BMP/PNG/JPEG/WAV/PPM-SEQ); pass decode_fn or use_fake=True"
        )

    def __call__(self, table: pa.Table) -> pa.Table:
        payloads = table.column("payload").to_pylist()
        feats = (
            np.stack([self._features(p) for p in payloads])
            if payloads
            else np.empty((0, self.out_dim), np.float32)
        )
        arr = pa.FixedSizeListArray.from_arrays(
            pa.array(feats.ravel(), type=pa.float32()), self.out_dim
        )
        return table.append_column("media_feat", arr)


def featurize_media(ds, *, out_dim: int = 16, batch_size: int = 64, concurrency: int = 2):
    """Run the decoder as an actor pool with media-sized batches."""
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


def synthetic_image_table(n: int, width: int = 32, height: int = 24, fmt: str = "ppm",
                          seed: int = 1754) -> pa.Table:
    """Real decodable media rows: random RGB images encoded as PPM, BMP
    or PNG."""
    rng = np.random.RandomState(seed)
    enc = {"ppm": _codecs.encode_ppm, "bmp": _codecs.encode_bmp,
           "png": _codecs.encode_png, "jpeg": _codecs.encode_jpeg}[fmt]
    payloads = [enc(rng.randint(0, 256, (height, width, 3)).astype(np.uint8)) for _ in range(n)]
    mime = {"png": "image/png", "jpeg": "image/jpeg"}.get(fmt, f"image/x-{fmt}")
    return pa.table(
        {
            "media_id": pa.array([f"img{i:06d}" for i in range(n)]),
            "payload": pa.array(payloads, type=pa.binary()),
            "mime": pa.array([mime] * n),
            "width": pa.array(np.full(n, width, dtype=np.int32)),
            "height": pa.array(np.full(n, height, dtype=np.int32)),
            "duration_ms": pa.array(np.zeros(n, dtype=np.int32)),
        }
    )


class MediaResizer:
    """Actor-pool stage: payload → resized payload + updated metadata.

    PPM, BMP and PNG payloads take the REAL path: decode → vectorized
    nearest-neighbor resize → re-encode in the same format
    (stages/codecs.py); PPM-SEQ containers resize every frame. Other
    formats use ``transcode_fn`` if given, the deterministic fake if
    ``use_fake``, else raise (codec libraries unavailable here)."""

    def __init__(self, width: int, height: int, transcode_fn=None, use_fake: bool = True):
        self.width, self.height = width, height
        self.transcode_fn = transcode_fn
        self.use_fake = use_fake
        out_bytes = max(16, (width * height) // 64)
        self._fake = lambda b: hashlib.blake2b(b, digest_size=min(64, out_bytes)).digest()

    def _resize(self, payload: bytes) -> bytes:
        mime = _codecs.detect_mime(payload)
        if mime == "image/x-ppm":
            return _codecs.encode_ppm(
                _codecs.resize_nearest(_codecs.decode_ppm(payload), self.width, self.height)
            )
        if mime == "image/bmp":
            return _codecs.encode_bmp(
                _codecs.resize_nearest(_codecs.decode_bmp(payload), self.width, self.height)
            )
        if mime == "image/png":
            return _codecs.encode_png(
                _codecs.resize_nearest(_codecs.decode_png(payload), self.width, self.height)
            )
        if mime == "image/jpeg":
            return _codecs.encode_jpeg(
                _codecs.resize_nearest(_codecs.decode_jpeg(payload), self.width, self.height)
            )
        if mime == "video/x-ppm-seq":
            offs = _codecs.ppm_seq_offsets(payload)
            frames = [
                _codecs.resize_nearest(_codecs.decode_ppm(payload, o), self.width, self.height)
                for o in offs
            ]
            return _codecs.encode_ppm_seq(frames)
        if self.transcode_fn is not None:
            return self.transcode_fn(payload)
        if self.use_fake:
            return self._fake(payload)
        raise NotImplementedError(
            "payload format not resizable with the built-in numpy codecs "
            "(PPM/BMP/PNG/JPEG/PPM-SEQ); pass transcode_fn or use_fake=True"
        )

    def __call__(self, table: pa.Table) -> pa.Table:
        payloads = [self._resize(p) for p in table.column("payload").to_pylist()]
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
    (media_id, frame_idx, frame_ts_ms, payload).

    PPM-SEQ containers take the REAL path: the frame whose time slot
    covers the sample timestamp is sliced out of the container (each
    output payload is one decodable PPM image). Other containers use
    ``extract_fn(payload, ts_ms) -> bytes`` if given, the deterministic
    fake if ``use_fake``, else raise (video codecs unavailable here)."""

    def __init__(self, n_frames: int = 4, extract_fn=None, use_fake: bool = True):
        self.n_frames = n_frames
        self.extract_fn = extract_fn
        self.use_fake = use_fake
        self._fake = lambda b, ts: hashlib.blake2b(
            b, digest_size=32, key=int(ts).to_bytes(8, "little")
        ).digest()

    def _extract(self, payload: bytes, ts: int, dur: int) -> bytes:
        if _codecs.detect_mime(payload) == "video/x-ppm-seq":
            return _codecs.extract_ppm_frame(payload, ts, dur)
        if self.extract_fn is not None:
            return self.extract_fn(payload, ts)
        if self.use_fake:
            return self._fake(payload, ts)
        raise NotImplementedError(
            "payload is not a PPM-SEQ container; pass extract_fn or use_fake=True"
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
                out_payload.append(self._extract(payload, ts, int(dur)))
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
