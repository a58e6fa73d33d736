"""Pure-numpy media codecs — the real decode path for the multimodal stages.

This environment has no image/audio libraries, but three classic formats
are simple enough to parse with numpy alone, which lets the
decode → resize → featurize pipeline run END TO END on real bytes:

- **PPM (P6)** — the netpbm binary RGB format: ASCII header + raw pixels.
- **BMP** — 24-bit uncompressed Windows bitmaps (BITMAPINFOHEADER),
  bottom-up rows with 4-byte padding, BGR order.
- **WAV** — RIFF PCM 16-bit, any channel count (chunk-walk parser).
- **PPM-SEQ** — a trivial video container: N concatenated P6 frames
  (mime ``video/x-ppm-seq``); real enough to drive frame sampling.

Encoders exist so tests can generate fixtures; decoders validate their
input and raise ``ValueError`` on malformed bytes. Formats that genuinely
need external codecs (JPEG/PNG/MP4/...) remain honestly stubbed in
stages/multimodal.py.
"""

from __future__ import annotations

import struct

import numpy as np

# ---------------------------------------------------------------------------
# PPM (P6)
# ---------------------------------------------------------------------------


def encode_ppm(img: np.ndarray) -> bytes:
    """(H, W, 3) uint8 → binary PPM bytes."""
    img = np.ascontiguousarray(img, dtype=np.uint8)
    if img.ndim != 3 or img.shape[2] != 3:
        raise ValueError("encode_ppm expects (H, W, 3) uint8")
    h, w = img.shape[:2]
    return b"P6\n%d %d\n255\n" % (w, h) + img.tobytes()


def _ppm_header(b: bytes, start: int = 0):
    """Parse one P6 header starting at ``start``; returns (w, h, data_off).
    Handles arbitrary whitespace and ``#`` comments between tokens."""
    if b[start : start + 2] != b"P6":
        raise ValueError("not a P6 PPM payload")
    pos = start + 2
    vals = []
    while len(vals) < 3:
        while pos < len(b) and b[pos : pos + 1].isspace():
            pos += 1
        if pos < len(b) and b[pos : pos + 1] == b"#":
            while pos < len(b) and b[pos : pos + 1] != b"\n":
                pos += 1
            continue
        tok = bytearray()
        while pos < len(b) and not b[pos : pos + 1].isspace():
            tok += b[pos : pos + 1]
            pos += 1
        if not tok:
            raise ValueError("truncated PPM header")
        vals.append(int(tok))
    w, h, maxval = vals
    if maxval != 255:
        raise ValueError(f"unsupported PPM maxval {maxval}")
    return w, h, pos + 1  # single whitespace byte after maxval


def decode_ppm(b: bytes, start: int = 0) -> np.ndarray:
    """Binary PPM bytes → (H, W, 3) uint8."""
    w, h, off = _ppm_header(b, start)
    need = w * h * 3
    if len(b) - off < need:
        raise ValueError("truncated PPM pixel data")
    return np.frombuffer(b, dtype=np.uint8, count=need, offset=off).reshape(h, w, 3).copy()


# ---------------------------------------------------------------------------
# BMP (24-bit uncompressed)
# ---------------------------------------------------------------------------


def encode_bmp(img: np.ndarray) -> bytes:
    """(H, W, 3) uint8 RGB → 24-bit BMP bytes (bottom-up, padded rows)."""
    img = np.ascontiguousarray(img, dtype=np.uint8)
    if img.ndim != 3 or img.shape[2] != 3:
        raise ValueError("encode_bmp expects (H, W, 3) uint8")
    h, w = img.shape[:2]
    row = w * 3
    pad = (-row) % 4
    bgr = img[::-1, :, ::-1]  # bottom-up, BGR
    if pad:
        rows = np.zeros((h, row + pad), dtype=np.uint8)
        rows[:, :row] = bgr.reshape(h, row)
        body = rows.tobytes()
    else:
        body = bgr.tobytes()
    data_off = 14 + 40
    size = data_off + len(body)
    file_hdr = struct.pack("<2sIHHI", b"BM", size, 0, 0, data_off)
    info_hdr = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(body), 2835, 2835, 0, 0)
    return file_hdr + info_hdr + body


def decode_bmp(b: bytes) -> np.ndarray:
    """24-bit uncompressed BMP bytes → (H, W, 3) uint8 RGB."""
    if b[:2] != b"BM" or len(b) < 54:
        raise ValueError("not a BMP payload")
    data_off = struct.unpack_from("<I", b, 10)[0]
    hdr_size = struct.unpack_from("<I", b, 14)[0]
    if hdr_size < 40:
        raise ValueError(f"unsupported BMP header size {hdr_size}")
    w = struct.unpack_from("<i", b, 18)[0]
    h = struct.unpack_from("<i", b, 22)[0]
    bpp = struct.unpack_from("<H", b, 28)[0]
    compression = struct.unpack_from("<I", b, 30)[0]
    if bpp != 24 or compression != 0:
        raise ValueError(f"unsupported BMP variant (bpp={bpp}, compression={compression})")
    bottom_up = h > 0
    h = abs(h)
    stride = ((w * 3 + 3) // 4) * 4
    need = stride * h
    if len(b) - data_off < need:
        raise ValueError("truncated BMP pixel data")
    rows = np.frombuffer(b, dtype=np.uint8, count=need, offset=data_off).reshape(h, stride)
    bgr = rows[:, : w * 3].reshape(h, w, 3)
    if bottom_up:
        bgr = bgr[::-1]
    return bgr[:, :, ::-1].copy()  # BGR → RGB


# ---------------------------------------------------------------------------
# PNG (stdlib zlib: inflate + per-row unfilter — no codec library needed)
# ---------------------------------------------------------------------------

_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def _png_chunk(ctype: bytes, data: bytes) -> bytes:
    import zlib

    return (
        struct.pack(">I", len(data))
        + ctype
        + data
        + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
    )


def encode_png(img: np.ndarray) -> bytes:
    """(H, W, 3) uint8 RGB → PNG bytes (8-bit truecolor, filter 0 rows,
    one zlib-compressed IDAT)."""
    import zlib

    img = np.ascontiguousarray(img, dtype=np.uint8)
    if img.ndim != 3 or img.shape[2] != 3:
        raise ValueError("encode_png expects (H, W, 3) uint8")
    h, w = img.shape[:2]
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    raw = np.zeros((h, 1 + w * 3), dtype=np.uint8)
    raw[:, 1:] = img.reshape(h, w * 3)  # filter byte 0 per row
    idat = zlib.compress(raw.tobytes(), 6)
    return (
        _PNG_SIG
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", idat)
        + _png_chunk(b"IEND", b"")
    )


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa_, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa_ <= pb and pa_ <= pc:
        return a
    return b if pb <= pc else c


def _unfilter(raw: np.ndarray, h: int, stride: int, bpp: int) -> np.ndarray:
    """Undo PNG row filters 0–4. Rows with sequential dependencies (sub /
    average / paeth) fall back to a per-byte loop; none / up stay
    vectorized — encoders overwhelmingly emit those for synthetic data."""
    rows = raw.reshape(h, 1 + stride)
    out = np.zeros((h, stride), dtype=np.uint8)
    for y in range(h):
        f = int(rows[y, 0])
        cur = rows[y, 1:]
        prev = out[y - 1] if y else np.zeros(stride, dtype=np.uint8)
        if f == 0:
            out[y] = cur
        elif f == 2:  # up
            out[y] = cur + prev  # uint8 add wraps mod 256, per spec
        elif f == 1:  # sub: recon[x] = raw[x] + recon[x-bpp], per byte lane
            lanes = cur.reshape(-1, bpp)
            out[y] = np.add.accumulate(lanes, axis=0, dtype=np.uint8).ravel()
        elif f == 3:  # average
            o = out[y]
            for x in range(stride):
                left = int(o[x - bpp]) if x >= bpp else 0
                o[x] = (int(cur[x]) + ((left + int(prev[x])) >> 1)) & 0xFF
        elif f == 4:  # paeth
            o = out[y]
            for x in range(stride):
                left = int(o[x - bpp]) if x >= bpp else 0
                ul = int(prev[x - bpp]) if x >= bpp else 0
                o[x] = (int(cur[x]) + _paeth(left, int(prev[x]), ul)) & 0xFF
        else:
            raise ValueError(f"unknown PNG filter type {f}")
    return out


def decode_png(b: bytes) -> np.ndarray:
    """PNG bytes → (H, W, 3) uint8 RGB.

    Supports the common still-image profile: 8-bit depth, color types 0
    (gray), 2 (RGB), 3 (palette), 4 (gray+alpha), 6 (RGBA), non-interlaced.
    Alpha is dropped, gray broadcast to 3 channels, palettes resolved
    through PLTE. Interlaced (Adam7) and 16-bit files raise ``ValueError``
    (rare profiles; re-encode upstream)."""
    import zlib

    if b[:8] != _PNG_SIG:
        raise ValueError("not a PNG payload")
    pos = 8
    w = h = depth = ctype = interlace = None
    idat = bytearray()
    plte = None
    while pos + 8 <= len(b):
        (clen,) = struct.unpack_from(">I", b, pos)
        cid = b[pos + 4 : pos + 8]
        data = b[pos + 8 : pos + 8 + clen]
        if cid == b"IHDR":
            w, h, depth, ctype, _comp, _filt, interlace = struct.unpack(">IIBBBBB", data)
        elif cid == b"PLTE":
            plte = np.frombuffer(data, dtype=np.uint8).reshape(-1, 3)
        elif cid == b"IDAT":
            idat += data
        elif cid == b"IEND":
            break
        pos += 12 + clen  # len + type + data + crc
    if w is None:
        raise ValueError("PNG missing IHDR")
    if depth != 8:
        raise ValueError(f"unsupported PNG bit depth {depth} (only 8)")
    if interlace:
        raise ValueError("interlaced (Adam7) PNG not supported")
    channels = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}.get(ctype)
    if channels is None:
        raise ValueError(f"unsupported PNG color type {ctype}")
    raw = np.frombuffer(zlib.decompress(bytes(idat)), dtype=np.uint8)
    stride = w * channels
    if len(raw) < h * (1 + stride):
        raise ValueError("truncated PNG pixel data")
    px = _unfilter(raw[: h * (1 + stride)], h, stride, channels).reshape(h, w, channels)
    if ctype == 2:
        return px.copy()
    if ctype == 6:
        return px[:, :, :3].copy()
    if ctype == 0:
        return np.repeat(px, 3, axis=2)
    if ctype == 4:
        return np.repeat(px[:, :, :1], 3, axis=2)
    # ctype == 3: palette lookup
    if plte is None:
        raise ValueError("palette PNG missing PLTE chunk")
    return plte[px[:, :, 0]]


# ---------------------------------------------------------------------------
# WAV (RIFF PCM16)
# ---------------------------------------------------------------------------


def encode_wav(samples: np.ndarray, rate: int = 16_000) -> bytes:
    """int16 samples, shape (n,) or (n, channels) → RIFF/WAVE PCM16 bytes."""
    s = np.asarray(samples, dtype=np.int16)
    if s.ndim == 1:
        s = s[:, None]
    n, ch = s.shape
    data = np.ascontiguousarray(s).tobytes()
    fmt = struct.pack("<HHIIHH", 1, ch, rate, rate * ch * 2, ch * 2, 16)
    out = (
        b"RIFF"
        + struct.pack("<I", 4 + 8 + len(fmt) + 8 + len(data))
        + b"WAVE"
        + b"fmt "
        + struct.pack("<I", len(fmt))
        + fmt
        + b"data"
        + struct.pack("<I", len(data))
        + data
    )
    return out


def decode_wav(b: bytes):
    """RIFF PCM16 bytes → ((n, channels) int16 array, sample_rate)."""
    if b[:4] != b"RIFF" or b[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    pos = 12
    rate = channels = None
    data = None
    while pos + 8 <= len(b):
        cid = b[pos : pos + 4]
        clen = struct.unpack_from("<I", b, pos + 4)[0]
        body = b[pos + 8 : pos + 8 + clen]
        if cid == b"fmt ":
            audio_fmt, channels, rate = struct.unpack_from("<HHI", body, 0)
            bits = struct.unpack_from("<H", body, 14)[0]
            if audio_fmt != 1 or bits != 16:
                raise ValueError(f"unsupported WAV (fmt={audio_fmt}, bits={bits})")
        elif cid == b"data":
            data = body
        pos += 8 + clen + (clen & 1)  # chunks are word-aligned
    if rate is None or data is None:
        raise ValueError("WAV missing fmt/data chunk")
    s = np.frombuffer(data, dtype="<i2")
    if channels > 1:
        s = s[: (len(s) // channels) * channels].reshape(-1, channels)
    else:
        s = s[:, None]
    return s.copy(), int(rate)


# ---------------------------------------------------------------------------
# PPM-SEQ (concatenated P6 frames — the trivial video container)
# ---------------------------------------------------------------------------


def encode_ppm_seq(frames: list[np.ndarray]) -> bytes:
    return b"".join(encode_ppm(f) for f in frames)


def ppm_seq_offsets(b: bytes) -> list[int]:
    """Byte offsets of each P6 frame in a concatenated-PPM container."""
    offs = []
    pos = 0
    while pos < len(b):
        if b[pos : pos + 2] != b"P6":
            raise ValueError(f"ppm-seq: garbage at offset {pos}")
        offs.append(pos)
        w, h, data_off = _ppm_header(b, pos)
        pos = data_off + w * h * 3
    return offs


def extract_ppm_frame(b: bytes, ts_ms: int, duration_ms: int) -> bytes:
    """The single encoded frame whose time slot covers ``ts_ms`` (frames
    are uniform over the duration). Returns PPM bytes for that frame."""
    offs = ppm_seq_offsets(b)
    nf = len(offs)
    j = min(nf - 1, int(ts_ms * nf / max(int(duration_ms), 1)))
    end = offs[j + 1] if j + 1 < nf else len(b)
    return b[offs[j] : end]


# ---------------------------------------------------------------------------
# numpy transforms over decoded media
# ---------------------------------------------------------------------------


def resize_nearest(img: np.ndarray, width: int, height: int) -> np.ndarray:
    """Nearest-neighbor resize, fully vectorized (two index gathers)."""
    h, w = img.shape[:2]
    rows = np.minimum((np.arange(height) * h) // height, h - 1)
    cols = np.minimum((np.arange(width) * w) // width, w - 1)
    return img[rows][:, cols]


def detect_mime(payload: bytes) -> str | None:
    """Magic-byte sniff for the formats this module can decode."""
    if payload[:2] == b"P6":
        # one frame or several?
        try:
            return "video/x-ppm-seq" if len(ppm_seq_offsets(payload)) > 1 else "image/x-ppm"
        except ValueError:
            return "image/x-ppm"
    if payload[:2] == b"BM":
        return "image/bmp"
    if payload[:8] == _PNG_SIG:
        return "image/png"
    if payload[:4] == b"RIFF" and payload[8:12] == b"WAVE":
        return "audio/wav"
    return None


def decode_image(payload: bytes) -> np.ndarray:
    """PPM, BMP or PNG bytes → (H, W, 3) uint8 (magic-byte dispatch)."""
    if payload[:2] == b"P6":
        return decode_ppm(payload)
    if payload[:2] == b"BM":
        return decode_bmp(payload)
    if payload[:8] == _PNG_SIG:
        return decode_png(payload)
    raise ValueError(
        "unknown image format (supported here: PPM P6, 24-bit BMP, 8-bit PNG)"
    )


def image_features(img: np.ndarray, out_dim: int) -> np.ndarray:
    """Deterministic fixed-size embedding of a decoded image: grayscale
    nearest-resized to a k×k thumbnail (k = ceil(sqrt(out_dim))), values
    scaled to [0, 1], flattened and truncated to ``out_dim``."""
    k = int(np.ceil(np.sqrt(out_dim)))
    gray = resize_nearest(img, k, k).astype(np.float32).mean(axis=2) / np.float32(255.0)
    return gray.ravel()[:out_dim].astype(np.float32)


def audio_features(samples: np.ndarray, out_dim: int) -> np.ndarray:
    """Deterministic fixed-size embedding of decoded PCM: per-window RMS
    over ``out_dim`` uniform windows of the mono mixdown, scaled to [0, 1]."""
    mono = samples.astype(np.float32).mean(axis=1) / np.float32(32768.0)
    n = len(mono)
    if n == 0:
        return np.zeros(out_dim, np.float32)
    edges = (np.arange(out_dim + 1) * n) // out_dim
    sq = np.concatenate([[0.0], np.cumsum(mono.astype(np.float64) ** 2)])
    counts = np.maximum(np.diff(edges), 1)
    rms = np.sqrt((sq[edges[1:]] - sq[edges[:-1]]) / counts)
    return rms.astype(np.float32)
