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

Plus two formats decoded with stdlib + numpy alone:

- **PNG** — stdlib zlib inflate + per-row unfilter (filters 0–4).
- **JPEG** — baseline sequential DCT/Huffman decoder (SOF0, grayscale or
  YCbCr at any h/v sampling, restart markers); entropy decode is the one
  serial loop, everything downstream is vectorized over all blocks.

Encoders exist so tests can generate fixtures; decoders validate their
input and raise ``ValueError`` on malformed bytes. Formats that genuinely
need external codecs (progressive/arithmetic JPEG, MP4, ...) remain
honestly stubbed in stages/multimodal.py.
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


# ---------------------------------------------------------------------------
# JPEG (baseline sequential DCT + Huffman — pure numpy, no codec library)
# ---------------------------------------------------------------------------
# Decoder: SOF0 baseline, grayscale or YCbCr with arbitrary h/v sampling
# factors (4:4:4 / 4:2:2 / 4:2:0), restart markers, 8- and 16-bit DQT.
# Entropy decode is the one per-symbol Python loop (Huffman is inherently
# serial); everything after it — dequantize, de-zigzag, IDCT, plane
# assembly, upsample, color transform — is vectorized over ALL blocks at
# once. Throughput is test-image-grade; at scale the actor-pool decode
# stage amortizes across images and a native codec can be plugged in via
# decode_fn without touching the pipeline.


def _zigzag_pairs():
    # standard JPEG zigzag: anti-diagonals, alternating direction
    return sorted(
        ((r, c) for r in range(8) for c in range(8)),
        key=lambda p: (p[0] + p[1], p[0] if (p[0] + p[1]) % 2 else -p[0]),
    )


_ZZ_ROWS = np.array([p[0] for p in _zigzag_pairs()])
_ZZ_COLS = np.array([p[1] for p in _zigzag_pairs()])


def _dct_mat() -> np.ndarray:
    k = np.arange(8, dtype=np.float64)[:, None]
    n = np.arange(8, dtype=np.float64)[None, :]
    m = np.cos((2 * n + 1) * k * np.pi / 16) * 0.5
    m[0] /= np.sqrt(2.0)
    return m


_DCT = _dct_mat()


def _huff_map(bits: list[int], vals: list[int]) -> dict:
    """Canonical JPEG Huffman table: BITS/HUFFVAL → {(length, code): symbol}."""
    out, code, i = {}, 0, 0
    for ln in range(1, 17):
        for _ in range(bits[ln - 1]):
            out[(ln, code)] = vals[i]
            i += 1
            code += 1
        code <<= 1
    return out


class _BitReader:
    def __init__(self, data: bytes):
        self.bits = np.unpackbits(np.frombuffer(data, np.uint8))
        self.pos = 0

    def read(self, k: int) -> int:
        if k == 0:
            return 0
        if self.pos + k > len(self.bits):
            raise ValueError("jpeg: bitstream exhausted")
        v = 0
        for b in self.bits[self.pos:self.pos + k]:
            v = (v << 1) | int(b)
        self.pos += k
        return v

    def read_huff(self, table: dict) -> int:
        code = 0
        bits = self.bits
        pos = self.pos
        end = len(bits)
        for ln in range(1, 17):
            if pos >= end:
                raise ValueError("jpeg: bitstream exhausted in huffman code")
            code = (code << 1) | int(bits[pos])
            pos += 1
            sym = table.get((ln, code))
            if sym is not None:
                self.pos = pos
                return sym
        raise ValueError("jpeg: invalid huffman code")


def _extend(v: int, s: int) -> int:
    return v if v >= (1 << (s - 1)) else v - (1 << s) + 1


def _entropy_segments(b: bytes, i: int):
    """Destuffed entropy-coded bytes from offset i, split at RSTn markers;
    returns (segments, index-of-terminating-marker)."""
    segs, cur = [], bytearray()
    n = len(b)
    while i < n:
        x = b[i]
        if x != 0xFF:
            cur.append(x)
            i += 1
            continue
        m = b[i + 1] if i + 1 < n else 0xD9
        if m == 0x00:
            cur.append(0xFF)
            i += 2
        elif 0xD0 <= m <= 0xD7:
            segs.append(bytes(cur))
            cur = bytearray()
            i += 2
        else:
            break
    segs.append(bytes(cur))
    return segs, i


def _decode_block(br: _BitReader, dc_tab: dict, ac_tab: dict,
                  pred: int) -> tuple[np.ndarray, int]:
    coefs = np.zeros(64, np.int32)
    s = br.read_huff(dc_tab)
    pred += _extend(br.read(s), s) if s else 0
    coefs[0] = pred
    i = 1
    while i < 64:
        rs = br.read_huff(ac_tab)
        r, s = rs >> 4, rs & 15
        if s == 0:
            if r == 15:  # ZRL: sixteen zeros
                i += 16
                continue
            break  # EOB
        i += r
        if i > 63:
            raise ValueError("jpeg: AC coefficient index overflow")
        coefs[i] = _extend(br.read(s), s)
        i += 1
    return coefs, pred


def decode_jpeg(b: bytes) -> np.ndarray:
    """Baseline JPEG bytes → (H, W, 3) uint8 RGB (grayscale replicated)."""
    if b[:2] != b"\xff\xd8":
        raise ValueError("jpeg: missing SOI")
    qt: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], dict] = {}
    comps: list[dict] = []
    h = w = 0
    dri = 0
    scan = None
    i = 2
    while i < len(b) - 1:
        if b[i] != 0xFF:
            raise ValueError("jpeg: expected marker")
        m = b[i + 1]
        i += 2
        if m in (0x01, 0xD8) or 0xD0 <= m <= 0xD7:
            continue
        if m == 0xD9:
            break
        seg_len = struct.unpack(">H", b[i:i + 2])[0]
        seg = b[i + 2:i + seg_len]
        i += seg_len
        if m == 0xDB:  # DQT
            p = 0
            while p < len(seg):
                pq, tq = seg[p] >> 4, seg[p] & 15
                p += 1
                if pq:
                    qt[tq] = np.frombuffer(seg[p:p + 128], ">u2").astype(np.int32)
                    p += 128
                else:
                    qt[tq] = np.frombuffer(seg[p:p + 64], np.uint8).astype(np.int32)
                    p += 64
        elif m == 0xC4:  # DHT
            p = 0
            while p < len(seg):
                tc, th = seg[p] >> 4, seg[p] & 15
                p += 1
                bits = list(seg[p:p + 16])
                p += 16
                nv = sum(bits)
                huff[(tc, th)] = _huff_map(bits, list(seg[p:p + nv]))
                p += nv
        elif m == 0xC0:  # SOF0 baseline
            if seg[0] != 8:
                raise ValueError("jpeg: only 8-bit precision supported")
            h, w = struct.unpack(">HH", seg[1:5])
            nc = seg[5]
            comps = [{"id": seg[6 + 3 * c], "h": seg[7 + 3 * c] >> 4,
                      "v": seg[7 + 3 * c] & 15, "tq": seg[8 + 3 * c]}
                     for c in range(nc)]
        elif m in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7,
                   0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise ValueError("jpeg: only baseline sequential (SOF0) supported")
        elif m == 0xDD:  # DRI
            dri = struct.unpack(">H", seg[:2])[0]
        elif m == 0xDA:  # SOS — single-scan baseline: decode and stop
            ns = seg[0]
            tabs = {}
            for c in range(ns):
                cid, tt = seg[1 + 2 * c], seg[2 + 2 * c]
                tabs[cid] = (tt >> 4, tt & 15)
            segments, i = _entropy_segments(b, i)
            scan = (tabs, segments)
            # skip to EOI scan loop end: remaining markers (EOI) exit above
        else:
            pass  # APPn / COM
    if not comps or scan is None:
        raise ValueError("jpeg: missing SOF0/SOS")
    tabs, segments = scan
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    store = {}
    for c in comps:
        bw, bh = mcux * c["h"], mcuy * c["v"]
        store[c["id"]] = np.zeros((bh * bw, 64), np.int32)
    preds = {c["id"]: 0 for c in comps}
    seg_ix = 0
    br = _BitReader(segments[0])
    for mcu in range(mcux * mcuy):
        if dri and mcu and mcu % dri == 0:
            seg_ix += 1
            br = _BitReader(segments[seg_ix])
            preds = {c["id"]: 0 for c in comps}
        row, col = divmod(mcu, mcux)
        for c in comps:
            td, ta = tabs[c["id"]]
            dc_tab, ac_tab = huff[(0, td)], huff[(1, ta)]
            bw = mcux * c["h"]
            for by in range(c["v"]):
                for bx in range(c["h"]):
                    coefs, preds[c["id"]] = _decode_block(
                        br, dc_tab, ac_tab, preds[c["id"]])
                    store[c["id"]][(row * c["v"] + by) * bw
                                   + col * c["h"] + bx] = coefs
    planes = []
    for c in comps:
        bw, bh = mcux * c["h"], mcuy * c["v"]
        dq = store[c["id"]].astype(np.float64) * qt[c["tq"]][None, :]
        blocks = np.zeros((bh * bw, 8, 8), np.float64)
        blocks[:, _ZZ_ROWS, _ZZ_COLS] = dq
        pix = np.einsum("ij,njk,kl->nil", _DCT.T, blocks, _DCT) + 128.0
        plane = (pix.reshape(bh, bw, 8, 8).transpose(0, 2, 1, 3)
                 .reshape(bh * 8, bw * 8))
        plane = np.repeat(np.repeat(plane, vmax // c["v"], axis=0),
                          hmax // c["h"], axis=1)
        planes.append(plane[:h, :w])
    if len(planes) == 1:
        g = np.clip(np.round(planes[0]), 0, 255).astype(np.uint8)
        return np.stack([g, g, g], axis=-1)
    y, cb, cr = planes[0], planes[1] - 128.0, planes[2] - 128.0
    rgb = np.stack([
        y + 1.402 * cr,
        y - 0.344136 * cb - 0.714136 * cr,
        y + 1.772 * cb,
    ], axis=-1)
    return np.clip(np.round(rgb), 0, 255).astype(np.uint8)


class _BitWriter:
    def __init__(self):
        self.buf = bytearray()
        self.acc = 0
        self.n = 0

    def write(self, val: int, k: int) -> None:
        if k == 0:
            return
        self.acc = (self.acc << k) | (val & ((1 << k) - 1))
        self.n += k
        while self.n >= 8:
            self.n -= 8
            byte = (self.acc >> self.n) & 0xFF
            self.buf.append(byte)
            if byte == 0xFF:  # byte stuffing
                self.buf.append(0x00)
        self.acc &= (1 << self.n) - 1

    def flush(self) -> None:
        if self.n:
            pad = 8 - self.n
            byte = ((self.acc << pad) | ((1 << pad) - 1)) & 0xFF
            self.buf.append(byte)
            if byte == 0xFF:
                self.buf.append(0x00)
            self.acc = self.n = 0


# fixed canonical tables for the test encoder (the DECODER reads whatever
# DHT the file carries — these are just simple valid tables the encoder
# writes): 12 DC categories at 4 bits, all 162 AC symbols at 8 bits.
_ENC_DC_BITS = [0, 0, 0, 12] + [0] * 12
_ENC_DC_VALS = list(range(12))
_ENC_AC_BITS = [0] * 7 + [162] + [0] * 8
_ENC_AC_VALS = [0x00, 0xF0] + [(r << 4) | s for r in range(16)
                               for s in range(1, 11)]


def _enc_codes(bits, vals):
    m = _huff_map(bits, vals)
    return {sym: (ln, code) for (ln, code), sym in m.items()}


def _cat(v: int) -> int:
    return int(v).bit_length() if v > 0 else int(-v).bit_length()


def _write_coded(bwr, v: int, s: int) -> None:
    bwr.write(v if v >= 0 else v + (1 << s) - 1, s)


def encode_jpeg(img: np.ndarray, *, quant: int = 8,
                subsample: bool = False, restart: int = 0) -> bytes:
    """(H, W) grayscale or (H, W, 3) RGB uint8 → baseline JPEG bytes.

    Fixture-grade encoder (flat quantization table of step ``quant``,
    simple fixed Huffman tables written to DHT; ``subsample=True`` emits
    4:2:0 chroma; ``restart`` > 0 emits DRI + RSTn every that many MCUs).
    Exists so tests can generate JPEG inputs — the decoder above makes no
    assumptions shared with it beyond the JPEG standard."""
    img = np.asarray(img)
    gray = img.ndim == 2
    if not gray and (img.ndim != 3 or img.shape[2] != 3):
        raise ValueError("encode_jpeg expects (H, W) or (H, W, 3) uint8")
    h, w = img.shape[:2]
    if gray:
        planes = [img.astype(np.float64)]
        samp = [(1, 1)]
    else:
        r, g, bl = (img[..., k].astype(np.float64) for k in range(3))
        y = 0.299 * r + 0.587 * g + 0.114 * bl
        cb = 128.0 - 0.168736 * r - 0.331264 * g + 0.5 * bl
        cr = 128.0 + 0.5 * r - 0.418688 * g - 0.081312 * bl
        if subsample:
            he, we = h + (h % 2), w + (w % 2)

            def half(p):
                q = np.pad(p, ((0, he - h), (0, we - w)), mode="edge")
                return (q.reshape(he // 2, 2, we // 2, 2).mean(axis=(1, 3)))

            planes = [y, half(cb), half(cr)]
            samp = [(2, 2), (1, 1), (1, 1)]
        else:
            planes = [y, cb, cr]
            samp = [(1, 1), (1, 1), (1, 1)]
    hmax = max(s[0] for s in samp)
    vmax = max(s[1] for s in samp)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    qtab = np.full(64, quant, np.int32)
    qtab[0] = max(1, quant // 2)  # finer DC step
    dc_codes = _enc_codes(_ENC_DC_BITS, _ENC_DC_VALS)
    ac_codes = _enc_codes(_ENC_AC_BITS, _ENC_AC_VALS)
    # per-plane quantized zigzag coefficients, blocks in (row, col) grid
    coef = []
    for p, (sh, sv) in zip(planes, samp):
        bh, bw = mcuy * sv, mcux * sh
        q = np.pad(p, ((0, bh * 8 - p.shape[0]), (0, bw * 8 - p.shape[1])),
                   mode="edge") - 128.0
        blocks = (q.reshape(bh, 8, bw, 8).transpose(0, 2, 1, 3)
                  .reshape(bh * bw, 8, 8))
        dct = np.einsum("ij,njk,kl->nil", _DCT, blocks, _DCT.T)
        zz = dct[:, _ZZ_ROWS, _ZZ_COLS]
        coef.append(np.round(zz / qtab[None, :]).astype(np.int32))
    bwr = _BitWriter()
    chunks: list[bytes] = []
    preds = [0] * len(planes)
    for mcu in range(mcux * mcuy):
        if restart and mcu and mcu % restart == 0:
            bwr.flush()
            chunks.append(bytes(bwr.buf))
            bwr = _BitWriter()
            preds = [0] * len(planes)
        row, col = divmod(mcu, mcux)
        for ci, (sh, sv) in enumerate(samp):
            bw = mcux * sh
            for by in range(sv):
                for bx in range(sh):
                    cz = coef[ci][(row * sv + by) * bw + col * sh + bx]
                    diff = int(cz[0]) - preds[ci]
                    preds[ci] = int(cz[0])
                    s = _cat(diff)
                    ln, code = dc_codes[s]
                    bwr.write(code, ln)
                    _write_coded(bwr, diff, s)
                    nz = np.flatnonzero(cz[1:]) + 1
                    prev = 0
                    for ix in nz:
                        run = int(ix) - prev - 1
                        while run >= 16:
                            ln, code = ac_codes[0xF0]
                            bwr.write(code, ln)
                            run -= 16
                        v = int(cz[ix])
                        s = _cat(v)
                        ln, code = ac_codes[(run << 4) | s]
                        bwr.write(code, ln)
                        _write_coded(bwr, v, s)
                        prev = int(ix)
                    if prev < 63:
                        ln, code = ac_codes[0x00]  # EOB
                        bwr.write(code, ln)
    bwr.flush()
    chunks.append(bytes(bwr.buf))
    entropy = bytearray(chunks[0])
    for ix, ch in enumerate(chunks[1:]):
        entropy += bytes([0xFF, 0xD0 + (ix % 8)]) + ch
    out = bytearray(b"\xff\xd8")
    dqt = bytes([0x00]) + bytes(int(x) for x in qtab)
    out += b"\xff\xdb" + struct.pack(">H", 2 + len(dqt)) + dqt
    if restart:
        out += b"\xff\xdd" + struct.pack(">HH", 4, restart)
    nc = len(planes)
    sof = struct.pack(">BHHB", 8, h, w, nc)
    for ci, (sh, sv) in enumerate(samp):
        sof += bytes([ci + 1, (sh << 4) | sv, 0])
    out += b"\xff\xc0" + struct.pack(">H", 2 + len(sof)) + sof
    for tc, bits, vals in ((0, _ENC_DC_BITS, _ENC_DC_VALS),
                           (1, _ENC_AC_BITS, _ENC_AC_VALS)):
        dht = bytes([tc << 4]) + bytes(bits) + bytes(vals)
        out += b"\xff\xc4" + struct.pack(">H", 2 + len(dht)) + dht
    sos = bytes([nc]) + b"".join(bytes([ci + 1, 0x00]) for ci in range(nc)) \
        + b"\x00\x3f\x00"
    out += b"\xff\xda" + struct.pack(">H", 2 + len(sos)) + sos
    out += bytes(entropy) + b"\xff\xd9"
    return bytes(out)


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
    if payload[:3] == b"\xff\xd8\xff":
        return "image/jpeg"
    if payload[:4] == b"RIFF" and payload[8:12] == b"WAVE":
        return "audio/wav"
    return None


def decode_image(payload: bytes) -> np.ndarray:
    """PPM, BMP, PNG or baseline JPEG bytes → (H, W, 3) uint8 (magic-byte
    dispatch)."""
    if payload[:2] == b"P6":
        return decode_ppm(payload)
    if payload[:2] == b"BM":
        return decode_bmp(payload)
    if payload[:8] == _PNG_SIG:
        return decode_png(payload)
    if payload[:3] == b"\xff\xd8\xff":
        return decode_jpeg(payload)
    raise ValueError(
        "unknown image format (supported here: PPM P6, 24-bit BMP, 8-bit "
        "PNG, baseline JPEG)"
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
