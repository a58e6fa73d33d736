"""Perceptual image hashing + image near-dedup — the bridge between the
multimodal binary columns (``stages/multimodal.py`` / ``stages/codecs.py``)
and the banded dedup machinery (``stages/dedup.py`` /
``stages/streaming_dedup.py``).

Reference scope note: the reference engine (ballet v0.19.5) has no image
operators; this is part of the LLM-data-pipeline surface (image corpus
near-dedup à la DataComp / LAION dedup), built from public descriptions of
dHash/pHash (Krawetz' "kind of like that" dHash; pHash = low-frequency DCT
signs, Zauner 2010).

- :func:`dhash64` — 64-bit difference hash: area-mean downsample to 9×8
  grayscale, bit = "pixel brighter than its right neighbor". Robust to
  resizing, recompression, mild brightness/contrast shifts; NOT to crops
  or flips.
- :func:`phash64` — 64-bit DCT hash: 32×32 grayscale → 2-D DCT-II → the
  lowest 8×8 frequency block → bit = coefficient > median. Slightly more
  robust to local edits, ~4× the compute of dhash.
- :func:`image_hashes` — the decode→hash map stage (actor pool when the
  decoder is expensive; stateless task pool by default).
- :func:`image_near_dup_pairs` — batch pair finder: hashes +
  :func:`ballet_ray.stages.dedup.hamming_pairs` (banded pigeonhole
  buckets, vectorized popcount verify — never all-pairs).
- :func:`streaming_image_dedup` — append-only-ingest variant over the
  sharded Bloom index (``stages/streaming_dedup.py``): "have I ever
  ingested an image LIKE this one".

Everything is pure numpy — no image libraries; payloads decode through
``stages/codecs.py`` (PPM/BMP/PNG) or a caller-supplied ``decode_fn``.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

_U64 = np.uint64


# ---------------------------------------------------------------------------
# kernels
# ---------------------------------------------------------------------------


def _to_gray(img: np.ndarray) -> np.ndarray:
    """(h, w[, 3]) uint8 → float64 (h, w) luma (ITU-R 601 weights).

    Integer-weight form ``(299R + 587G + 114B) / 1000``: every product and
    sum is an exact float64 integer, so a gray-as-RGB pixel (R=G=B=v) maps
    to EXACTLY v — per-term float weights (0.299*v + …) leave ~1-ulp
    residue that can flip a hash bit between two exactly-equal cells."""
    a = np.asarray(img, dtype=np.float64)
    if a.ndim == 2:
        return a
    if a.ndim == 3 and a.shape[2] >= 3:
        return (a[..., 0] * 299 + a[..., 1] * 587 + a[..., 2] * 114) / 1000.0
    if a.ndim == 3 and a.shape[2] == 1:
        return a[..., 0]
    raise ValueError(f"expected (h,w) or (h,w,c) image, got shape {a.shape}")


def _box_resize(gray: np.ndarray, out_w: int, out_h: int) -> np.ndarray:
    """Area-mean downsample to (out_h, out_w): every source pixel lands in
    the output cell ``(floor(r*out_h/h), floor(c*out_w/w))`` and cells
    average their members — one bincount, no Python loop. Upsampling-side
    degenerate cells (smaller input than output) fall back to nearest."""
    h, w = gray.shape
    if h < out_h or w < out_w:
        # nearest-neighbor up/mixed-scale fallback (tiny inputs only)
        ri = (np.arange(out_h) * h // out_h).clip(0, h - 1)
        ci = (np.arange(out_w) * w // out_w).clip(0, w - 1)
        return gray[np.ix_(ri, ci)]
    rmap = (np.arange(h, dtype=np.int64) * out_h) // h
    cmap = (np.arange(w, dtype=np.int64) * out_w) // w
    cell = rmap[:, None] * out_w + cmap[None, :]
    flat = cell.ravel()
    sums = np.bincount(flat, weights=gray.ravel(), minlength=out_h * out_w)
    cnts = np.bincount(flat, minlength=out_h * out_w)
    return (sums / np.maximum(cnts, 1)).reshape(out_h, out_w)


_POW2_64 = (np.uint64(1) << np.arange(64, dtype=np.uint64))


def dhash64(img: np.ndarray) -> np.uint64:
    """64-bit difference hash: 9×8 area-mean grayscale, bit i*8+j =
    (cell[i, j] > cell[i, j+1]), packed little-endian."""
    g = _box_resize(_to_gray(img), 9, 8)
    bits = (g[:, :-1] > g[:, 1:]).ravel()
    return _U64(bits @ _POW2_64)


_DCT32 = None


def _dct_matrix(n: int = 32) -> np.ndarray:
    """Orthonormal DCT-II basis matrix (cached)."""
    global _DCT32
    if _DCT32 is None or _DCT32.shape[0] != n:
        k = np.arange(n, dtype=np.float64)
        m = np.cos(np.pi * (2 * k[None, :] + 1) * k[:, None] / (2 * n))
        m[0] *= 1 / np.sqrt(2)
        _DCT32 = m * np.sqrt(2.0 / n)
    return _DCT32


def phash64(img: np.ndarray) -> np.uint64:
    """64-bit DCT hash: 32×32 grayscale → DCT-II → lowest 8×8 block →
    bit = coefficient > median (median over the block excluding DC)."""
    g = _box_resize(_to_gray(img), 32, 32)
    c = _dct_matrix(32)
    block = (c @ g @ c.T)[:8, :8].ravel()
    med = np.median(block[1:])
    return _U64((block > med) @ _POW2_64)


# ---------------------------------------------------------------------------
# stages
# ---------------------------------------------------------------------------


class ImageHasher:
    """Decode → perceptual-hash map stage. Pass as a CLASS to
    ``map_batches(ImageHasher, fn_constructor_kwargs=..., concurrency=N)``
    when the decoder is expensive (setup once per actor); the default
    pure-numpy codecs are cheap enough for the task-based path."""

    def __init__(self, media_col: str = "payload", method: str = "dhash",
                 decode_fn=None, out_col: str = "img_hash"):
        if method not in ("dhash", "phash"):
            raise ValueError(f"unknown method {method!r} (dhash | phash)")
        if decode_fn is None:
            from ballet_ray.stages.codecs import decode_image

            decode_fn = decode_image
        self.decode = decode_fn
        self.hash = dhash64 if method == "dhash" else phash64
        self.media_col = media_col
        self.out_col = out_col

    def __call__(self, t: pa.Table) -> pa.Table:
        payloads = t.column(self.media_col).to_pylist()
        h = np.fromiter(
            (self.hash(self.decode(p)) for p in payloads),
            dtype=_U64, count=len(payloads),
        )
        return t.append_column(self.out_col, pa.array(h.astype(np.int64)))


def image_hashes(
    ds, *, media_col: str = "payload", method: str = "dhash",
    decode_fn=None, out_col: str = "img_hash",
    concurrency: int | None = None, batch_size: int = 64,
):
    """Append a 64-bit perceptual hash column to an image table.

    ``concurrency=None`` (default) runs task-based — the pure-numpy hash
    kernels need no per-actor setup, and a fixed pool can starve an
    upstream shuffle on a small cluster (same rationale as
    ``minhash_lsh_pairs``). Pass an int when ``decode_fn`` is expensive to
    construct or the decode itself should be rate-limited; small
    ``batch_size`` keeps decoded frames (h×w×3 float) from accumulating in
    a worker's heap."""
    kw = dict(media_col=media_col, method=method, decode_fn=decode_fn, out_col=out_col)
    if concurrency is None:
        return ds.map_batches(
            lambda t, _kw=kw: ImageHasher(**_kw)(t),
            batch_format="pyarrow", batch_size=batch_size,
        )
    return ds.map_batches(
        ImageHasher, fn_constructor_kwargs=kw, batch_format="pyarrow",
        batch_size=batch_size, concurrency=concurrency,
    )


def image_near_dup_pairs(
    ds, *, id_col: str = "doc_id", media_col: str = "payload",
    method: str = "dhash", decode_fn=None, max_hamming: int = 6,
    bands: int = 8, max_bucket: int = 5000,
    concurrency: int | None = None, batch_size: int = 64,
):
    """Near-duplicate image pairs: resized / recompressed / mildly edited
    copies land within a few dhash/phash bits of each other; bucket by
    ``bands`` equal bit bands of the hash and popcount-verify within
    buckets (:func:`~ballet_ray.stages.dedup.hamming_pairs` — recall is
    EXACT for ``max_hamming <= bands - 1``, never all-pairs). Payloads are
    shed right after hashing: only (id, uint64) enters the shuffle.

    Output: (id_a, id_b, hamming)."""
    signed = image_hashes(
        ds.select_columns([id_col, media_col]), media_col=media_col,
        method=method, decode_fn=decode_fn, concurrency=concurrency,
        batch_size=batch_size,
    ).select_columns([id_col, "img_hash"])
    from ballet_ray.stages.dedup import hamming_pairs

    return hamming_pairs(
        signed, id_col=id_col, hash_col="img_hash",
        max_hamming=max_hamming, max_bucket=max_bucket, bands=bands,
    )


def streaming_image_dedup(
    ds, *, handles: list, media_col: str = "payload",
    method: str = "dhash", decode_fn=None, bands: int = 2,
    batch_size: int = 64,
):
    """Online image near-dedup over the sharded Bloom index
    (``stages/streaming_dedup.py`` — same semantics as the MinHash /
    embedding variants: chain-transitive, over-removal-only under races,
    state persists across datasets/runs via the shared ``handles``).

    Each image's perceptual hash splits into ``bands`` equal bit bands;
    each band segment folds with its band index into ONE uint64 key and an
    image survives iff ALL its band keys were fresh. ``bands=2`` (32-bit
    segments) is the scale-safe default: a prior image sharing either
    32-bit half triggers a drop — guaranteed for Hamming distance <= 1,
    ~87% for distance 4 — while a random pair collides per band at 2^-32,
    so the index stays usable at billions of images. Raising ``bands``
    raises recall for larger distances but SHRINKS the per-band key space
    (16-bit segments at ``bands=4`` saturate past ~10^4 distinct images:
    every possible band value gets taken and unique images start dropping
    — the bits-vs-index-size trade documented in
    :func:`~ballet_ray.stages.streaming_dedup.streaming_embedding_dedup`).

    Exactly-one-execution contract applies (module docstring of
    ``streaming_dedup``): place this stage immediately before the one
    consuming write."""
    from ballet_ray.functions.hashing import mix
    from ballet_ray.stages.streaming_dedup import _NO_RETRY

    if 64 % bands:
        raise ValueError("bands must divide 64")
    width = 64 // bands
    band_mask = _U64((1 << width) - 1)
    n_shards = len(handles)
    band_salt = np.array([0x1A6E ^ (b * 0xC2B2) for b in range(bands)], dtype=_U64)
    kw = dict(media_col=media_col, method=method, decode_fn=decode_fn)

    import ray

    def pass_batch(t: pa.Table) -> pa.Table:
        n = len(t)
        if n == 0:
            return t
        sig = (
            ImageHasher(**kw)(t)
            .column("img_hash")
            .to_numpy(zero_copy_only=False)
            .astype(_U64)
        )
        keys = np.empty((bands, n), dtype=_U64)
        for b in range(bands):
            seg = (sig >> _U64(width * b)) & band_mask
            keys[b] = mix(seg, band_salt[b])
        flatk = keys.ravel()
        doc_idx = np.tile(np.arange(n), bands)
        shard = (flatk % _U64(n_shards)).astype(np.int64)
        fresh = np.zeros(len(flatk), dtype=bool)
        futs, idxs = [], []
        for s in range(n_shards):
            sel = np.flatnonzero(shard == s)
            if len(sel):
                futs.append(handles[s].check_and_add.remote(flatk[sel]))
                idxs.append(sel)
        for sel, f in zip(idxs, ray.get(futs)):
            fresh[sel] = f
        stale_per_doc = np.bincount(doc_idx, weights=~fresh, minlength=n)
        return t.filter(pa.array(stale_per_doc == 0))

    return ds.map_batches(
        pass_batch, batch_format="pyarrow", batch_size=batch_size, **_NO_RETRY
    )
