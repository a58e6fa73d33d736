"""Baseline JPEG codec (pure numpy decoder + fixture encoder).

The encoder and decoder share only the JPEG standard: the encoder writes
its own simple Huffman tables into DHT (the decoder builds whatever the
file carries), quantization error bounds the roundtrip, and unit checks
pin the standard tables (zigzag, DCT orthonormality) independently.
"""

import numpy as np
import pytest
import ray.data as rd

import ballet_ray.stages.codecs as cd
from ballet_ray.stages.multimodal import (
    featurize_media,
    resize_media,
    synthetic_image_table,
)


def _gradient(h, w):
    yy, xx = np.mgrid[0:h, 0:w]
    return np.stack([(xx * 255 / max(w - 1, 1)),
                     (yy * 255 / max(h - 1, 1)),
                     ((xx + yy) * 255 / max(h + w - 2, 1))],
                    axis=-1).astype(np.uint8)


def test_zigzag_is_the_standard_order():
    # first and last few entries of the JPEG Annex-F zigzag, flattened
    flat = cd._ZZ_ROWS * 8 + cd._ZZ_COLS
    assert list(flat[:10]) == [0, 1, 8, 16, 9, 2, 3, 10, 17, 24]
    assert list(flat[-4:]) == [47, 55, 62, 63]
    assert sorted(flat) == list(range(64))


def test_dct_matrix_orthonormal():
    assert np.allclose(cd._DCT @ cd._DCT.T, np.eye(8), atol=1e-12)


@pytest.mark.parametrize("sub", [False, True])
@pytest.mark.parametrize("restart", [0, 3])
def test_color_roundtrip_within_quant_error(sub, restart):
    img = _gradient(40, 56)
    b = cd.encode_jpeg(img, quant=4, subsample=sub, restart=restart)
    out = cd.decode_jpeg(b)
    assert out.shape == img.shape and out.dtype == np.uint8
    err = np.abs(out.astype(int) - img.astype(int))
    assert err.max() <= (8 if sub else 4)


def test_gray_flat_block_exact():
    g = np.full((16, 24), 130, np.uint8)
    out = cd.decode_jpeg(cd.encode_jpeg(g, quant=4))
    assert out.shape == (16, 24, 3)
    assert (out == 130).all()


def test_non_multiple_of_8_and_odd_dims():
    for h, w in [(9, 13), (17, 31), (8, 8), (1, 1)]:
        img = _gradient(h, w)
        out = cd.decode_jpeg(cd.encode_jpeg(img, quant=2))
        assert out.shape == (h, w, 3)
        assert np.abs(out.astype(int) - img.astype(int)).max() <= 4


def test_random_noise_roundtrip_bounded():
    rng = np.random.RandomState(3)
    img = rng.randint(0, 256, (24, 32, 3)).astype(np.uint8)
    out = cd.decode_jpeg(cd.encode_jpeg(img, quant=2))
    err = np.abs(out.astype(int) - img.astype(int))
    # noise is the worst case for DCT quantization; still tightly bounded
    # because the color transform is the only lossy step beyond quant=2
    assert err.mean() < 3 and err.max() < 24


def test_detect_mime_and_decode_image_dispatch():
    b = cd.encode_jpeg(_gradient(8, 8))
    assert cd.detect_mime(b) == "image/jpeg"
    assert cd.decode_image(b).shape == (8, 8, 3)


def test_malformed_jpeg_raises():
    with pytest.raises(ValueError):
        cd.decode_jpeg(b"\x00\x01\x02")
    good = cd.encode_jpeg(_gradient(8, 8))
    with pytest.raises(ValueError):
        cd.decode_jpeg(good[:20])  # truncated before SOS
    # progressive SOF2 is rejected, not mis-decoded
    bad = bytearray(good)
    ix = bad.find(b"\xff\xc0")
    bad[ix + 1] = 0xC2
    with pytest.raises(ValueError, match="baseline"):
        cd.decode_jpeg(bytes(bad))


def test_jpeg_through_featurize_and_resize(ray_session):
    t = synthetic_image_table(6, width=16, height=12, fmt="jpeg")
    feats = featurize_media(rd.from_arrow(t), out_dim=16, batch_size=3).to_pandas()
    assert len(feats) == 6 and all(len(f) == 16 for f in feats["media_feat"])
    small = resize_media(rd.from_arrow(t), width=8, height=6, batch_size=3).to_pandas()
    for p in small["payload"]:
        img = cd.decode_jpeg(bytes(p))
        assert img.shape == (6, 8, 3)
