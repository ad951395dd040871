import numpy as np
import pytest

from pegasus_spark import codec


@pytest.mark.parametrize("w,h", [(8, 8), (17, 9), (64, 33)])
def test_png_roundtrip_lossless(w, h):
    rng = np.random.default_rng(1)
    px = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
    data = codec.png_encode(px)
    assert data[:8] == b"\x89PNG\r\n\x1a\n"
    out = codec.png_decode(data)
    assert np.array_equal(out, px)
    assert codec.psnr(out, px) == float("inf")


@pytest.mark.parametrize("w,h", [(8, 8), (31, 22), (64, 64)])
def test_qnt_psnr_bound(w, h):
    rng = np.random.default_rng(2)
    px = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
    out = codec.qnt_decode(codec.qnt_encode(px))
    assert out.shape == px.shape
    err = np.abs(out.astype(int) - px.astype(int)).max()
    assert err <= 2
    assert codec.psnr(out, px) >= 40.0


def test_encode_decode_dispatch():
    rng = np.random.default_rng(3)
    px = rng.integers(0, 256, size=(10, 12, 3), dtype=np.uint8)
    for fmt in ("png", "qnt"):
        out = codec.decode(codec.encode(px, fmt), fmt)
        assert codec.psnr(out, px) >= 40.0


def test_phash_stable_and_discriminative():
    rng = np.random.default_rng(4)
    a = rng.integers(0, 256, size=(16, 16, 3), dtype=np.uint8)
    b = 255 - a
    assert codec.phash(a) == codec.phash(a.copy())
    assert codec.phash(a) != codec.phash(b)
    assert isinstance(codec.phash(a), int)
    assert -(1 << 63) <= codec.phash(a) < (1 << 63)
