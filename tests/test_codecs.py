"""Codec invariants: PNG lossless roundtrip; lossy codec PSNR >= 40 dB
(the BASELINE.json input_hint per-row invariant)."""

import numpy as np
import pytest

from gtfs_osm_sync_spark.functions.codecs import (
    decode_image,
    encode_image,
    png_decode,
    png_encode,
    psnr,
)


def _img(seed: int, h: int = 16, w: int = 24) -> np.ndarray:
    rng = np.random.Generator(np.random.PCG64(seed))
    return rng.integers(0, 256, size=(h, w, 3), dtype=np.uint16).astype(np.uint8)


def test_png_roundtrip_exact():
    for seed in range(5):
        img = _img(seed, h=8 + seed, w=9 + 2 * seed)
        out = png_decode(png_encode(img))
        assert np.array_equal(out, img)


def test_png_signature_and_chunks():
    data = png_encode(_img(1))
    assert data[:8] == b"\x89PNG\r\n\x1a\n"
    assert b"IHDR" in data[:33] and data.endswith(
        b"IEND" + data[-4:]
    )  # IEND chunk present


def test_lossy_roundtrip_psnr():
    for seed in range(5):
        img = _img(seed + 100)
        dec = decode_image(encode_image(img, "jpeg"), "jpeg")
        assert dec.shape == img.shape
        p = psnr(img, dec)
        assert p >= 40.0, f"lossy codec PSNR {p} < 40 dB"
        assert int(np.abs(dec.astype(int) - img.astype(int)).max()) <= 2


def test_lossy_deterministic():
    img = _img(7)
    assert encode_image(img, "jpeg") == encode_image(img, "jpeg")


def test_unknown_fmt_raises():
    with pytest.raises(NotImplementedError):
        encode_image(_img(1), "webp")


def test_psnr_identical_inf():
    img = _img(3)
    assert psnr(img, img) == float("inf")
