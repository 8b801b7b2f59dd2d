"""Codec round-trips, PSNR gate, phash stability (input_hint invariants)."""

from __future__ import annotations

import numpy as np

from crawler_spark import images as I


def test_png_roundtrip_lossless():
    px = I.gen_pixels(42, 7, 64, 48)
    data = I.encode_png(px)
    assert data[:8] == b"\x89PNG\r\n\x1a\n"
    back = I.decode_png(data)
    assert np.array_equal(px, back)
    assert I.psnr(px, back) == float("inf")


def test_lossy_roundtrip_psnr_over_40db():
    for k in (0, 4, 8):
        px = I.gen_pixels(42, k, 96, 64)
        back = I.decode_lossy(I.encode_lossy(px))
        p = I.psnr(px, back)
        assert p >= 40.0, f"PSNR {p} < 40dB for k={k}"


def test_phash_deterministic_and_discriminative():
    a1 = I.phash64(I.gen_pixels(42, 1, 64, 48))
    a2 = I.phash64(I.gen_pixels(42, 1, 64, 48))
    b = I.phash64(I.gen_pixels(42, 2, 64, 48))
    assert a1 == a2
    assert a1 != b
    assert -(2**63) <= a1 < 2**63


def test_phash_robust_to_lossy():
    px = I.gen_pixels(42, 12, 96, 64)
    ph = I.phash64(px)
    ph_lossy = I.phash64(I.decode_lossy(I.encode_lossy(px)))
    # hamming distance small under mild quantization
    assert bin((ph ^ ph_lossy) & ((1 << 64) - 1)).count("1") <= 4


def test_gen_pixels_deterministic():
    assert np.array_equal(I.gen_pixels(42, 3, 32, 32), I.gen_pixels(42, 3, 32, 32))
    assert not np.array_equal(I.gen_pixels(42, 3, 32, 32), I.gen_pixels(43, 3, 32, 32))
