"""Codec round-trips, PSNR gate, phash stability (input_hint invariants)."""

from __future__ import annotations

import numpy as np
import pytest

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


def test_real_jpeg_roundtrip_psnr_over_40db():
    """VERDICT r2 task 8: the PSNR≥40dB input_hint gate exercised
    against a REAL lossy transform codec (baseline JFIF, Annex-K
    tables), not only the deterministic stand-in."""
    from crawler_spark import jpeg as J

    for k, w, h in ((0, 64, 48), (5, 96, 64), (9, 100, 77)):
        px = I.gen_pixels(42, k, w, h)
        data = J.encode_jpeg(px, quality=99)
        # real JFIF markers: SOI, JFIF APP0, baseline SOF0, EOI
        assert data[:2] == b"\xff\xd8" and data[-2:] == b"\xff\xd9"
        assert data[6:10] == b"JFIF"
        back = J.decode_jpeg(data)
        assert back.shape == px.shape
        p = I.psnr(back, px)
        assert p >= 40.0, f"PSNR {p} < 40dB for k={k}"
        assert p != float("inf"), "jpeg must be genuinely lossy"


def test_decode_image_magic_dispatch():
    """decode_image routes real JPEG / PNG / stand-in payloads by magic
    bytes regardless of the fmt column."""
    px = I.gen_pixels(42, 7, 64, 48)
    jpg = I.encode_image(px, "jpg")
    assert jpg[:2] == b"\xff\xd8"
    # fmt says 'jpeg' (the stand-in name) but bytes are real JFIF
    dec = I.decode_image(jpg, "jpeg")
    assert I.psnr(dec, px) >= 40.0
    assert np.array_equal(I.decode_image(I.encode_png(px), "whatever"), px)
    standin = I.decode_image(I.encode_lossy(px), "jpeg")
    assert I.psnr(standin, px) >= 40.0


def test_real_jpeg_phash_match_on_decoded():
    """Fixture convention: the stored phash is computed from DECODED
    pixels, so the verify gate's recompute matches bit-for-bit."""
    from crawler_spark import jpeg as J

    px = I.gen_pixels(42, 11, 96, 64)
    dec = J.decode_jpeg(J.encode_jpeg(px, quality=99))
    assert I.phash64(dec) == I.phash64(dec.copy())
    # and the decoded image stays perceptually close to the source
    d = bin((I.phash64(dec) ^ I.phash64(px)) & ((1 << 64) - 1)).count("1")
    assert d <= 4


def test_jpeg_restart_interval_roundtrip_and_bitreader_bound():
    """DRI/RSTn streams (what real encoders emit) decode identically to
    the plain stream, and the bit-reader accumulator stays <=8 bits —
    the unmasked version made decode O(scan^2), a de-facto hang on
    MB-sized web JPEGs."""
    from crawler_spark import jpeg as J

    px = I.gen_pixels(7, 2, 72, 48)
    plain = J.decode_jpeg(J.encode_jpeg(px, quality=95))
    for ri in (1, 5, 40):
        assert np.array_equal(
            J.decode_jpeg(J.encode_jpeg(px, quality=95, restart_interval=ri)), plain
        ), ri
    br = J._BitReader(J.encode_jpeg(px, quality=95)[200:])
    for _ in range(5000):
        try:
            br.read_bit()
        except ValueError:
            break
        assert br.acc.bit_length() <= 8


def test_jpeg_malformed_streams_raise_value_error():
    """Truncation (incl. a lone trailing FF) and garbage are
    ValueError, never IndexError/struct.error — callers map ValueError
    to decode_ok=False rows."""
    from crawler_spark import jpeg as J

    b = J.encode_jpeg(I.gen_pixels(7, 3, 24, 24))
    for bad in (b[: len(b) // 2] + b"\xff", b[:20], b"\xff\xd8\xff"):
        with pytest.raises(ValueError):
            J.decode_jpeg(bad)
    # spec-legal FF fill bytes before a marker are tolerated
    assert b[2:4] == b"\xff\xe0"
    filled = b[:2] + b"\xff\xff" + b[2:]
    assert np.array_equal(J.decode_jpeg(filled), J.decode_jpeg(b))


def _png_with_filters(px_arr, ctype, filters):
    """Independent PNG writer (filters computed forward) for decoder tests."""
    import struct as _s
    import zlib as _z

    h, w = px_arr.shape[:2]
    nch = px_arr.shape[2] if px_arr.ndim == 3 else 1
    arr = px_arr.reshape(h, w * nch).astype(np.int32)
    lines, prev = [], np.zeros(w * nch, dtype=np.int32)
    for y in range(h):
        f = filters[y % len(filters)]
        cur = arr[y]
        if f == 0:
            filt = cur
        elif f == 1:
            filt = cur.copy()
            filt[nch:] = (cur[nch:] - cur[:-nch]) % 256
        elif f == 2:
            filt = (cur - prev) % 256
        elif f == 3:
            left = np.concatenate([np.zeros(nch, np.int32), cur[:-nch]])
            filt = (cur - ((left + prev) >> 1)) % 256
        else:
            filt = np.empty_like(cur)
            for i in range(w * nch):
                a = cur[i - nch] if i >= nch else 0
                b = int(prev[i])
                c = int(prev[i - nch]) if i >= nch else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if pa <= pb and pa <= pc else (b if pb <= pc else c)
                filt[i] = (cur[i] - pred) % 256
        lines.append(bytes([f]) + bytes(filt.astype(np.uint8)))
        prev = cur

    def chunk(tag, payload):
        return (
            _s.pack(">I", len(payload)) + tag + payload
            + _s.pack(">I", _z.crc32(tag + payload))
        )

    ihdr = _s.pack(">IIBBBBB", w, h, 8, ctype, 0, 0, 0)
    return (
        b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", _z.compress(b"".join(lines))) + chunk(b"IEND", b"")
    )


def test_decode_png_real_world_filters_and_color_types():
    """Foreign PNGs use filters 1-4 and RGBA/gray — the decoder must
    reconstruct them exactly (previously they were misclassified as
    corrupt); truncated palette/interlaced files fail as corrupt data,
    never mis-decode."""
    import struct as _s
    import zlib as _z

    px = I.gen_pixels(11, 1, 33, 17)
    for f in ([1], [2], [3], [4], [0, 1, 2, 3, 4]):
        assert np.array_equal(I.decode_png(_png_with_filters(px, 2, f)), px), f
    rgba = np.dstack([px, np.full(px.shape[:2], 200, np.uint8)])
    assert np.array_equal(I.decode_png(_png_with_filters(rgba, 6, [4, 2])), px)
    gray = px[..., 0]
    g3 = np.repeat(gray[..., None], 3, axis=-1)
    assert np.array_equal(I.decode_png(_png_with_filters(gray, 0, [1, 3])), g3)
    ga = np.dstack([gray, gray])
    assert np.array_equal(I.decode_png(_png_with_filters(ga, 4, [4])), g3)

    def hdr_only(ctype, interlace):
        ihdr = _s.pack(">IIBBBBB", 4, 4, 8, ctype, 0, 0, interlace)
        def chunk(tag, payload):
            return (
                _s.pack(">I", len(payload)) + tag + payload
                + _s.pack(">I", _z.crc32(tag + payload))
            )
        return b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr) + chunk(b"IEND", b"")

    # palette/Adam7 now DECODE (see test_decode_png_palette_and_adam7);
    # a header-only file of either kind is truncated DATA -> ValueError
    with pytest.raises(ValueError):
        I.decode_png(hdr_only(3, 0))  # palette, no PLTE/IDAT
    with pytest.raises(ValueError):
        I.decode_png(hdr_only(2, 1))  # Adam7, no IDAT


def test_decode_png_palette_and_adam7():
    """Palette (PLTE lookup) and Adam7-interlaced PNGs round-trip
    EXACTLY across odd dimensions (every pass-geometry edge case), and
    corrupt palette structure raises ValueError."""
    import struct as _s

    for w, h in [(32, 32), (17, 13), (8, 1), (1, 9), (3, 3), (7, 7)]:
        px = I.gen_pixels(42, 7, w, h)
        pq = (px // 64 * 64).astype(np.uint8)  # <=256 distinct colors
        assert np.array_equal(I.decode_png(I.encode_png_palette(pq)), pq), (w, h)
        assert np.array_equal(I.decode_png(I.encode_png_adam7(px)), px), (w, h)
    # palette index beyond PLTE: shrink the PLTE to one entry
    pq = (I.gen_pixels(42, 7, 8, 8) // 64 * 64).astype(np.uint8)
    data = I.encode_png_palette(pq)
    at = data.find(b"PLTE")
    n_plte = _s.unpack(">I", data[at - 4 : at])[0]
    assert n_plte > 3
    tail = data[at + 4 + n_plte + 4 :]  # chunks after PLTE's CRC
    shrunk = (
        data[: at - 4]
        + _s.pack(">I", 3)
        + b"PLTE"
        + data[at + 4 : at + 4 + 3]
        + b"\x00\x00\x00\x00"  # CRC placeholder (walker skips, not checks)
        + tail
    )
    with pytest.raises(ValueError, match="palette index|PLTE"):
        I.decode_png(shrunk)
    # PLTE length not a multiple of 3
    bad = (
        data[: at - 4]
        + _s.pack(">I", 4)
        + b"PLTE"
        + data[at + 4 : at + 4 + 4]
        + b"\x00\x00\x00\x00"
        + tail
    )
    with pytest.raises(ValueError, match="PLTE"):
        I.decode_png(bad)


def test_image_stats_flat_vs_noise(spark):
    """image_stats kernel invariants: a constant image has zero
    entropy/contrast and full flat share; deterministic noise has high
    entropy and low flat share; corrupt bytes report decode_ok=False."""
    from crawler_spark.functions.multimodal import image_stats

    flat = np.full((16, 16, 3), 128, dtype=np.uint8)
    noise = I.gen_pixels(seed=7, k=3, w=16, h=16)
    rows = [
        ("flat", bytearray(I.encode_png(flat)), 16, 16, "png"),
        ("noise", bytearray(I.encode_png(noise)), 16, 16, "png"),
        ("corrupt", bytearray(b"\x00\x01\x02"), 0, 0, "png"),
    ]
    df = spark.createDataFrame(
        rows, "image_id string, bytes binary, w int, h int, fmt string"
    )
    got = {r["image_id"]: r for r in image_stats(df).collect()}
    assert got["flat"]["entropy_cb"] == 0
    assert got["flat"]["contrast_cb"] == 0
    assert got["flat"]["flat_share_bp"] == 10_000
    assert got["noise"]["entropy_cb"] > 300
    assert got["noise"]["flat_share_bp"] < 2_000
    assert not got["corrupt"]["decode_ok"]
    assert got["corrupt"]["entropy_cb"] is None
