"""Image payload codecs, perceptual hash, PSNR — numpy + pandas UDFs.

The graft's result table carries image+caption pairs
(``image_id:string, bytes:binary, w:int32, h:int32, fmt:string,
caption:string, phash:int64`` — BASELINE.json ``input_hint``).  This
module implements:

- ``fmt='png'``  — a real, spec-conformant PNG codec.  Encode emits
  8-bit RGB filter-0 scanlines; decode additionally reconstructs
  filters 1-4 and gray/gray+alpha/RGBA color types (palette and Adam7
  are declared-unsupported, not mis-decoded).  Lossless round-trip.
- ``fmt='jpg'``  — REAL baseline JPEG (``crawler_spark.jpeg``: 2-D DCT,
  standard quantization/Huffman tables, JFIF container), pure numpy —
  no external JPEG library exists in this container.  Lossy; quality 99
  keeps PSNR ≥ the 40 dB gate.
- ``fmt='jpeg'`` (and any other tag) — fast deterministic lossy
  STAND-IN (uniform quantization step 4 + zlib, PSNR ≈ 47 dB): the
  crawl fixtures' hot path, where a pure-Python entropy coder would
  dominate the benchmark for no semantic gain.  ``decode_image``
  dispatches on magic bytes first, so genuine PNG/JFIF payloads decode
  with the real codecs regardless of the fmt column.
- ``phash64``    — 64-bit perceptual hash: 32×32 block-mean resize →
  grayscale → 2-D DCT-II (matrix form) → top-left 8×8 low-frequency
  block minus DC → median threshold.  Public aHash/pHash construction.
- ``psnr``       — peak signal-to-noise ratio vs reference pixels.

All distributed use is through vectorized pandas UDFs (Arrow batches);
no per-row Python UDFs (input_hint rule).
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

QUANT_STEP = 4  # lossy stand-in quantization step → PSNR ≈ 46.9 dB

_PNG_SIG = b"\x89PNG\r\n\x1a\n"
_LOSSY_MAGIC = b"LQT1"  # stand-in lossy format magic
# decode budget for untrusted headers: a corrupt/hostile width×height
# must not size a multi-GB allocation before any pixel data is checked
# (64 Mpx ≈ 4x an 8K frame — beyond any fixture or realistic crawl asset)
_MAX_PIXELS = 1 << 26


# ------------------------------------------------------------------ pixels
def gen_pixels(seed: int, k: int, w: int, h: int) -> np.ndarray:
    """Deterministic H×W×3 uint8 pixels for image index *k* (FIXTURES.md §1).

    Low-frequency structure (so phash is non-degenerate) + seeded noise.
    """
    rng = np.random.default_rng(np.uint64(seed) ^ np.uint64(k * 2654435761 + 1))
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float64)
    base = (
        127.5
        + 90.0 * np.sin(2 * np.pi * (xx / w) * (1 + k % 3))
        * np.cos(2 * np.pi * (yy / h) * (1 + k % 5))
    )
    img = np.stack([base, np.roll(base, k % 7, axis=1), np.flip(base, axis=0)], axis=-1)
    noise = rng.integers(-12, 13, size=(h, w, 3))
    return np.clip(img + noise, 0, 255).astype(np.uint8)


# ------------------------------------------------------------------ PNG
def _png_chunk(tag: bytes, payload: bytes) -> bytes:
    return (
        struct.pack(">I", len(payload))
        + tag
        + payload
        + struct.pack(">I", zlib.crc32(tag + payload) & 0xFFFFFFFF)
    )


def encode_png(pixels: np.ndarray) -> bytes:
    """Minimal real PNG: 8-bit RGB, filter 0 scanlines, single IDAT."""
    h, w, _ = pixels.shape
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    raw = b"".join(b"\x00" + pixels[y].tobytes() for y in range(h))
    return (
        _PNG_SIG
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(raw, 6))
        + _png_chunk(b"IEND", b"")
    )


def encode_png_palette(pixels: np.ndarray) -> bytes:
    """Real palette PNG (color type 3): PLTE of the image's distinct
    colors (must be <=256) + index scanlines.  Fixture-side twin of the
    palette decode path — crawls deliver palette PNGs constantly."""
    h, w, _ = pixels.shape
    flat = pixels.reshape(-1, 3)
    colors, idx = np.unique(flat, axis=0, return_inverse=True)
    if len(colors) > 256:
        raise ValueError(f"{len(colors)} distinct colors exceed a PLTE (256)")
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 3, 0, 0, 0)
    rows = idx.astype(np.uint8).reshape(h, w)
    raw = b"".join(b"\x00" + rows[y].tobytes() for y in range(h))
    return (
        _PNG_SIG
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"PLTE", colors.astype(np.uint8).tobytes())
        + _png_chunk(b"IDAT", zlib.compress(raw, 6))
        + _png_chunk(b"IEND", b"")
    )


def encode_png_adam7(pixels: np.ndarray) -> bytes:
    """Real Adam7-interlaced truecolor PNG (interlace method 1):
    filter-0 scanlines per pass — fixture-side twin of the interlaced
    decode path."""
    h, w, _ = pixels.shape
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 1)
    raw = b""
    for x0, y0, dx, dy in _ADAM7:
        sub = pixels[y0::dy, x0::dx, :]
        if sub.shape[0] == 0 or sub.shape[1] == 0:
            continue
        raw += b"".join(b"\x00" + sub[y].tobytes() for y in range(sub.shape[0]))
    return (
        _PNG_SIG
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(raw, 6))
        + _png_chunk(b"IEND", b"")
    )


def _unfilter_row(ftype: int, cur: np.ndarray, prev: np.ndarray, bpp: int) -> np.ndarray:
    """PNG filter reconstruction (types 0-4) on one scanline of raw
    bytes.  Up is fully vectorized; Sub/Average/Paeth scan along x
    (channel-vectorized) because each pixel depends on the previous
    reconstructed one."""
    if ftype == 0:
        return cur
    if ftype == 2:  # Up
        return (cur.astype(np.int32) + prev).astype(np.uint8)
    out = cur.astype(np.int32)
    n = len(cur)
    if ftype == 1:  # Sub
        for i in range(bpp, n):
            out[i] = (out[i] + out[i - bpp]) & 0xFF
    elif ftype == 3:  # Average
        for i in range(n):
            left = out[i - bpp] if i >= bpp else 0
            out[i] = (out[i] + ((left + int(prev[i])) >> 1)) & 0xFF
    elif ftype == 4:  # Paeth
        for i in range(n):
            a = out[i - bpp] if i >= bpp else 0
            b = int(prev[i])
            c = int(prev[i - bpp]) if i >= bpp else 0
            p = a + b - c
            pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
            pred = a if pa <= pb and pa <= pc else (b if pb <= pc else c)
            out[i] = (out[i] + pred) & 0xFF
    else:
        raise ValueError(f"bad PNG filter type {ftype}")
    return out.astype(np.uint8)


# Adam7 pass grid: (x_origin, y_origin, x_step, y_step) per pass
_ADAM7 = [
    (0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
    (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2),
]


def _unfilter_image(raw: bytes, w: int, h: int, nch: int, offset: int):
    """Reconstruct one (sub-)image of h scanlines starting at
    ``offset`` in the inflated stream -> ((h, w, nch) array, end)."""
    stride = 1 + w * nch
    if len(raw) < offset + h * stride:
        raise ValueError("truncated PNG pixel data")
    prev = np.zeros(w * nch, dtype=np.uint8)
    rows = []
    for y in range(h):
        line = raw[offset + y * stride : offset + (y + 1) * stride]
        cur = np.frombuffer(line[1:], dtype=np.uint8)
        prev = _unfilter_row(line[0], cur, prev, nch)
        rows.append(prev.reshape(w, nch))
    return np.stack(rows), offset + h * stride


def decode_png(data: bytes) -> np.ndarray:
    """(H, W, 3) uint8 RGB from PNG bytes.

    Accepts what real crawls deliver: 8-bit gray (0), RGB (2),
    palette (3, PLTE lookup), gray+alpha (4) and RGBA (6) color types,
    non-interlaced AND Adam7-interlaced, with ANY scanline filter
    (0-4 reconstruction); alpha is stripped, gray broadcast to RGB.
    Sub-8-bit depths raise NotImplementedError — declared unsupported
    rather than mis-decoded; corrupt data raises ValueError (callers
    map both to decode_ok=False rows)."""
    if data[:8] != _PNG_SIG:
        raise ValueError("not a PNG")
    pos, w, h = 8, 0, 0
    ctype, interlace = -1, 0
    idat, plte = b"", None
    while pos + 8 <= len(data):
        (ln,) = struct.unpack(">I", data[pos : pos + 4])
        tag = data[pos + 4 : pos + 8]
        payload = data[pos + 8 : pos + 8 + ln]
        if tag == b"IHDR":
            if len(payload) < 13:
                raise ValueError("truncated IHDR")
            w, h, bit, ctype, _comp, _filt, interlace = struct.unpack(
                ">IIBBBBB", payload[:13]
            )
            if bit != 8:
                raise NotImplementedError(f"PNG bit depth {bit} unsupported (8 only)")
            if ctype not in (0, 2, 3, 4, 6):
                raise ValueError(f"bad PNG color type {ctype}")
            if interlace not in (0, 1):
                raise ValueError(f"bad PNG interlace method {interlace}")
        elif tag == b"PLTE":
            if ln % 3 or ln == 0 or ln > 256 * 3:
                raise ValueError(f"bad PLTE length {ln}")
            plte = np.frombuffer(payload, dtype=np.uint8).reshape(-1, 3)
        elif tag == b"IDAT":
            idat += payload
        elif tag == b"IEND":
            break
        pos += 12 + ln
    if not (w and h and idat):
        raise ValueError("truncated PNG")
    if ctype not in (0, 2, 3, 4, 6):
        raise ValueError(f"bad PNG color type {ctype}")
    if ctype == 3 and plte is None:
        raise ValueError("palette PNG without a PLTE chunk")
    if w * h > _MAX_PIXELS:
        raise ValueError(f"PNG dimensions {w}x{h} beyond the decode budget")
    nch = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}[ctype]
    # exact inflated size the header implies (per-pass strides under
    # Adam7); cap inflate there (+1 row slack): corrupt/hostile IDAT
    # must not inflate unbounded, and a zlib stream error is corrupt
    # DATA (ValueError), not a crash
    if interlace:
        expect = sum(
            hp * (1 + wp * nch)
            for x0, y0, dx, dy in _ADAM7
            if (wp := (w - x0 + dx - 1) // dx) > 0
            and (hp := (h - y0 + dy - 1) // dy) > 0
        )
    else:
        expect = h * (1 + w * nch)
    try:
        raw = zlib.decompressobj().decompress(idat, expect + 1 + w * nch)
    except zlib.error as e:
        raise ValueError(f"bad PNG deflate stream: {e}") from None
    if interlace:
        px = np.zeros((h, w, nch), dtype=np.uint8)
        off = 0
        for x0, y0, dx, dy in _ADAM7:
            wp = (w - x0 + dx - 1) // dx
            hp = (h - y0 + dy - 1) // dy
            if wp <= 0 or hp <= 0:
                continue
            sub, off = _unfilter_image(raw, wp, hp, nch, off)
            px[y0::dy, x0::dx, :] = sub
    else:
        px, _ = _unfilter_image(raw, w, h, nch, 0)
    if ctype == 3:
        idx = px[..., 0]
        if int(idx.max(initial=0)) >= len(plte):
            raise ValueError("palette index beyond PLTE size")
        return plte[idx]
    if ctype == 2:
        return px
    if ctype == 6:
        return px[..., :3]
    gray = px[..., 0]
    return np.repeat(gray[..., None], 3, axis=-1)


# ------------------------------------------------------------------ lossy stand-in
def encode_lossy(pixels: np.ndarray) -> bytes:
    h, w, _ = pixels.shape
    q = (pixels.astype(np.uint16) // QUANT_STEP).astype(np.uint8)
    return (
        _LOSSY_MAGIC
        + struct.pack(">IIB", w, h, QUANT_STEP)
        + zlib.compress(q.tobytes(), 6)
    )


def decode_lossy(data: bytes) -> np.ndarray:
    # ValueError (not assert) on every corrupt-input shape: this runs
    # over untrusted crawled bytes under callers that catch ValueError
    if data[:4] != _LOSSY_MAGIC or len(data) < 13:
        raise ValueError("not a lossy stand-in payload")
    w, h, step = struct.unpack(">IIB", data[4:13])
    if step == 0:
        raise ValueError("bad lossy stand-in quant step 0")
    if w * h > _MAX_PIXELS:
        raise ValueError(f"lossy stand-in dimensions {w}x{h} beyond the decode budget")
    try:
        raw = zlib.decompressobj().decompress(data[13:], h * w * 3 + 3)
    except zlib.error as e:
        raise ValueError(f"bad lossy stand-in deflate stream: {e}") from None
    q = np.frombuffer(raw, dtype=np.uint8)
    if len(q) < h * w * 3:
        raise ValueError("truncated lossy stand-in pixel data")
    q = q[: h * w * 3].reshape(h, w, 3)
    return np.clip(q.astype(np.uint16) * step + step // 2, 0, 255).astype(np.uint8)


def encode_image(pixels: np.ndarray, fmt: str) -> bytes:
    """'png' → real PNG; 'jpg' → REAL baseline JPEG (crawler_spark.jpeg,
    quality 99 ≥ the 40 dB gate); anything else → the fast deterministic
    lossy stand-in (the crawl fixtures' hot path)."""
    if fmt == "png":
        return encode_png(pixels)
    if fmt == "jpg":
        from . import jpeg as J

        return J.encode_jpeg(pixels, quality=99)
    return encode_lossy(pixels)


def decode_image(data: bytes, fmt: str) -> np.ndarray:
    """Dispatch on MAGIC BYTES first (real payloads tell the truth —
    a genuine JFIF byte string decodes with the real JPEG decoder no
    matter what the fmt column claims), falling back to fmt."""
    if data[:8] == _PNG_SIG:
        return decode_png(data)
    if data[:2] == b"\xff\xd8":
        from . import jpeg as J

        return J.decode_jpeg(data)
    if data[:4] == _LOSSY_MAGIC:
        return decode_lossy(data)
    return decode_png(data) if fmt == "png" else decode_lossy(data)


# ------------------------------------------------------------------ phash / psnr
_DCT32 = None


def _dct_matrix(n: int) -> np.ndarray:
    k = np.arange(n)[:, None]
    i = np.arange(n)[None, :]
    m = np.cos(np.pi * (2 * i + 1) * k / (2 * n)) * np.sqrt(2.0 / n)
    m[0] /= np.sqrt(2.0)
    return m


def phash64(pixels: np.ndarray) -> int:
    """64-bit perceptual hash (signed int64, parquet-friendly)."""
    global _DCT32
    if _DCT32 is None:
        _DCT32 = _dct_matrix(32)
    gray = pixels.astype(np.float64) @ np.array([0.299, 0.587, 0.114])
    h, w = gray.shape
    # block-mean resize to 32x32 via index binning (any h, w)
    yi = (np.arange(32) * h) // 32
    xi = (np.arange(32) * w) // 32
    small = np.add.reduceat(np.add.reduceat(gray, yi, axis=0), xi, axis=1)
    cnt = np.outer(np.diff(np.append(yi, h)), np.diff(np.append(xi, w)))
    # upsampling (h or w < 32) yields zero-width bins; reduceat's value
    # for an empty slice is the single row at that index, so the right
    # divisor is 1 — without the clamp the 0-division NaNs the DCT and
    # every sub-32px image hashed to 0
    small = small / np.maximum(cnt, 1)
    dct = _DCT32 @ small @ _DCT32.T
    block = dct[:8, :8].flatten()
    vals = block[1:]  # drop DC
    med = np.median(vals)
    bits = np.concatenate([[False], vals > med])
    v = 0
    for b in bits:
        v = (v << 1) | int(b)
    return v - (1 << 64) if v >= (1 << 63) else v


def psnr(a: np.ndarray, b: np.ndarray) -> float:
    mse = float(np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2))
    if mse == 0.0:
        return float("inf")
    return 10.0 * np.log10(255.0 * 255.0 / mse)
