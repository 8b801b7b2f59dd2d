"""Minimal real baseline JPEG codec (pure numpy + Python bit I/O).

Spec-conformant ITU-T T.81 baseline sequential DCT, 8-bit, YCbCr,
4:4:4 (no chroma subsampling), standard Annex-K quantization and
Huffman tables.  Output decodes in any stock viewer/library; input
accepts any baseline 4:4:4 JPEG using one quant/Huffman table pair per
component class, including DRI/RSTn restart intervals and marker fill
bytes (real encoders emit both).  The decoder's bit accumulator is
masked per read, so decode is O(scan bytes); corrupt/truncated streams
raise ValueError (callers map that to decode_ok=False rows).

Purpose (VERDICT round-2 task 8): the per-row PSNR≥40dB invariant gate
(BASELINE.json ``input_hint``) should be exercised against a REAL
lossy transform codec, not only the repo's deterministic quantization
stand-in.  This is a test/verification codec: encode is vectorized
numpy except the entropy coder; decode's Huffman stage is a Python
bit-reader — fast enough for test corpora, deliberately NOT wired into
the crawl fixtures' hot path (images.py keeps the zlib stand-in
there; ``images.decode_image`` dispatches on magic bytes so real JPEG
payloads decode transparently wherever they appear).

No reference-repo lineage: the reference (e8kor/crawler) has no image
code at all; tables and layout follow the public JPEG standard.
"""

from __future__ import annotations

import struct

import numpy as np

# ---------------------------------------------------------------- tables
# Annex K.1/K.2 base quantization tables (luminance, chrominance)
QT_LUM = np.array(
    [
        16, 11, 10, 16, 24, 40, 51, 61,
        12, 12, 14, 19, 26, 58, 60, 55,
        14, 13, 16, 24, 40, 57, 69, 56,
        14, 17, 22, 29, 51, 87, 80, 62,
        18, 22, 37, 56, 68, 109, 103, 77,
        24, 35, 55, 64, 81, 104, 113, 92,
        49, 64, 78, 87, 103, 121, 120, 101,
        72, 92, 95, 98, 112, 100, 103, 99,
    ],
    dtype=np.int32,
).reshape(8, 8)
QT_CHROM = np.array(
    [
        17, 18, 24, 47, 99, 99, 99, 99,
        18, 21, 26, 66, 99, 99, 99, 99,
        24, 26, 56, 99, 99, 99, 99, 99,
        47, 66, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
    ],
    dtype=np.int32,
).reshape(8, 8)

# zigzag scan order (index i of the scan → (row, col) flattened offset)
_ZZ = np.array(
    [
        0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
        12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
        35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
        58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
    ]
)
_UNZZ = np.argsort(_ZZ)

# Annex K.3 standard Huffman tables: (BITS counts per code length 1..16,
# HUFFVAL symbol list)
_DC_LUM = (
    [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
    list(range(12)),
)
_DC_CHROM = (
    [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
    list(range(12)),
)
_AC_LUM = (
    [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 125],
    [
        0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41,
        0x06, 0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91,
        0xA1, 0x08, 0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24,
        0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A,
        0x25, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38,
        0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53,
        0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65, 0x66,
        0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
        0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A, 0x92, 0x93,
        0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
        0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6, 0xB7,
        0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
        0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1,
        0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2,
        0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
    ],
)
_AC_CHROM = (
    [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 119],
    [
        0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12,
        0x41, 0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14,
        0x42, 0x91, 0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15,
        0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17,
        0x18, 0x19, 0x1A, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37,
        0x38, 0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A,
        0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65,
        0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
        0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A,
        0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
        0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5,
        0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
        0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9,
        0xDA, 0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2,
        0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
    ],
)


def _canonical_codes(bits, vals):
    """(symbol → (code, length)) per the JPEG canonical code construction."""
    codes, code, k = {}, 0, 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            codes[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return codes


def _decode_table(bits, vals):
    """((length, code) → symbol) for the decoder."""
    out, code, k = {}, 0, 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[(length, code)] = vals[k]
            code += 1
            k += 1
        code <<= 1
    return out


_DCT8 = None


def _dct_matrix8() -> np.ndarray:
    global _DCT8
    if _DCT8 is None:
        k = np.arange(8)[:, None]
        i = np.arange(8)[None, :]
        m = np.cos(np.pi * (2 * i + 1) * k / 16.0) * 0.5
        m[0] *= 1.0 / np.sqrt(2.0)
        _DCT8 = m
    return _DCT8


def _scaled_tables(quality: int) -> tuple[np.ndarray, np.ndarray]:
    """IJG quality scaling of the Annex-K base tables (public formula)."""
    q = max(1, min(100, quality))
    scale = 5000 // q if q < 50 else 200 - 2 * q
    qt_l = np.clip((QT_LUM * scale + 50) // 100, 1, 255).astype(np.int32)
    qt_c = np.clip((QT_CHROM * scale + 50) // 100, 1, 255).astype(np.int32)
    return qt_l, qt_c


def _rgb_to_ycbcr(px: np.ndarray) -> np.ndarray:
    r, g, b = px[..., 0].astype(np.float64), px[..., 1].astype(np.float64), px[..., 2].astype(np.float64)
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
    cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
    return np.stack([y, cb, cr], axis=-1)


def _ycbcr_to_rgb(ycc: np.ndarray) -> np.ndarray:
    y, cb, cr = ycc[..., 0], ycc[..., 1] - 128.0, ycc[..., 2] - 128.0
    r = y + 1.402 * cr
    g = y - 0.344136 * cb - 0.714136 * cr
    b = y + 1.772 * cb
    return np.clip(np.stack([r, g, b], axis=-1) + 0.5, 0, 255).astype(np.uint8)


def _to_blocks(chan: np.ndarray) -> np.ndarray:
    """(H, W) → (n_blocks, 8, 8), edge-replicated to multiples of 8,
    blocks in raster (MCU) order."""
    h, w = chan.shape
    ph, pw = (-h) % 8, (-w) % 8
    if ph or pw:
        chan = np.pad(chan, ((0, ph), (0, pw)), mode="edge")
    hh, ww = chan.shape
    return (
        chan.reshape(hh // 8, 8, ww // 8, 8).transpose(0, 2, 1, 3).reshape(-1, 8, 8)
    )


class _BitWriter:
    def __init__(self):
        self.buf = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            byte = (self.acc >> (self.nbits - 8)) & 0xFF
            self.buf.append(byte)
            if byte == 0xFF:  # byte stuffing
                self.buf.append(0x00)
            self.nbits -= 8
        self.acc &= (1 << self.nbits) - 1

    def align(self) -> None:
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)  # pad with 1s per spec

    def put_marker(self, marker: int) -> None:
        """Raw FF xx marker bytes — caller must align() first; markers
        are never byte-stuffed."""
        self.buf.append(0xFF)
        self.buf.append(marker)

    def flush(self) -> bytes:
        self.align()
        return bytes(self.buf)


def _magnitude(v: int) -> tuple[int, int]:
    """(size category, amplitude bits) — negative values one's-complement."""
    if v == 0:
        return 0, 0
    size = int(abs(v)).bit_length()
    bits = v if v > 0 else v + (1 << size) - 1
    return size, bits


def encode_jpeg(
    pixels: np.ndarray, quality: int = 95, restart_interval: int = 0
) -> bytes:
    """Baseline JFIF bytes for an (H, W, 3) uint8 RGB array.

    ``restart_interval`` > 0 emits a DRI segment and an RSTn marker
    every that-many MCUs (byte-aligned, DC predictors reset) — the
    error-resilience feature real encoders use, and the round-trip
    exerciser for the decoder's restart handling."""
    h, w, _ = pixels.shape
    qt_l, qt_c = _scaled_tables(quality)
    m = _dct_matrix8()
    ycc = _rgb_to_ycbcr(pixels) - 128.0

    comps = []
    for ci in range(3):
        blocks = _to_blocks(ycc[..., ci])
        coeff = np.einsum("ij,njk,lk->nil", m, blocks, m)
        qt = qt_l if ci == 0 else qt_c
        q = np.round(coeff / qt).astype(np.int32)
        comps.append(q.reshape(-1, 64)[:, _ZZ])  # zigzag per block

    dc_l, dc_c = _canonical_codes(*_DC_LUM), _canonical_codes(*_DC_CHROM)
    ac_l, ac_c = _canonical_codes(*_AC_LUM), _canonical_codes(*_AC_CHROM)
    bw = _BitWriter()
    pred = [0, 0, 0]
    n_mcu = comps[0].shape[0]
    for b in range(n_mcu):
        if restart_interval and b and b % restart_interval == 0:
            bw.align()
            bw.put_marker(0xD0 + ((b // restart_interval - 1) % 8))
            pred = [0, 0, 0]
        for ci in range(3):
            zz = comps[ci][b]
            dct_tab = dc_l if ci == 0 else dc_c
            act_tab = ac_l if ci == 0 else ac_c
            diff = int(zz[0]) - pred[ci]
            pred[ci] = int(zz[0])
            size, bits = _magnitude(diff)
            code, ln = dct_tab[size]
            bw.write(code, ln)
            if size:
                bw.write(bits, size)
            run = 0
            nz = np.nonzero(zz[1:])[0]
            last = nz[-1] + 1 if len(nz) else 0
            for i in range(1, last + 1):
                v = int(zz[i])
                if v == 0:
                    run += 1
                    continue
                while run > 15:
                    code, ln = act_tab[0xF0]  # ZRL
                    bw.write(code, ln)
                    run -= 16
                size, bits = _magnitude(v)
                code, ln = act_tab[(run << 4) | size]
                bw.write(code, ln)
                bw.write(bits, size)
                run = 0
            if last < 63:
                code, ln = act_tab[0x00]  # EOB
                bw.write(code, ln)
    scan = bw.flush()

    def seg(marker: int, payload: bytes) -> bytes:
        return struct.pack(">HH", marker, len(payload) + 2) + payload

    out = [b"\xff\xd8"]  # SOI
    out.append(seg(0xFFE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00"))
    out.append(seg(0xFFDB, b"\x00" + bytes(qt_l.flatten()[_ZZ].astype(np.uint8))))
    out.append(seg(0xFFDB, b"\x01" + bytes(qt_c.flatten()[_ZZ].astype(np.uint8))))
    sof = struct.pack(">BHHB", 8, h, w, 3)
    for cid, tq in ((1, 0), (2, 1), (3, 1)):
        sof += struct.pack(">BBB", cid, 0x11, tq)  # 1x1 sampling (4:4:4)
    out.append(seg(0xFFC0, sof))
    for tc_th, (bits, vals) in (
        (0x00, _DC_LUM), (0x10, _AC_LUM), (0x01, _DC_CHROM), (0x11, _AC_CHROM)
    ):
        out.append(seg(0xFFC4, bytes([tc_th]) + bytes(bits) + bytes(vals)))
    if restart_interval:
        out.append(seg(0xFFDD, struct.pack(">H", restart_interval)))
    sos = b"\x03" + bytes([1, 0x00, 2, 0x11, 3, 0x11]) + b"\x00\x3f\x00"
    out.append(seg(0xFFDA, sos))
    out.append(scan)
    out.append(b"\xff\xd9")  # EOI
    return b"".join(out)


class _BitReader:
    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0
        self.acc = 0
        self.nbits = 0

    def _fill(self) -> None:
        if self.pos >= len(self.data):
            raise ValueError("truncated JPEG entropy stream")
        b = self.data[self.pos]
        self.pos += 1
        if b == 0xFF:
            # a stuffed FF 00 is a literal FF; any other following byte
            # would be a marker, which segment splitting already removed
            # — a lone trailing FF is a truncated stream, not an index
            # crash
            if self.pos >= len(self.data):
                raise ValueError("truncated JPEG entropy stream")
            if self.data[self.pos] == 0x00:
                self.pos += 1  # stuffed byte
        self.acc = (self.acc << 8) | b
        self.nbits += 8

    def read_bit(self) -> int:
        if self.nbits == 0:
            self._fill()
        self.nbits -= 1
        bit = (self.acc >> self.nbits) & 1
        # mask the consumed bit away: the accumulator stays <= 8 bits,
        # keeping every shift O(1) — an unmasked accumulator grows with
        # the whole scan and turns decode into O(N^2) (measured 3.7 s
        # for a 58 KB scan; a real 1-2 MB web JPEG would pin an
        # executor for tens of minutes)
        self.acc &= (1 << self.nbits) - 1
        return bit

    def read_bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v


def _huff_decode(br: _BitReader, table: dict) -> int:
    code, length = 0, 0
    while True:
        code = (code << 1) | br.read_bit()
        length += 1
        sym = table.get((length, code))
        if sym is not None:
            return sym
        if length > 16:
            raise ValueError("invalid Huffman stream")


def _extend(bits: int, size: int) -> int:
    if size == 0:
        return 0
    return bits if bits >= (1 << (size - 1)) else bits - (1 << size) + 1


def _split_restart_segments(scan: bytes) -> list[bytes]:
    """Entropy data split at RSTn markers (FF D0-D7).  Inside entropy
    data a literal FF is always stuffed as FF 00 and FF D9 terminates
    the scan, so FF D0-D7 can ONLY be restart markers — a byte-level
    split is exact."""
    segs, start, i = [], 0, 0
    while True:
        i = scan.find(b"\xff", i)
        if i == -1 or i + 1 >= len(scan):
            break
        nxt = scan[i + 1]
        if 0xD0 <= nxt <= 0xD7:
            segs.append(scan[start:i])
            start = i = i + 2
        else:
            i += 2 if nxt == 0x00 else 1
    segs.append(scan[start:])
    return segs


def decode_jpeg(data: bytes) -> np.ndarray:
    """(H, W, 3) uint8 RGB from baseline 4:4:4 JFIF bytes.

    Corrupt input raises ValueError, whatever shape the corruption
    takes: entropy-coded streams can fail deep in the Huffman/zigzag
    walk as IndexError/KeyError/struct.error, and this is the codec
    boundary where those become "bad bytes are data" for callers whose
    guard catches ValueError only (fuzz-pinned in test_property.py)."""
    try:
        return _decode_jpeg_inner(data)
    except (IndexError, KeyError, struct.error, OverflowError) as e:
        raise ValueError(f"corrupt JPEG stream: {type(e).__name__}: {e}") from None


def _decode_jpeg_inner(data: bytes) -> np.ndarray:
    if data[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG")
    pos = 2
    qts: dict[int, np.ndarray] = {}
    huff: dict[int, dict] = {}
    h = w = 0
    restart_interval = 0
    comp_spec: list[tuple[int, int]] = []  # (component id, quant table id)
    scan_comp: list[tuple[int, int, int]] = []  # (cid, dc table, ac table)
    scan_data = b""
    while pos < len(data):
        if data[pos] != 0xFF:
            raise ValueError("JPEG marker expected")
        # spec-legal fill bytes: a marker may be preceded by any number
        # of extra FFs
        while pos + 1 < len(data) and data[pos + 1] == 0xFF:
            pos += 1
        if pos + 1 >= len(data):
            break
        marker = data[pos + 1]
        pos += 2
        if marker == 0xD9:  # EOI
            break
        if marker == 0x01 or 0xD0 <= marker <= 0xD7:
            continue  # TEM / stray RSTn: standalone, no length word
        (ln,) = struct.unpack(">H", data[pos : pos + 2])
        payload = data[pos + 2 : pos + ln]
        pos += ln
        if marker == 0xDB:  # DQT
            p = 0
            while p < len(payload):
                pq, tq = payload[p] >> 4, payload[p] & 0xF
                if pq != 0:
                    raise NotImplementedError("8-bit quant tables only")
                tbl = np.frombuffer(payload[p + 1 : p + 65], dtype=np.uint8)
                qts[tq] = tbl[_UNZZ].reshape(8, 8).astype(np.int32)
                p += 65
        elif marker == 0xC0:  # SOF0 baseline
            _prec, h, w, nc = struct.unpack(">BHHB", payload[:6])
            if nc != 3:
                raise NotImplementedError("3-component JPEG only")
            for i in range(nc):
                cid, samp, tq = payload[6 + 3 * i : 9 + 3 * i]
                if samp != 0x11:
                    raise NotImplementedError("4:4:4 (1x1 sampling) only")
                comp_spec.append((cid, tq))
        elif marker in (0xC1, 0xC2, 0xC3):
            raise ValueError("baseline sequential (SOF0) only")
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack(">H", payload[:2])
        elif marker == 0xC4:  # DHT
            p = 0
            while p < len(payload):
                tc_th = payload[p]
                bits = list(payload[p + 1 : p + 17])
                n = sum(bits)
                vals = list(payload[p + 17 : p + 17 + n])
                huff[tc_th] = _decode_table(bits, vals)
                p += 17 + n
        elif marker == 0xDA:  # SOS — entropy data follows until EOI
            ns = payload[0]
            for i in range(ns):
                cid, tabs = payload[1 + 2 * i], payload[2 + 2 * i]
                scan_comp.append((cid, tabs >> 4, tabs & 0xF))
            # find EOI scanning for FF D9 (stuffed FF is FF 00)
            end = data.find(b"\xff\xd9", pos)
            scan_data = data[pos : end if end != -1 else len(data)]
            pos = end if end != -1 else len(data)

    if not (h and w and scan_data):
        raise ValueError("truncated JPEG")
    bw_blocks = (w + 7) // 8
    bh_blocks = (h + 7) // 8
    n_mcu = bw_blocks * bh_blocks
    m = _dct_matrix8()
    # restart markers byte-align the stream and reset DC prediction
    # every `restart_interval` MCUs: decode each segment with a fresh
    # bit reader + fresh predictors (real encoders emit DRI/RSTn
    # routinely; pre-splitting keeps the per-bit hot path branch-free)
    segments = _split_restart_segments(scan_data)
    seg_idx = 0
    br = _BitReader(segments[0])
    pred = {cid: 0 for cid, _, _ in scan_comp}
    qt_of = dict(comp_spec)
    planes = {cid: np.empty((bh_blocks * 8, bw_blocks * 8)) for cid, _, _ in scan_comp}
    for b in range(n_mcu):
        if restart_interval and b and b % restart_interval == 0:
            seg_idx += 1
            if seg_idx >= len(segments):
                raise ValueError("missing JPEG restart marker")
            br = _BitReader(segments[seg_idx])
            pred = {cid: 0 for cid, _, _ in scan_comp}
        by, bx = divmod(b, bw_blocks)
        for cid, dc_id, ac_id in scan_comp:
            dct_tab, act_tab = huff[0x00 | dc_id], huff[0x10 | ac_id]
            zz = np.zeros(64, dtype=np.int32)
            size = _huff_decode(br, dct_tab)
            diff = _extend(br.read_bits(size), size) if size else 0
            pred[cid] += diff
            zz[0] = pred[cid]
            k = 1
            while k < 64:
                rs = _huff_decode(br, act_tab)
                r, s = rs >> 4, rs & 0xF
                if rs == 0x00:  # EOB
                    break
                if rs == 0xF0:  # ZRL
                    k += 16
                    continue
                k += r
                zz[k] = _extend(br.read_bits(s), s)
                k += 1
            coeff = zz[_UNZZ].reshape(8, 8) * qts[qt_of[cid]]
            block = m.T @ coeff @ m
            planes[cid][by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] = block
    ycc = np.stack([planes[cid][:h, :w] + 128.0 for cid, _, _ in scan_comp], axis=-1)
    return _ycbcr_to_rgb(ycc)
