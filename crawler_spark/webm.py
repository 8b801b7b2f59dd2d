"""Matroska/WebM demuxer — pure EBML spec walk, no av library.

The WebM counterpart of crawler_spark.mp4: parses the EBML element
tree (RFC 8794) far enough to demux — Segment > Info(TimecodeScale),
Tracks > TrackEntry (number/type/codec/dimensions), Cluster >
SimpleBlock (track varint, relative timecode, keyframe flag, payload
range).  Selecting key/n-th blocks and shipping only those encoded
bytes is what a frame-sampling pipeline runs on every worker; pixel
DECODE of VP8/VP9/AV1 payloads genuinely needs an av library and
stays a declared NotImplementedError (:func:`decode_block`).

Laced SimpleBlocks raise ValueError (lacing packs several frames per
block and is rare for video tracks); BlockGroup fallback is not
walked — spec-simple, loud on anything outside that envelope.

Also provides :func:`mux` — a minimal writer (one video track, one
cluster, unlaced SimpleBlocks) so tests can synthesize deterministic,
spec-valid files and pin an exact round-trip.
"""

from __future__ import annotations

import struct
from typing import Iterator, NamedTuple

# element IDs (with their leading-1 length marker, as they appear on wire)
_EBML = 0x1A45DFA3
_SEGMENT = 0x18538067
_INFO = 0x1549A966
_TIMECODE_SCALE = 0x2AD7B1
_TRACKS = 0x1654AE6B
_TRACK_ENTRY = 0xAE
_TRACK_NUMBER = 0xD7
_TRACK_TYPE = 0x83
_CODEC_ID = 0x86
_VIDEO = 0xE0
_PIXEL_W = 0xB0
_PIXEL_H = 0xBA
_CLUSTER = 0x1F43B675
_CLUSTER_TC = 0xE7
_SIMPLE_BLOCK = 0xA3

_KEYFRAME = 0x80
_LACING = 0x06


class Block(NamedTuple):
    idx: int  # 0-based block index within the selected track
    offset: int  # absolute byte offset of the encoded payload
    size: int  # payload length in bytes
    timecode: int  # absolute timecode in TimecodeScale ticks
    is_key: bool


class VideoTrack(NamedTuple):
    number: int
    codec: str
    width: int
    height: int
    timescale_ns: int  # nanoseconds per timecode tick
    blocks: tuple[Block, ...]


def _read_id(data: bytes, o: int) -> tuple[int, int]:
    if o >= len(data):
        raise ValueError("truncated EBML id")
    b0 = data[o]
    for ln in range(1, 5):
        if b0 & (0x80 >> (ln - 1)):
            if o + ln > len(data):
                raise ValueError("truncated EBML id")
            return int.from_bytes(data[o : o + ln], "big"), o + ln
    raise ValueError(f"invalid EBML id lead byte {b0:#x}")


def _read_size(data: bytes, o: int) -> tuple[int, int]:
    if o >= len(data):
        raise ValueError("truncated EBML size")
    b0 = data[o]
    for ln in range(1, 9):
        if b0 & (0x80 >> (ln - 1)):
            if o + ln > len(data):
                raise ValueError("truncated EBML size")
            v = (b0 & (0x7F >> (ln - 1))).to_bytes(1, "big") + data[o + 1 : o + ln]
            size = int.from_bytes(v, "big")
            if size == (1 << (7 * ln)) - 1:  # all-ones = unknown size
                raise ValueError("unknown-size EBML element unsupported")
            return size, o + ln
    raise ValueError(f"invalid EBML size lead byte {b0:#x}")


def iter_elements(data: bytes, start: int, end: int) -> Iterator[tuple[int, int, int]]:
    """Yield (element_id, payload_start, payload_end) in [start, end)."""
    o = start
    while o < end:
        eid, o = _read_id(data, o)
        size, o = _read_size(data, o)
        if o + size > end:
            raise ValueError(f"element {eid:#x} overruns scope")
        yield eid, o, o + size
        o += size


def _uint(data: bytes, s: int, e: int) -> int:
    return int.from_bytes(data[s:e], "big")


def video_track(data: bytes) -> VideoTrack:
    """Demux the first video track: dimensions, codec, and every
    SimpleBlock's byte range / absolute timecode / keyframe flag."""
    data = bytes(data)
    if data[:4] != b"\x1a\x45\xdf\xa3":
        raise ValueError("not an EBML/Matroska file")
    seg = next(
        ((s, e) for i, s, e in iter_elements(data, 0, len(data)) if i == _SEGMENT),
        None,
    )
    if seg is None:
        raise ValueError("no Segment element")

    timescale_ns = 1_000_000  # Matroska default
    number, codec, width, height = None, "", 0, 0
    blocks: list[Block] = []
    # Two passes over the Segment: streaming-style muxers may legally
    # emit Clusters BEFORE the Tracks element, and a single pass would
    # silently skip those blocks (track number still unknown).  The
    # first pass only walks element headers (no payload bytes), so the
    # extra pass costs O(elements), not O(bytes).
    segment_elements = list(iter_elements(data, *seg))
    for eid, s, e in segment_elements:
        if eid == _INFO:
            for i2, s2, e2 in iter_elements(data, s, e):
                if i2 == _TIMECODE_SCALE:
                    timescale_ns = _uint(data, s2, e2)
        elif eid == _TRACKS and number is None:
            for i2, s2, e2 in iter_elements(data, s, e):
                if i2 != _TRACK_ENTRY:
                    continue
                num, typ, cod, w, h = None, None, "", 0, 0
                for i3, s3, e3 in iter_elements(data, s2, e2):
                    if i3 == _TRACK_NUMBER:
                        num = _uint(data, s3, e3)
                    elif i3 == _TRACK_TYPE:
                        typ = _uint(data, s3, e3)
                    elif i3 == _CODEC_ID:
                        cod = data[s3:e3].decode("latin1")
                    elif i3 == _VIDEO:
                        for i4, s4, e4 in iter_elements(data, s3, e3):
                            if i4 == _PIXEL_W:
                                w = _uint(data, s4, e4)
                            elif i4 == _PIXEL_H:
                                h = _uint(data, s4, e4)
                if typ == 1 and num is not None:  # 1 = video
                    number, codec, width, height = num, cod, w, h
                    break
    if number is None:
        raise ValueError("no video track")
    for eid, s, e in segment_elements:
        if eid == _CLUSTER:
            cluster_tc = 0
            for i2, s2, e2 in iter_elements(data, s, e):
                if i2 == _CLUSTER_TC:
                    cluster_tc = _uint(data, s2, e2)
                elif i2 == _SIMPLE_BLOCK:
                    tnum, o = _read_size(data, s2)  # track number is a varint
                    if tnum != number:
                        continue
                    if e2 - o < 3:  # s16 timecode + flags must fit the element
                        raise ValueError("truncated SimpleBlock header")
                    (rel,) = struct.unpack_from(">h", data, o)
                    flags = data[o + 2]
                    if flags & _LACING:
                        raise ValueError("laced SimpleBlock unsupported")
                    blocks.append(
                        Block(
                            len(blocks),
                            o + 3,
                            e2 - (o + 3),
                            cluster_tc + rel,
                            bool(flags & _KEYFRAME),
                        )
                    )
    return VideoTrack(number, codec, width, height, timescale_ns, tuple(blocks))


def probe(data: bytes) -> dict:
    t = video_track(data)
    return {
        "codec": t.codec,
        "width": t.width,
        "height": t.height,
        "timescale_ns": t.timescale_ns,
        "n_blocks": len(t.blocks),
        "n_key": sum(1 for b in t.blocks if b.is_key),
    }


def block_payload(data: bytes, block: Block) -> bytes:
    return bytes(data[block.offset : block.offset + block.size])


def decode_block(data: bytes, block: Block):
    """Pixel decode of a VP8/VP9/AV1 payload — DECLARED capability gap
    (av library); the demux above is complete and real."""
    raise NotImplementedError(
        "codec payload decode needs an av library; demux (byte ranges, "
        "timecodes, keyframe flags) is fully supported"
    )


# --------------------------------------------------------------------- writer
def _id_bytes(eid: int) -> bytes:
    n = (eid.bit_length() + 7) // 8
    return eid.to_bytes(n, "big")


def _size_bytes(size: int, ln: int = 4) -> bytes:
    # EBML size: leading-1 marker at bit 7*ln, then the size value
    if size >= (1 << (7 * ln)) - 1:
        raise ValueError("size too large for chosen length")
    return (size | (1 << (7 * ln))).to_bytes(ln, "big")


def _elem(eid: int, payload: bytes) -> bytes:
    return _id_bytes(eid) + _size_bytes(len(payload)) + payload


def _uint_payload(v: int) -> bytes:
    n = max(1, (v.bit_length() + 7) // 8)
    return v.to_bytes(n, "big")


def mux(
    frames: list[bytes],
    width: int,
    height: int,
    fps: int = 8,
    codec: str = "V_VP9",
    keyframes: set[int] | None = None,
) -> bytes:
    """Minimal spec-valid single-video-track WebM: EBML header +
    Segment(Info, Tracks, Clusters of unlaced SimpleBlocks at constant
    frame duration).  ``keyframes`` = 0-based key indices (None =>
    every frame keyed).  A SimpleBlock timecode is SIGNED 16-bit
    RELATIVE to its cluster, so a new cluster starts whenever the
    relative timecode would overflow — long clips mux correctly
    instead of crashing at ~32 s."""
    if not frames:
        raise ValueError("mux needs at least one frame")
    header = _elem(
        _EBML,
        _elem(0x4286, b"\x01")  # EBMLVersion
        + _elem(0x42F7, b"\x01")  # EBMLReadVersion
        + _elem(0x42F2, b"\x04")  # EBMLMaxIDLength
        + _elem(0x42F3, b"\x08")  # EBMLMaxSizeLength
        + _elem(0x4282, b"webm")  # DocType
        + _elem(0x4287, b"\x02")  # DocTypeVersion
        + _elem(0x4285, b"\x02"),  # DocTypeReadVersion
    )
    info = _elem(_INFO, _elem(_TIMECODE_SCALE, _uint_payload(1_000_000)))
    tracks = _elem(
        _TRACKS,
        _elem(
            _TRACK_ENTRY,
            _elem(_TRACK_NUMBER, b"\x01")
            + _elem(0x73C5, b"\x01")  # TrackUID
            + _elem(_TRACK_TYPE, b"\x01")
            + _elem(_CODEC_ID, codec.encode("latin1"))
            + _elem(
                _VIDEO,
                _elem(_PIXEL_W, _uint_payload(width))
                + _elem(_PIXEL_H, _uint_payload(height)),
            ),
        ),
    )
    delta = 1000 // fps  # ms per frame at the default 1ms timecode tick
    clusters = b""
    cluster_tc, blocks = 0, b""
    for i, fr in enumerate(frames):
        abs_tc = i * delta
        if abs_tc - cluster_tc > 0x7FFF:  # relative s16 would overflow
            clusters += _elem(
                _CLUSTER, _elem(_CLUSTER_TC, _uint_payload(cluster_tc)) + blocks
            )
            cluster_tc, blocks = abs_tc, b""
        key = keyframes is None or i in keyframes
        blocks += _elem(
            _SIMPLE_BLOCK,
            b"\x81"  # track number 1 as a 1-byte varint
            + struct.pack(">h", abs_tc - cluster_tc)
            + bytes([_KEYFRAME if key else 0])
            + fr,
        )
    clusters += _elem(_CLUSTER, _elem(_CLUSTER_TC, _uint_payload(cluster_tc)) + blocks)
    return header + _elem(_SEGMENT, info + tracks + clusters)
