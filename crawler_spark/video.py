"""Minimal real video container (motion-frame sequence, "MJV1").

Upgrades the round-2 video *stub* (raw fixed-size block slicing with a
declared fake decode) to a real, self-describing container over the
repo's real image codecs — the same move jpeg.py made for still
images.  Layout (all big-endian):

    b"MJV1"                      magic
    u16 n_frames                 frame count
    u8  fps                      nominal frame rate (metadata only)
    u16 w, u16 h                 frame dimensions
    n_frames × (u32 len, bytes)  length-prefixed frame payloads,
                                 each a real PNG (lossless) or real
                                 baseline JPEG (crawler_spark.jpeg)

This is the motion-JPEG idea — independently coded frames, no
inter-frame prediction — which is exactly what a frame-sampling
training-data pipeline wants: every n-th frame decodes without
decoding its neighbours, so a sample of k frames costs O(k) decode
work plus an O(n_frames) index walk over length prefixes (no payload
bytes are touched for skipped frames).

Foreign containers: ISO-BMFF (MP4, progressive and movie-fragmented),
Matroska/WebM and RIFF/AVI files all DEMUX for real via
crawler_spark.mp4 / .webm / .avi (pure-spec sample tables / EBML walk
/ RIFF+idx1 walk — byte ranges, timestamps, sync flags; see
:func:`demux_samples`); only the codec-payload pixel DECODE
(avc1/hev1/vp09/MJPG entropy coding) still needs an av library this
sandbox doesn't ship and raises a declared NotImplementedError.  The
Spark plumbing in functions/multimodal.py is identical whichever
decoder sits below.

No reference-repo lineage: e8kor/crawler has no video code; the
container layout is original and the frame codecs follow public specs
(PNG, ITU-T T.81).
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

import numpy as np

from . import images as I

_MAGIC = b"MJV1"
_HDR = struct.Struct(">HBHH")  # n_frames, fps, w, h


def encode_video(
    frames: list[np.ndarray], fps: int = 8, fmt: str = "png"
) -> bytes:
    """Encode H×W×3 uint8 frames into an MJV1 container.

    ``fmt``: 'png' (lossless) or 'jpg' (real baseline JPEG, lossy —
    frame PSNR stays above the 40 dB input_hint gate at quality 99).
    """
    assert frames, "empty video"
    h, w, _ = frames[0].shape
    assert all(f.shape == (h, w, 3) for f in frames), "mixed frame dims"
    # explicit container limits (u16/u8 header fields) — a clear error
    # beats struct.error's opaque 'ubyte format requires 0 <= ...'
    if len(frames) > 0xFFFF:
        raise ValueError(f"MJV1 holds at most 65535 frames, got {len(frames)}")
    if not 1 <= fps <= 255:
        raise ValueError(f"MJV1 fps must be 1..255, got {fps}")
    if w > 0xFFFF or h > 0xFFFF:
        raise ValueError(f"MJV1 frame dims must fit u16, got {w}x{h}")
    out = [_MAGIC, _HDR.pack(len(frames), fps, w, h)]
    for f in frames:
        payload = I.encode_image(f, fmt)
        out.append(struct.pack(">I", len(payload)))
        out.append(payload)
    return b"".join(out)


def probe(data: bytes) -> dict:
    """Container metadata without touching any frame payload."""
    if data[:4] != _MAGIC:
        _reject_foreign(data)
    if len(data) < 4 + _HDR.size:
        raise ValueError("truncated MJV1 header")
    n, fps, w, h = _HDR.unpack_from(data, 4)
    return {"n_frames": n, "fps": fps, "w": w, "h": h}


def iter_frame_offsets(data: bytes) -> Iterator[tuple[int, int, int]]:
    """Yield (frame_idx, payload_offset, payload_len) — index walk only."""
    if data[:4] != _MAGIC:
        _reject_foreign(data)
    if len(data) < 4 + _HDR.size:
        raise ValueError("truncated MJV1 header")
    (n, _fps, _w, _h) = _HDR.unpack_from(data, 4)
    pos = 4 + _HDR.size
    for i in range(n):
        if pos + 4 > len(data):
            raise ValueError("truncated MJV1 frame index")
        (ln,) = struct.unpack_from(">I", data, pos)
        pos += 4
        if pos + ln > len(data):
            raise ValueError("truncated MJV1 frame payload")
        yield i, pos, ln
        pos += ln


def decode_frame(data: bytes, offset: int, length: int) -> np.ndarray:
    """Decode one length-prefixed frame payload (magic-dispatched)."""
    return I.decode_image(data[offset : offset + length], "png")


def sample_frames(
    data: bytes, every_n: int = 8
) -> Iterator[tuple[int, np.ndarray]]:
    """Decode every n-th frame; skipped frames cost zero decode work."""
    for i, off, ln in iter_frame_offsets(data):
        if i % every_n == 0:
            yield i, decode_frame(data, off, ln)


def _reject_foreign(data: bytes) -> None:
    head = bytes(data[:12])
    # RIFF alone is not a video: WAV and WEBP are RIFF too — only
    # RIFF....AVI  is the av-library case; other RIFF payloads are
    # simply not videos (callers distinguish 'legit but unsupported
    # format' from 'wrong/corrupt data' by exception type)
    is_avi = head[:4] == b"RIFF" and head[8:12] == b"AVI "
    if head[4:8] == b"ftyp" or head[:4] == b"\x1a\x45\xdf\xa3":
        raise NotImplementedError(
            "MP4/WebM pixel decode needs an av library; use "
            "demux_samples() for the real sample-table/EBML demux "
            "(byte ranges/timestamps/sync flags)"
        )
    if is_avi:
        raise NotImplementedError(
            "AVI codec pixel decode needs an av library; use "
            "demux_samples() for the real RIFF/idx1 demux "
            "(byte ranges/timestamps/keyframe flags)"
        )
    raise ValueError("not an MJV1 container")


def demux_samples(data: bytes) -> list[tuple[int, int, int, int, bool]]:
    """Container-dispatched demux: (idx, offset, size, dts_ms, is_sync)
    per sample, WITHOUT touching payload bytes — the pipeline-side half
    of frame sampling, uniform across containers:

    - MJV1: length-prefix walk; every frame is independently coded, so
      every sample is a sync sample; dts from the header fps.
    - ISO-BMFF (MP4, progressive AND movie-fragmented): real sample
      tables via crawler_spark.mp4 (stts/stsc/stsz/stco/stss +
      moof/traf/trun — byte ranges, timestamps, sync flags).
    - Matroska/WebM: real EBML walk via crawler_spark.webm
      (SimpleBlock ranges, cluster+relative timecodes, keyframe flags).
    - RIFF/AVI: real chunk walk via crawler_spark.avi (movi frame
      ranges, idx1 keyframe flags, strh rate/scale timestamps).

    Non-video bytes raise ValueError; codec pixel decode everywhere
    but MJV1 stays the declared av-library gap."""
    raw = bytes(data)
    if raw[:4] == _MAGIC:
        meta = probe(raw)
        fps = max(1, int(meta["fps"]))
        # Quantize the per-frame delta exactly like the mp4/webm muxers
        # (delta = 1000 // fps), so dts_ms is container-uniform for ALL
        # fps values, not just those dividing 1000 — i * 1000 // fps
        # would disagree with the containers' i * (1000 // fps) (e.g.
        # fps=3, frame 3: 999 vs 1000).
        return [
            (i, off, ln, i * (1000 // fps), True)
            for i, off, ln in iter_frame_offsets(raw)
        ]
    if raw[4:8] == b"ftyp":
        from . import mp4 as M

        t = M.video_track(raw)
        ts = max(1, t.timescale)
        return [
            (s.idx, s.offset, s.size, s.dts * 1000 // ts, s.is_sync)
            for s in t.samples
        ]
    if raw[:4] == b"\x1a\x45\xdf\xa3":
        from . import webm as WB

        t = WB.video_track(raw)
        return [
            (b.idx, b.offset, b.size, b.timecode * t.timescale_ns // 1_000_000, b.is_key)
            for b in t.blocks
        ]
    if raw[:4] == b"RIFF" and raw[8:12] == b"AVI ":
        from . import avi as AV

        t = AV.video_track(raw)
        fps = max(1, t.rate // t.scale)
        # same muxer-quantized delta as MJV1/mp4/webm (1000 // fps)
        return [
            (f.idx, f.offset, f.size, f.idx * (1000 // fps), f.is_sync)
            for f in t.frames
        ]
    _reject_foreign(raw)
    raise AssertionError("unreachable")


def gen_video(seed: int, k: int, w: int, h: int, n_frames: int, fmt: str = "png") -> bytes:
    """Deterministic synthetic clip: frame f = gen_pixels(seed, k*997+f)
    — per-frame content differs so sampling order is testable."""
    return encode_video(
        [I.gen_pixels(seed, k * 997 + f, w, h) for f in range(n_frames)], fmt=fmt
    )
