"""Real audio codecs: RIFF/WAVE PCM16 + IMA ADPCM (pure struct+numpy).

Completes the modality triad (images.py stills, video.py motion
frames, this module audio) with REAL decoders — WAV/PCM is fully
specified (RIFF chunks, canonical 44-byte header) and IMA/DVI ADPCM
(WAVE format tag 0x11) is a pure-integer public spec (IMA Digital
Audio Pack, also in the Microsoft WAVE registry), so neither needs an
external library: PCM16 encode → decode round-trips bit-exactly, the
ADPCM decode is block-vectorized integer numpy, and the chunk walker
accepts non-canonical chunk orders (LIST/fact chunks before data, as
real encoders emit).

Perceptually-coded formats (MP3/Opus/AAC) would need an av library
this sandbox doesn't ship; ``decode_wav`` raises NotImplementedError
on their magic bytes and ValueError on garbage, mirroring video.py's
foreign-container policy.  The Spark plumbing in
functions/multimodal.py is identical whichever decoder sits below.

No reference-repo lineage: e8kor/crawler has no audio code; the
formats follow the public RIFF/WAVE spec (multimedia programming
interface and data specifications 1.0) and the IMA ADPCM algorithm.
"""

from __future__ import annotations

import struct

import numpy as np

_FMT = struct.Struct("<HHIIHH")  # audio_format, ch, sr, byte_rate, block, bits


def encode_wav(samples: np.ndarray, sr: int) -> bytes:
    """PCM16LE WAV from int16 samples shaped (n,) mono or (n, ch)."""
    x = np.asarray(samples)
    if x.dtype != np.int16:
        raise ValueError("encode_wav takes int16 samples (scale first)")
    if x.ndim == 1:
        x = x[:, None]
    n, ch = x.shape
    data = x.astype("<i2").tobytes()
    fmt = _FMT.pack(1, ch, sr, sr * ch * 2, ch * 2, 16)
    body = b"fmt " + struct.pack("<I", len(fmt)) + fmt
    body += b"data" + struct.pack("<I", len(data)) + data
    return b"RIFF" + struct.pack("<I", 4 + len(body)) + b"WAVE" + body


def decode_wav(data: bytes) -> tuple[np.ndarray, int]:
    """Parse RIFF chunks → (int16 array shaped (n, ch), sample_rate).

    Walks the chunk list (word-aligned, per spec) instead of assuming
    the canonical 44-byte layout, so files with LIST/fact chunks ahead
    of ``data`` decode too.  PCM16 (format 1) and IMA ADPCM (format
    0x11) both decode; perceptual codecs stay a declared gap.
    """
    head = bytes(data[:12])
    if head[:3] == b"ID3" or head[:2] == b"\xff\xfb" or head[:4] == b"OggS":
        raise NotImplementedError(
            "compressed audio (MP3/Ogg) needs an av library; this "
            "sandbox ships the real RIFF/WAVE PCM16 + IMA ADPCM codecs"
        )
    if head[:4] != b"RIFF" or head[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    pos, fmt, pcm, fact = 12, None, None, None
    while pos + 8 <= len(data):
        cid = bytes(data[pos : pos + 4])
        (ln,) = struct.unpack_from("<I", data, pos + 4)
        pos += 8
        if cid == b"fmt ":
            if pos + _FMT.size > len(data):
                raise ValueError("truncated WAV fmt chunk")
            fmt = _FMT.unpack_from(data, pos)
        elif cid == b"data":
            pcm = bytes(data[pos : pos + ln])
        elif cid == b"fact" and ln >= 4:
            (fact,) = struct.unpack_from("<I", data, pos)
        pos += ln + (ln & 1)  # chunks are word-aligned
    if fmt is None or pcm is None:
        raise ValueError("WAV missing fmt/data chunk")
    audio_format, ch, sr, _rate, block, bits = fmt
    # fmt fields are unvalidated uint16/uint32 from the wire: an
    # implausible header is corrupt data and must raise HERE (callers
    # map that to decode_ok=False) — not survive decode and then kill a
    # whole Spark task at Arrow int32 conversion of the sr column, or
    # divide-by-zero inside feature math.
    if not 1 <= sr <= 2**31 - 1:
        raise ValueError(f"implausible WAV sample rate {sr}")
    if not 1 <= ch <= 1024:
        raise ValueError(f"implausible WAV channel count {ch}")
    if audio_format == 0x11 and bits == 4:
        return _ima_decode(pcm, ch, block, fact), sr
    if audio_format != 1 or bits != 16:
        raise NotImplementedError(
            f"only PCM16 and IMA ADPCM supported, got fmt={audio_format} bits={bits}"
        )
    x = np.frombuffer(pcm, dtype="<i2")
    if x.size % ch:
        raise ValueError("WAV data length not a multiple of the frame size")
    return x.reshape(-1, ch), sr


# ----------------------------------------------------------- IMA ADPCM
# The IMA/DVI ADPCM tables — public constants from the IMA Digital
# Audio Pack (format tag 0x11 in the WAVE registry).  Pure-integer:
# decode is bit-deterministic across platforms.
_IMA_STEP = np.array(
    [7, 8, 9, 10, 11, 12, 13, 14, 16, 17, 19, 21, 23, 25, 28, 31, 34,
     37, 41, 45, 50, 55, 60, 66, 73, 80, 88, 97, 107, 118, 130, 143,
     157, 173, 190, 209, 230, 253, 279, 307, 337, 371, 408, 449, 494,
     544, 598, 658, 724, 796, 876, 963, 1060, 1166, 1282, 1411, 1552,
     1707, 1878, 2066, 2272, 2499, 2749, 3024, 3327, 3660, 4026, 4428,
     4871, 5358, 5894, 6484, 7132, 7845, 8630, 9493, 10442, 11487,
     12635, 13899, 15289, 16818, 18500, 20350, 22385, 24623, 27086,
     29794, 32767],
    dtype=np.int32,
)
_IMA_INDEX = np.array([-1, -1, -1, -1, 2, 4, 6, 8], dtype=np.int32)


def _ima_decode(
    pcm: bytes, ch: int, block_align: int, fact_samples: int | None
) -> np.ndarray:
    """Block-vectorized IMA ADPCM decode → (n, ch) int16.

    Block layout per spec: a 4-byte header per channel (int16
    predictor, uint8 step index, reserved), then 4-byte nibble groups
    round-robin across channels (8 samples per group, low nibble
    first).  The recurrence is sequential in SAMPLE index but
    independent across blocks, so the numpy loop runs once per sample
    step with all blocks*channels advancing as one integer vector —
    ~spb iterations total regardless of clip count."""
    hdr = 4 * ch
    if block_align < hdr + 4 * ch or block_align % 4:
        raise ValueError(f"implausible ADPCM block align {block_align}")
    n_blocks = len(pcm) // block_align
    if n_blocks == 0:
        raise ValueError("ADPCM data shorter than one block")
    blocks = np.frombuffer(
        pcm[: n_blocks * block_align], dtype=np.uint8
    ).reshape(n_blocks, block_align)
    headers = blocks[:, :hdr].reshape(n_blocks, ch, 4).astype(np.int32)
    pred = (headers[..., 0] | (headers[..., 1] << 8)).astype(np.int16).astype(np.int32)
    idx = headers[..., 2]
    if (idx > 88).any():
        raise ValueError("ADPCM step index out of range")
    n_groups = (block_align - hdr) // (4 * ch)
    body = blocks[:, hdr : hdr + n_groups * 4 * ch].reshape(n_blocks, n_groups, ch, 4)
    nib = np.empty((n_blocks, n_groups, ch, 8), dtype=np.uint8)
    nib[..., 0::2] = body & 0xF
    nib[..., 1::2] = body >> 4
    steps = n_groups * 8
    seq = nib.transpose(0, 1, 3, 2).reshape(n_blocks, steps, ch)
    out = np.empty((n_blocks, steps + 1, ch), dtype=np.int32)
    out[:, 0, :] = pred
    cur, ci = pred.copy(), idx.copy()
    for t in range(steps):
        n4 = seq[:, t, :].astype(np.int32)
        step = _IMA_STEP[ci]
        diff = (
            (step >> 3)
            + np.where(n4 & 1, step >> 2, 0)
            + np.where(n4 & 2, step >> 1, 0)
            + np.where(n4 & 4, step, 0)
        )
        cur = np.where(n4 & 8, cur - diff, cur + diff)
        np.clip(cur, -32768, 32767, out=cur)
        ci = np.clip(ci + _IMA_INDEX[n4 & 7], 0, 88)
        out[:, t + 1, :] = cur
    res = out.reshape(n_blocks * (steps + 1), ch)
    if fact_samples is not None:
        if fact_samples > res.shape[0]:
            raise ValueError(
                f"ADPCM fact count {fact_samples} exceeds decoded samples"
            )
        res = res[:fact_samples]
    return res.astype(np.int16)


def encode_adpcm_wav(
    samples: np.ndarray, sr: int, samples_per_block: int = 505
) -> bytes:
    """IMA ADPCM WAV from int16 samples shaped (n,) mono or (n, ch) —
    the fixture-side twin of :func:`_ima_decode` (same role as
    mp4.mux for the demuxer): real spec-valid files for tests and the
    synthetic corpus.  Lossy by design (~4:1), deterministic."""
    x = np.asarray(samples)
    if x.dtype != np.int16:
        raise ValueError("encode_adpcm_wav takes int16 samples")
    if x.ndim == 1:
        x = x[:, None]
    if (samples_per_block - 1) % 8:
        raise ValueError("samples_per_block must be 1 + multiple of 8")
    n, ch = x.shape
    spb = samples_per_block
    block_align = 4 * ch + (spb - 1) // 2 * ch
    blocks = []
    for start in range(0, n, spb):
        chunk = x[start : start + spb].astype(np.int32)
        if chunk.shape[0] < spb:  # pad the tail block by repeating silence
            chunk = np.vstack(
                [chunk, np.zeros((spb - chunk.shape[0], ch), dtype=np.int32)]
            )
        heads, chans = [], []
        for c in range(ch):
            nibbles, pred, idx = [], int(chunk[0, c]), 0
            for s in chunk[1:, c]:
                step = int(_IMA_STEP[idx])
                diff, n4 = int(s) - pred, 0
                if diff < 0:
                    n4, diff = 8, -diff
                if diff >= step:
                    n4 |= 4
                    diff -= step
                if diff >= step >> 1:
                    n4 |= 2
                    diff -= step >> 1
                if diff >= step >> 2:
                    n4 |= 1
                d = (
                    (step >> 3)
                    + ((step >> 2) if n4 & 1 else 0)
                    + ((step >> 1) if n4 & 2 else 0)
                    + (step if n4 & 4 else 0)
                )
                pred = pred - d if n4 & 8 else pred + d
                pred = max(-32768, min(32767, pred))
                idx = max(0, min(88, idx + int(_IMA_INDEX[n4 & 7])))
                nibbles.append(n4)
            heads.append(
                struct.pack("<hBB", int(chunk[0, c]), 0, 0)
            )
            packed = bytes(
                nibbles[i] | (nibbles[i + 1] << 4) for i in range(0, len(nibbles), 2)
            )
            chans.append(packed)
        body = b"".join(heads)
        # interleave 4-byte groups round-robin across channels
        for g in range(len(chans[0]) // 4):
            for c in range(ch):
                body += chans[c][g * 4 : g * 4 + 4]
        assert len(body) == block_align
        blocks.append(body)
    data = b"".join(blocks)
    byte_rate = sr * block_align // spb
    fmt = _FMT.pack(0x11, ch, sr, byte_rate, block_align, 4) + struct.pack(
        "<HH", 2, spb
    )
    body = b"fmt " + struct.pack("<I", len(fmt)) + fmt
    body += b"fact" + struct.pack("<II", 4, n)
    body += b"data" + struct.pack("<I", len(data)) + data
    return b"RIFF" + struct.pack("<I", 4 + len(body)) + b"WAVE" + body


def gen_tone(seed: int, k: int, sr: int = 8000, dur_ms: int = 250) -> bytes:
    """Deterministic synthetic clip: two sinusoids + low noise, keyed by
    (seed, k) — the dominant frequency is recoverable by FFT, which
    makes feature extraction testable against ground truth."""
    rng = np.random.default_rng((seed, k))
    n = sr * dur_ms // 1000
    t = np.arange(n) / sr
    f0 = 200.0 + float(rng.integers(0, 28)) * 100.0  # 200..2900 Hz
    # secondary component: the octave above when it clears Nyquist,
    # else the octave below — a 2*f0 past sr/2 would alias to an
    # inharmonic 8000-2*f0 tone, silently breaking the documented
    # two-sinusoid harmonic structure for f0 > 2000 Hz at sr=8000
    f1 = f0 * 2.0 if f0 * 2.0 < sr / 2.0 else f0 / 2.0
    x = 0.6 * np.sin(2 * np.pi * f0 * t)
    x += 0.2 * np.sin(2 * np.pi * f1 * t)
    x += 0.02 * rng.standard_normal(n)
    return encode_wav(np.clip(x * 32767, -32768, 32767).astype(np.int16), sr)


def resample_linear(x: np.ndarray, sr_from: int, sr_to: int) -> np.ndarray:
    """Linear-interpolation resample of (n, ch) int16 → (m, ch) int16.
    (Production would window-sinc; linear is the honest in-repo kernel
    and is exact for the test's constant/ramp signals.)"""
    n = x.shape[0]
    m = max(1, int(round(n * sr_to / sr_from)))
    src = np.arange(n, dtype=np.float64)
    dst = np.arange(m, dtype=np.float64) * (n - 1) / max(m - 1, 1)
    out = np.empty((m, x.shape[1]), dtype=np.int16)
    for c in range(x.shape[1]):
        out[:, c] = np.round(np.interp(dst, src, x[:, c].astype(np.float64)))
    return out


def features(x: np.ndarray, sr: int) -> dict:
    """Scalar features for the analytics table: duration, RMS level,
    zero-crossing rate, FFT-dominant frequency (mono mix)."""
    mono = x.astype(np.float64).mean(axis=1) / 32768.0
    n = len(mono)
    rms = float(np.sqrt((mono**2).mean())) if n else 0.0
    zcr = (
        float(np.mean(np.abs(np.diff(np.signbit(mono).astype(np.int8)))))
        if n > 1
        else 0.0
    )
    if n > 1:
        mag = np.abs(np.fft.rfft(mono * np.hanning(n)))
        mag[0] = 0.0  # DC is level, not pitch
        dom = float(np.argmax(mag) * sr / n)
    else:
        dom = 0.0
    return {
        "n_samples": n,
        "duration_ms": int(round(1000 * n / sr)),
        "rms": round(rms, 4),
        "zcr": round(zcr, 4),
        "dominant_hz": round(dom, 1),
    }
