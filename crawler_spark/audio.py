"""Real audio codec: RIFF/WAVE PCM16 (pure stdlib struct + numpy).

Completes the modality triad (images.py stills, video.py motion
frames, this module audio) with a REAL decoder — WAV/PCM is fully
specified (RIFF chunks, canonical 44-byte header) and needs no
external library, so unlike the declared video-inter-codec stub there
is nothing fake here: encode → decode round-trips bit-exactly and the
chunk walker accepts non-canonical chunk orders (LIST/fact chunks
before data, as real encoders emit).

Compressed formats (MP3/Opus/AAC) would need an av library this
sandbox doesn't ship; ``decode_wav`` raises NotImplementedError on
their magic bytes and ValueError on garbage, mirroring video.py's
foreign-container policy.  The Spark plumbing in
functions/multimodal.py is identical whichever decoder sits below.

No reference-repo lineage: e8kor/crawler has no audio code; the
format follows the public RIFF/WAVE spec (multimedia programming
interface and data specifications 1.0).
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
    of ``data`` decode too.
    """
    head = bytes(data[:12])
    if head[:3] == b"ID3" or head[:2] == b"\xff\xfb" or head[:4] == b"OggS":
        raise NotImplementedError(
            "compressed audio (MP3/Ogg) needs an av library; this "
            "sandbox ships the real RIFF/WAVE PCM16 codec only"
        )
    if head[:4] != b"RIFF" or head[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    pos, fmt, pcm = 12, None, None
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
        pos += ln + (ln & 1)  # chunks are word-aligned
    if fmt is None or pcm is None:
        raise ValueError("WAV missing fmt/data chunk")
    audio_format, ch, sr, _rate, _block, bits = fmt
    if audio_format != 1 or bits != 16:
        raise NotImplementedError(f"only PCM16 supported, got fmt={audio_format} bits={bits}")
    # fmt fields are unvalidated uint16/uint32 from the wire: an
    # implausible header is corrupt data and must raise HERE (callers
    # map that to decode_ok=False) — not survive decode and then kill a
    # whole Spark task at Arrow int32 conversion of the sr column, or
    # divide-by-zero inside feature math.
    if not 1 <= sr <= 2**31 - 1:
        raise ValueError(f"implausible WAV sample rate {sr}")
    if not 1 <= ch <= 1024:
        raise ValueError(f"implausible WAV channel count {ch}")
    x = np.frombuffer(pcm, dtype="<i2")
    if x.size % ch:
        raise ValueError("WAV data length not a multiple of the frame size")
    return x.reshape(-1, ch), sr


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
