"""Real WAV/PCM16 codec + audio feature plumbing (crawler_spark.audio,
functions/multimodal audio kernels)."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from crawler_spark import audio as AU


def test_wav_roundtrip_bit_exact():
    rng = np.random.default_rng(0)
    x = rng.integers(-32768, 32767, size=(500, 2), dtype=np.int16)
    y, sr = AU.decode_wav(AU.encode_wav(x, 22050))
    assert sr == 22050
    assert np.array_equal(x, y)
    # mono 1-D input round-trips as (n, 1)
    m = rng.integers(-32768, 32767, size=300, dtype=np.int16)
    y2, _ = AU.decode_wav(AU.encode_wav(m, 8000))
    assert np.array_equal(y2[:, 0], m)


def test_wav_chunk_walk_noncanonical_order():
    """Decoder must walk RIFF chunks, not assume the canonical 44-byte
    layout: a LIST chunk injected before data still decodes."""
    b = AU.gen_tone(42, 7)
    lst = b"LIST" + struct.pack("<I", 4) + b"INFO"
    riff_len = struct.unpack("<I", b[4:8])[0] + len(lst)
    b2 = b"RIFF" + struct.pack("<I", riff_len) + b"WAVE" + lst + b[12:]
    x, sr = AU.decode_wav(b2)
    x0, sr0 = AU.decode_wav(b)
    assert sr == sr0 and np.array_equal(x, x0)


def test_wav_rejects_foreign_and_garbage():
    with pytest.raises(NotImplementedError):
        AU.decode_wav(b"ID3\x04" + b"\x00" * 40)  # MP3 with ID3 tag
    with pytest.raises(NotImplementedError):
        AU.decode_wav(b"OggS" + b"\x00" * 40)
    with pytest.raises(ValueError):
        AU.decode_wav(b"notaudio" + b"\x00" * 40)
    # PCM24 / float WAVs are declared unsupported, not mis-decoded
    fmt = struct.pack("<HHIIHH", 3, 1, 8000, 32000, 4, 32)
    body = b"fmt " + struct.pack("<I", len(fmt)) + fmt
    body += b"data" + struct.pack("<I", 4) + b"\x00" * 4
    f32 = b"RIFF" + struct.pack("<I", 4 + len(body)) + b"WAVE" + body
    with pytest.raises(NotImplementedError):
        AU.decode_wav(f32)


def test_tone_pitch_recovered_by_features():
    """gen_tone's fundamental is 200..2900 Hz in 100 Hz steps; the FFT
    dominant-frequency feature must land within one bin of it."""
    for k in range(10):
        b = AU.gen_tone(42, k)
        x, sr = AU.decode_wav(b)
        f = AU.features(x, sr)
        rng = np.random.default_rng((42, k))
        f0 = 200.0 + float(rng.integers(0, 28)) * 100.0
        bin_hz = sr / f["n_samples"]
        assert abs(f["dominant_hz"] - f0) <= bin_hz + 1e-9, (k, f, f0)
        assert f["duration_ms"] == 250
        assert 0.2 < f["rms"] < 0.7


def test_resample_linear_lengths_and_ramp():
    x = np.arange(0, 1000, dtype=np.int16)[:, None]
    half = AU.resample_linear(x, 8000, 4000)
    assert half.shape == (500, 1)
    dbl = AU.resample_linear(x, 8000, 16000)
    assert dbl.shape == (2000, 1)
    # a linear ramp is reproduced exactly by linear interpolation:
    # sample j of the 500-point output sits at position j*999/499 on
    # the ramp, whose value IS that position
    expect = np.round(np.arange(500) * 999.0 / 499.0).astype(np.int16)
    assert np.array_equal(half[:, 0], expect)


def test_audio_features_query_and_corrupt_rows(spark, sf_dir):
    import pandas as pd

    from crawler_spark import contract as C
    from crawler_spark.functions.multimodal import audio_features, audio_resample

    rows = C.q_audio_features(spark, sf_dir).collect()
    n = min(C._t(spark, sf_dir, "documents").count(), 200)
    assert len(rows) == n
    assert all(r["decode_ok"] for r in rows)
    assert all(r["duration_ms"] == 250 and r["sr"] == 8000 for r in rows)
    assert all(200.0 <= r["dominant_hz"] <= 3000.0 for r in rows)
    # corrupt payload: a row, not an exception
    bad = spark.createDataFrame(
        pd.DataFrame({"audio_id": ["x"], "bytes": [b"notaudio" + b"\0" * 16]})
    )
    out = audio_features(bad).collect()
    assert len(out) == 1 and out[0]["decode_ok"] is False and out[0]["rms"] is None
    # resample kernel: distributed path halves the sample count
    from crawler_spark.functions.multimodal import attach_synthetic_audio

    docs = C._t(spark, sf_dir, "documents").limit(5)
    rs = audio_resample(attach_synthetic_audio(docs, "doc_id"), 4000).collect()
    assert all(r["sr"] == 4000 and r["n_samples"] == 1000 for r in rs)


def test_wav_implausible_fmt_fields_are_value_errors():
    """fmt fields come off the wire unvalidated: a parseable RIFF whose
    sample rate exceeds int32 (or zero channels / frame-misaligned
    data) must raise ValueError at decode — callers turn that into a
    decode_ok=False ROW; surviving decode would instead kill the whole
    Spark task at Arrow int32 conversion of the sr column."""

    def wav_with(ch=1, sr=8000, n_bytes=4):
        fmt = struct.pack("<HHIIHH", 1, ch, sr, 1, 2, 16)
        body = b"fmt " + struct.pack("<I", len(fmt)) + fmt
        body += b"data" + struct.pack("<I", n_bytes) + b"\x00" * n_bytes
        return b"RIFF" + struct.pack("<I", 4 + len(body)) + b"WAVE" + body

    for bad in (
        wav_with(sr=0xFFFFFFFF),
        wav_with(sr=0),
        wav_with(ch=0),
        wav_with(ch=3, n_bytes=4),  # 2 samples over 3 channels
    ):
        with pytest.raises(ValueError):
            AU.decode_wav(bad)
    AU.decode_wav(wav_with())  # the plausible control still decodes


def test_audio_features_row_not_crash_on_sr_overflow(spark):
    import pandas as pd

    from crawler_spark.functions.multimodal import audio_features

    fmt = struct.pack("<HHIIHH", 1, 1, 0xFFFFFFFF, 1, 2, 16)
    body = b"fmt " + struct.pack("<I", len(fmt)) + fmt
    body += b"data" + struct.pack("<I", 4) + b"\x00" * 4
    wav = b"RIFF" + struct.pack("<I", 4 + len(body)) + b"WAVE" + body
    out = audio_features(
        spark.createDataFrame(pd.DataFrame({"audio_id": ["x"], "bytes": [wav]}))
    ).collect()
    assert len(out) == 1 and out[0]["decode_ok"] is False and out[0]["sr"] is None


def test_tone_secondary_component_below_nyquist():
    """The 0.2-amplitude component must be a true octave (above or
    below f0), never an alias: for every possible f0 the second tone
    sits strictly below sr/2 and at a 2:1 ratio to f0."""
    sr = 8000
    for step in range(28):
        f0 = 200.0 + step * 100.0
        f1 = f0 * 2.0 if f0 * 2.0 < sr / 2.0 else f0 / 2.0
        assert f1 < sr / 2.0, (f0, f1)
        assert f1 / f0 in (2.0, 0.5)
    # and the dominant frequency is still recovered for a high-f0 clip
    for k in range(28):
        rng = np.random.default_rng((42, k))
        if 200.0 + float(rng.integers(0, 28)) * 100.0 > 2000.0:
            b = AU.gen_tone(42, k)
            x, srr = AU.decode_wav(b)
            f = AU.features(x, srr)
            rng = np.random.default_rng((42, k))
            f0 = 200.0 + float(rng.integers(0, 28)) * 100.0
            assert abs(f["dominant_hz"] - f0) <= srr / f["n_samples"] + 1e-9
            break


def test_adpcm_roundtrip_fidelity_and_exactness():
    """IMA ADPCM (format 0x11): the decoder is bit-deterministic pure
    integer; a linear ramp survives encode->decode EXACTLY (the
    quantizer tracks constant slopes), tones keep their FFT-dominant
    pitch, and mono/stereo shapes round-trip."""
    sr = 8000
    ramp = np.linspace(-2000, 2000, 4001).astype(np.int16)
    dec, sr2 = AU.decode_wav(AU.encode_adpcm_wav(ramp, sr))
    assert sr2 == sr and dec.shape == (4001, 1)
    assert np.array_equal(dec[:, 0], ramp)
    tone = AU.gen_tone(42, 3)
    pcm, _ = AU.decode_wav(tone)
    dec2, _ = AU.decode_wav(AU.encode_adpcm_wav(pcm[:, 0], sr))
    assert dec2.shape == pcm.shape  # fact chunk trims block padding
    assert (
        AU.features(dec2, sr)["dominant_hz"] == AU.features(pcm, sr)["dominant_hz"]
    )
    stereo = np.stack([pcm[:, 0], (pcm[:, 0] // 2).astype(np.int16)], axis=1)
    dec3, _ = AU.decode_wav(AU.encode_adpcm_wav(stereo, sr))
    assert dec3.shape == stereo.shape
    # channels decode independently (interleaved 4-byte groups): each
    # channel's error matches its own mono-encode error, and the
    # half-amplitude channel is proportionally cleaner
    err = np.abs(dec3.astype(np.int64) - stereo.astype(np.int64)).mean(axis=0)
    mono_err = np.abs(dec2[:, 0].astype(np.int64) - pcm[:, 0].astype(np.int64)).mean()
    assert abs(err[0] - mono_err) < 1e-9  # identical bitstream per channel
    assert err[1] < err[0]


def test_adpcm_corrupt_inputs_raise_valueerror():
    """ADPCM wire fields are untrusted: an out-of-range step index,
    an implausible block align, or a fact count past the decoded data
    raise ValueError (decode_ok=False rows), never IndexError."""
    sr = 8000
    x = np.arange(0, 2000, dtype=np.int16)
    good = AU.encode_adpcm_wav(x, sr)
    at = good.find(b"data") + 8
    bad = bytearray(good)
    bad[at + 2] = 200  # step index > 88
    with pytest.raises(ValueError, match="step index"):
        AU.decode_wav(bytes(bad))
    bad = bytearray(good)
    fmt_at = good.find(b"fmt ") + 8
    struct.pack_into("<H", bad, fmt_at + 12, 6)  # block_align below header
    with pytest.raises(ValueError, match="block align"):
        AU.decode_wav(bytes(bad))
    bad = bytearray(good)
    fact_at = good.find(b"fact") + 8
    struct.pack_into("<I", bad, fact_at, 10**6)
    with pytest.raises(ValueError, match="fact count"):
        AU.decode_wav(bytes(bad))


def test_audio_corpus_contains_real_adpcm_rows(spark, sf_dir):
    """Every 4th corpus clip is a real format-0x11 ADPCM file and
    still feature-extracts through the codec-blind kernel."""
    from crawler_spark import contract as C
    from crawler_spark.functions.multimodal import attach_synthetic_audio

    docs = C._t(spark, sf_dir, "documents").limit(20)
    rows = attach_synthetic_audio(docs, "doc_id").collect()
    kinds = {r["audio_id"]: r["fmt"] for r in rows}
    assert "wav-adpcm" in set(kinds.values()) and "wav" in set(kinds.values())
    for r in rows:
        fmt_tag = 0x11 if r["fmt"] == "wav-adpcm" else 1
        at = bytes(r["bytes"]).find(b"fmt ") + 8
        assert struct.unpack_from("<H", bytes(r["bytes"]), at)[0] == fmt_tag
