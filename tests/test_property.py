"""Property-based (hypothesis) pins for the pure-Python kernels the
engine's correctness rests on: codec round-trips and the golden xxhash
model.  These run WITHOUT Spark (pure numpy/Python), so hypothesis can
afford hundreds of adversarial examples per property — fixed-vector
codec tests live in test_images/test_audio; these cover the input
space between them."""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st
from hypothesis.extra.numpy import arrays

from crawler_spark import audio as A
from crawler_spark import images as I
from crawler_spark import video as V
from crawler_spark.hashing import xxhash64_bytes


@settings(max_examples=60, deadline=None)
@given(
    arrays(
        np.uint8,
        st.tuples(
            st.integers(1, 24), st.integers(1, 24), st.just(3)
        ),
    )
)
def test_png_roundtrip_identity_property(px):
    """PNG is lossless over the FULL uint8 space: decode(encode(x)) == x
    for arbitrary pixel content (the fixed-vector test only covers
    gen_pixels textures)."""
    assert np.array_equal(I.decode_png(I.encode_png(px)), px)


@settings(max_examples=60, deadline=None)
@given(
    arrays(np.int16, st.integers(1, 2000)),
    st.sampled_from([8000, 16000, 44100]),
)
def test_wav_pcm16_roundtrip_identity_property(samples, sr):
    """RIFF/WAVE PCM16 is lossless: decode(encode(x, sr)) == (x, sr)
    for arbitrary int16 signals including INT16_MIN edge values."""
    data = A.encode_wav(samples, sr)
    back, back_sr = A.decode_wav(data)
    assert back_sr == sr
    # decode returns (frames, channels); the mono input round-trips
    assert np.array_equal(back.reshape(-1), samples)


@settings(max_examples=120, deadline=None)
@given(st.binary(min_size=0, max_size=200))
def test_xxhash64_incremental_boundaries_property(data):
    """The golden XXH64 model is deterministic and total across the
    32-byte/8-byte/4-byte/1-byte tail boundaries hypothesis will hit;
    equal inputs hash equal, and a single flipped bit changes the hash
    (sanity, not a cryptographic claim)."""
    h = xxhash64_bytes(data)
    assert h == xxhash64_bytes(data)
    if data:
        flipped = bytearray(data)
        flipped[0] ^= 0x01
        assert xxhash64_bytes(bytes(flipped)) != h


@settings(max_examples=25, deadline=None)
@given(
    st.integers(0, 2**31 - 1),
    st.integers(1, 6),
    st.integers(2, 5),
)
def test_video_container_roundtrip_property(seed, n_frames, size):
    """MJV1 container: probe reports the written geometry and every
    frame decodes to the declared shape, for arbitrary seeds/frame
    counts/sizes."""
    w = h = size * 4
    data = V.gen_video(seed=seed, k=3, w=w, h=h, n_frames=n_frames)
    meta = V.probe(data)
    assert meta["n_frames"] == n_frames and meta["w"] == w and meta["h"] == h
    offs = list(V.iter_frame_offsets(data))
    assert len(offs) == n_frames
    fi, off, ln = offs[-1]
    px = V.decode_frame(data, off, ln)
    assert px.shape == (h, w, 3)


# ---- cuckoo-filter kernel: arbitrary insert/delete interleavings may
# never lose a live key (false negative = a silently re-fetched URL)
@settings(max_examples=40, deadline=None)
@given(
    st.lists(
        st.tuples(st.sampled_from(["ins", "del"]), st.integers(-(2**62), 2**62 - 1)),
        min_size=1,
        max_size=300,
    ),
    st.sampled_from([64, 256]),
)
def test_cuckoo_interleaved_ops_no_false_negatives_property(ops, m):
    from crawler_spark.operators import dedup_cuckoo as DC

    table = np.zeros((m, DC._SLOTS), dtype=np.uint16)
    live: set[int] = set()
    for op, key in ops:
        arr = np.array([key], dtype=np.int64)
        if op == "ins":
            if key in live:  # engine never double-inserts a live key
                continue
            left = DC._insert_with_undo(table, arr)
            if not left[0]:
                live.add(key)
        else:
            if key not in live:  # only inserted keys may be deleted
                continue
            deleted = DC._delete(table, arr)
            assert deleted[0], "a live key must be deletable"
            live.discard(key)
        if live:
            h = np.fromiter(live, dtype=np.int64)
            assert DC._lookup(table, h).all(), "live key lost (false negative)"


@settings(max_examples=200, deadline=None)
@given(st.binary(min_size=0, max_size=400), st.integers(0, 3))
def test_demux_never_leaks_unexpected_exceptions(blob, prefix_kind):
    """Container demux runs over UNTRUSTED crawled bytes inside a
    pandas UDF whose guard catches ValueError only — so for arbitrary
    input (including bytes wearing a valid magic) the demux layer must
    raise nothing but ValueError / NotImplementedError.  struct.error,
    IndexError, MemoryError or OverflowError escaping here kills the
    whole Spark job on one bad file."""
    from crawler_spark import video as V

    prefix = [
        b"",
        b"MJV1",
        b"\x00\x00\x00\x20ftyp",  # plausible BMFF header
        b"\x1a\x45\xdf\xa3",  # EBML magic
    ][prefix_kind]
    data = prefix + blob
    try:
        rows = V.demux_samples(data)
    except (ValueError, NotImplementedError):
        return
    # parsed successfully: every reported range must be sane
    for idx, off, size, dts_ms, is_sync in rows:
        assert 0 <= off <= len(data)
        assert 0 <= size <= len(data) - off


@settings(max_examples=200, deadline=None)
@given(st.binary(min_size=0, max_size=300), st.integers(0, 4))
def test_media_decoders_never_leak_unexpected_exceptions(blob, prefix_kind):
    """Same contract as the demux fuzz, for the pixel/PCM decoders:
    over untrusted bytes (including valid-magic prefixes) only
    ValueError / NotImplementedError may escape — struct.error,
    IndexError, KeyError, zlib.error or AssertionError here kills a
    Spark task on one bad crawled file."""
    from crawler_spark import audio as A
    from crawler_spark import images as I

    prefix = [
        b"",
        b"\x89PNG\r\n\x1a\n",
        b"\xff\xd8\xff\xe0",
        b"LQT1",
        b"RIFF\x24\x00\x00\x00WAVE",
    ][prefix_kind]
    data = prefix + blob
    for fn in (
        lambda d: I.decode_image(d, "png"),
        lambda d: I.decode_image(d, "lqt"),
        lambda d: A.decode_wav(d),
    ):
        try:
            fn(data)
        except (ValueError, NotImplementedError):
            pass
