"""Multimodal (image/audio/video-shaped) column plumbing.

Binary payloads are opaque ``binary`` columns + typed metadata — the
input_hint table shape (image_id, bytes, w, h, fmt, caption, phash).
Real decode for the two in-repo codecs (crawler_spark.images: PNG +
deterministic lossy stand-in); audio/video decoding has no library in
this container, so those steps are deterministic fakes behind the same
Spark plumbing (schema, batch shape, partitioning) — swap the kernel,
keep the plan.

Everything is ``mapInPandas``/``pandas_udf`` over Arrow batches; bytes
never enter a shuffle (operators take/return the metadata projection
and join payloads back by id when needed — project early, join late).
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .. import images as I

DECODED_META = T.StructType(
    [
        T.StructField("image_id", T.StringType(), False),
        T.StructField("dec_w", T.IntegerType(), True),
        T.StructField("dec_h", T.IntegerType(), True),
        T.StructField("dec_phash", T.LongType(), True),
        T.StructField("mean_luma", T.DoubleType(), True),
        T.StructField("decode_ok", T.BooleanType(), False),
    ]
)


def decode_meta(images: DataFrame) -> DataFrame:
    """Decode every payload → measured (w, h, phash, mean luma).

    The check column ``decode_ok`` is False (with NULL metrics) for
    corrupt payloads instead of failing the task — bad bytes at 100 TB
    are data, not exceptions.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {k.name: [] for k in DECODED_META.fields}
            for img_id, data, fmt in zip(pdf["image_id"], pdf["bytes"], pdf["fmt"]):
                try:
                    px = I.decode_image(bytes(data), str(fmt))
                    out["image_id"].append(img_id)
                    out["dec_w"].append(px.shape[1])
                    out["dec_h"].append(px.shape[0])
                    out["dec_phash"].append(I.phash64(px))
                    # Rec.601 luma, the same weights phash64 and
                    # image_embedding use — an unweighted RGB mean
                    # reports 85.0 for saturated blue where luma is 29.1
                    luma = px.astype(np.float64) @ np.array([0.299, 0.587, 0.114])
                    out["mean_luma"].append(float(np.round(luma.mean(), 4)))
                    out["decode_ok"].append(True)
                except Exception:
                    out["image_id"].append(img_id)
                    out["dec_w"].append(None)
                    out["dec_h"].append(None)
                    out["dec_phash"].append(None)
                    out["mean_luma"].append(None)
                    out["decode_ok"].append(False)
            yield pd.DataFrame(out)

    return images.select("image_id", "bytes", "fmt").mapInPandas(run, schema=DECODED_META)


IMAGE_STATS = T.StructType(
    [
        T.StructField("image_id", T.StringType(), False),
        T.StructField("mean_luma", T.DoubleType(), True),
        T.StructField("entropy_cb", T.LongType(), True),
        T.StructField("contrast_cb", T.LongType(), True),
        T.StructField("flat_share_bp", T.LongType(), True),
        T.StructField("decode_ok", T.BooleanType(), False),
    ]
)


def image_stats(images: DataFrame) -> DataFrame:
    """Per-image visual-quality statistics for corpus gating: Shannon
    entropy of the 8-bit luma histogram (centibits, 0-800), luma
    standard deviation (centi-units), and flat-run share (fraction of
    horizontally-adjacent equal luma pixels, basis points) — the
    signals that catch blank/flat/synthetic-banner images a trained
    corpus should drop.  All stats are emitted as integers so the gate
    thresholds are representation-exact.

    One Arrow kernel over (image_id, bytes, fmt); bytes never shuffle
    (project early, join late — same discipline as decode_meta)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {k.name: [] for k in IMAGE_STATS.fields}
            for img_id, data, fmt in zip(pdf["image_id"], pdf["bytes"], pdf["fmt"]):
                out["image_id"].append(img_id)
                try:
                    px = I.decode_image(bytes(data), str(fmt))
                    luma = px.astype(np.float64) @ np.array([0.299, 0.587, 0.114])
                    lu8 = np.clip(np.round(luma), 0, 255).astype(np.uint8)
                    hist = np.bincount(lu8.ravel(), minlength=256)
                    p = hist[hist > 0] / lu8.size
                    entropy = float(-(p * np.log2(p)).sum())
                    if lu8.shape[1] > 1:
                        flat = float((lu8[:, :-1] == lu8[:, 1:]).mean())
                    else:
                        flat = 1.0
                    out["mean_luma"].append(float(np.round(luma.mean(), 4)))
                    out["entropy_cb"].append(int(round(entropy * 100)))
                    out["contrast_cb"].append(int(round(float(luma.std()) * 100)))
                    out["flat_share_bp"].append(int(round(flat * 10_000)))
                    out["decode_ok"].append(True)
                except Exception:
                    out["mean_luma"].append(None)
                    out["entropy_cb"].append(None)
                    out["contrast_cb"].append(None)
                    out["flat_share_bp"].append(None)
                    out["decode_ok"].append(False)
            yield pd.DataFrame(out)

    return images.select("image_id", "bytes", "fmt").mapInPandas(
        run, schema=IMAGE_STATS
    )


RESIZED = T.StructType(
    [
        T.StructField("image_id", T.StringType(), False),
        T.StructField("bytes", T.BinaryType(), True),
        T.StructField("w", T.IntegerType(), True),
        T.StructField("h", T.IntegerType(), True),
        T.StructField("fmt", T.StringType(), True),
    ]
)


def resize(images: DataFrame, out_w: int, out_h: int) -> DataFrame:
    """Block-mean resize of every decodable payload, re-encoded PNG.

    Real kernel (no interpolation library needed: index-binned mean,
    the same construction phash64 uses).  Undecodable payloads pass
    through as NULL bytes (bad bytes are data, not task failures —
    same contract as audio_resample/decode_meta)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {k.name: [] for k in RESIZED.fields}
            for img_id, data, fmt in zip(pdf["image_id"], pdf["bytes"], pdf["fmt"]):
                try:
                    px = I.decode_image(
                        bytes(data) if data is not None else b"", str(fmt)
                    ).astype(np.float64)
                except Exception:
                    rows["image_id"].append(img_id)
                    for k in ("bytes", "w", "h", "fmt"):
                        rows[k].append(None)
                    continue
                h, w, _ = px.shape
                yi = (np.arange(out_h) * h) // out_h
                xi = (np.arange(out_w) * w) // out_w
                small = np.add.reduceat(np.add.reduceat(px, yi, axis=0), xi, axis=1)
                cnt = np.outer(np.diff(np.append(yi, h)), np.diff(np.append(xi, w)))
                # clamp: upsampling bins are zero-width and reduceat
                # already yields the single source row there (see
                # images.phash64)
                small = np.clip(
                    small / np.maximum(cnt, 1)[..., None], 0, 255
                ).astype(np.uint8)
                rows["image_id"].append(img_id)
                rows["bytes"].append(I.encode_png(small))
                rows["w"].append(out_w)
                rows["h"].append(out_h)
                rows["fmt"].append("png")
            yield pd.DataFrame(rows)

    return images.select("image_id", "bytes", "fmt").mapInPandas(run, schema=RESIZED)


EMBED_SCHEMA = T.StructType(
    [
        T.StructField("image_id", T.StringType(), False),
        T.StructField("embedding", T.ArrayType(T.FloatType()), True),
    ]
)


def image_embedding(images: DataFrame, dim: int = 64) -> DataFrame:
    """Feature extraction: decoded pixels → L2-normalized feature vector.

    STAND-IN model (no vision library in this container): 4×4 block
    luma means + channel histograms, deterministic.  The Spark-side
    contract (schema, Arrow batching, normalization) is the real
    production shape — swap this kernel for an ONNX/torch call.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, vecs = [], []
            for img_id, data, fmt in zip(pdf["image_id"], pdf["bytes"], pdf["fmt"]):
                try:
                    px = I.decode_image(
                        bytes(data) if data is not None else b"", str(fmt)
                    ).astype(np.float64)
                except Exception:
                    # bad bytes are data: NULL embedding, not a dead task
                    ids.append(img_id)
                    vecs.append(None)
                    continue
                h, w, _ = px.shape
                luma = px @ np.array([0.299, 0.587, 0.114])
                yi = (np.arange(4) * h) // 4
                xi = (np.arange(4) * w) // 4
                blocks = np.add.reduceat(np.add.reduceat(luma, yi, axis=0), xi, axis=1)
                cnt = np.outer(np.diff(np.append(yi, h)), np.diff(np.append(xi, w)))
                feat = [(blocks / np.maximum(cnt, 1)).flatten() / 255.0]
                for c in range(3):
                    hist, _ = np.histogram(px[..., c], bins=16, range=(0, 256))
                    feat.append(hist / max(1, h * w))
                v = np.concatenate(feat)
                if len(v) < dim:
                    v = np.pad(v, (0, dim - len(v)))
                v = v[:dim]
                n = np.linalg.norm(v)
                vecs.append((v / n if n > 0 else v).astype(np.float32).tolist())
                ids.append(img_id)
            yield pd.DataFrame({"image_id": ids, "embedding": vecs})

    return images.select("image_id", "bytes", "fmt").mapInPandas(run, schema=EMBED_SCHEMA)


def frame_sample(video: DataFrame, every_n: int = 8) -> DataFrame:
    """Video frame sampling over the repo's REAL MJV1 motion-frame
    container (crawler_spark.video): walk the length-prefix index, emit
    every n-th frame's still payload (real PNG/JPEG bytes, no
    re-encode) plus its decoded perceptual hash.

    Skipped frames are never decoded — independently-coded frames are
    what makes sampling O(sampled) instead of O(stream), the property a
    100 TB frame-sampling pipeline is built around.  Inter-coded
    containers (MP4/WebM) raise NotImplementedError from the container
    layer (no av library in this sandbox); this mapInPandas plan is
    unchanged whichever decoder sits below.
    """
    from .. import video as V

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            vids, idxs, frames, hashes = [], [], [], []
            for vid, data in zip(pdf["image_id"], pdf["bytes"]):
                raw = bytes(data) if data is not None else b""
                try:
                    for i, off, ln in V.iter_frame_offsets(raw):
                        if i % every_n:
                            continue
                        vids.append(vid)
                        idxs.append(i)
                        frames.append(raw[off : off + ln])
                        hashes.append(I.phash64(V.decode_frame(raw, off, ln)))
                except ValueError:
                    # truncated/garbage MJV1: keep any frames already
                    # validated, stop at the corruption point (bad bytes
                    # are data).  NotImplementedError (foreign MP4/WebM
                    # container) stays a loud failure — that is a
                    # declared capability gap, not corrupt input.
                    continue
            yield pd.DataFrame(
                {"image_id": vids, "frame_idx": idxs, "frame": frames,
                 "frame_phash": pd.Series(hashes, dtype="int64")}
            )

    schema = T.StructType(
        [
            T.StructField("image_id", T.StringType(), False),
            T.StructField("frame_idx", T.IntegerType(), False),
            T.StructField("frame", T.BinaryType(), False),
            T.StructField("frame_phash", T.LongType(), False),
        ]
    )
    return video.select("image_id", "bytes").mapInPandas(run, schema=schema)


def video_demux(
    video: DataFrame, every_n: int = 1, keyframes_only: bool = False
) -> DataFrame:
    """Container-uniform DEMUX over binary video columns: one row per
    selected sample with its exact byte range, timestamp, sync flag
    and encoded payload — MJV1 (repo container) and real ISO-BMFF
    (MP4, pure-spec sample tables in crawler_spark.mp4) both dispatch
    through video.demux_samples.

    This is the demux half of frame sampling a 100 TB pipeline runs on
    every worker: select the key/n-th samples HERE (no payload bytes
    touched for skipped samples, no pixel decode at all) and ship only
    the selected encoded payloads to the decode stage.  Pixel decode
    of MP4 codec payloads stays a declared NotImplementedError
    (mp4.decode_sample) — the av-library gap — while MJV1 payloads
    remain fully decodable (frame_sample above).

    ``keyframes_only`` selects sync samples (random-access points);
    ``every_n`` then thins the selection.  WebM demuxes too (real EBML
    walk, crawler_spark.webm); only AVI raises loudly (declared
    av-library gap).  Truncated/garbage bytes contribute nothing for
    that row (ValueError swallowed — bad bytes are data), like
    frame_sample.
    """
    from .. import video as V

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            vids, idxs, offs, lens, dtss, syncs, payloads = [], [], [], [], [], [], []
            for vid, data in zip(pdf["image_id"], pdf["bytes"]):
                raw = bytes(data) if data is not None else b""
                try:
                    rows = V.demux_samples(raw)
                except ValueError:
                    continue  # not a video / corrupt header: bad bytes are data
                if keyframes_only:
                    rows = [r for r in rows if r[4]]
                for k, (idx, off, ln, dts_ms, is_sync) in enumerate(rows):
                    if k % every_n:
                        continue
                    vids.append(vid)
                    idxs.append(idx)
                    offs.append(off)
                    lens.append(ln)
                    dtss.append(dts_ms)
                    syncs.append(is_sync)
                    payloads.append(raw[off : off + ln])
            yield pd.DataFrame(
                {
                    "image_id": vids,
                    "sample_idx": pd.Series(idxs, dtype="int32"),
                    "byte_offset": pd.Series(offs, dtype="int64"),
                    "n_bytes": pd.Series(lens, dtype="int64"),
                    "dts_ms": pd.Series(dtss, dtype="int64"),
                    "is_sync": pd.Series(syncs, dtype="bool"),
                    "payload": payloads,
                }
            )

    schema = T.StructType(
        [
            T.StructField("image_id", T.StringType(), False),
            T.StructField("sample_idx", T.IntegerType(), False),
            T.StructField("byte_offset", T.LongType(), False),
            T.StructField("n_bytes", T.LongType(), False),
            T.StructField("dts_ms", T.LongType(), False),
            T.StructField("is_sync", T.BooleanType(), False),
            T.StructField("payload", T.BinaryType(), False),
        ]
    )
    return video.select("image_id", "bytes").mapInPandas(run, schema=schema)


def attach_synthetic_videos(
    df: DataFrame,
    id_col: str,
    seed: int = 42,
    w: int = 24,
    h: int = 20,
    n_frames: int = 12,
    container: str = "mjv1",
) -> DataFrame:
    """Derive a deterministic clip per row from an integer id (real
    containers, real PNG/JPEG frames — crawler_spark.video / .mp4);
    the video analogue of attach_synthetic_images below.

    ``container``: ``"mjv1"`` (default), ``"mp4"`` / ``"fmp4"`` /
    ``"webm"`` / ``"avi"`` (the SAME encoded frame payloads re-wrapped
    in a spec-valid progressive ISO-BMFF / movie-fragmented DASH-style
    ISO-BMFF / Matroska / RIFF-AVI file, sync samples every 4th
    frame), or ``"mixed"`` (ids cycle mjv1/mp4/fmp4/webm/avi by k%5 —
    exercises the container-uniform demux path across all five)."""
    from .. import avi as AV
    from .. import mp4 as M
    from .. import video as V
    from .. import webm as WB

    def clip(k: int) -> tuple[bytes, str]:
        fmt = "png" if k % 2 == 0 else "jpg"
        mjv = V.gen_video(seed, k, w, h, n_frames, fmt)
        kind = container
        if container == "mixed":
            kind = ("mjv1", "mp4", "fmp4", "webm", "avi")[k % 5]
        if kind == "mjv1":
            return mjv, fmt
        payloads = [mjv[o : o + ln] for _, o, ln in V.iter_frame_offsets(mjv)]
        fps = max(1, int(V.probe(mjv)["fps"]))
        keys = set(range(0, n_frames, 4))
        if kind == "mp4":
            return M.mux(payloads, w, h, fps=fps, keyframes=keys, codec=b"mjpa"), fmt
        if kind == "fmp4":
            return (
                M.mux_fragmented(payloads, w, h, fps=fps, keyframes=keys),
                fmt,
            )
        if kind == "avi":
            return AV.mux(payloads, w, h, fps=fps, keyframes=keys), fmt
        return WB.mux(payloads, w, h, fps=fps, keyframes=keys), fmt

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {"image_id": [], "bytes": [], "n_frames": [], "fmt": []}
            for k in pdf[id_col].to_numpy():
                k = int(k)
                data, fmt = clip(k)
                rows["image_id"].append(f"vid-{k:012d}")
                rows["bytes"].append(data)
                rows["n_frames"].append(n_frames)
                rows["fmt"].append(fmt)
            yield pd.DataFrame(rows)

    schema = T.StructType(
        [
            T.StructField("image_id", T.StringType(), False),
            T.StructField("bytes", T.BinaryType(), False),
            T.StructField("n_frames", T.IntegerType(), False),
            T.StructField("fmt", T.StringType(), False),
        ]
    )
    return df.select(F.col(id_col)).mapInPandas(run, schema=schema)


def attach_synthetic_images(
    df: DataFrame, id_col: str, seed: int = 42, w: int = 32, h: int = 32
) -> DataFrame:
    """Derive a deterministic image payload per row from an integer id —
    lets multimodal operators run over driver-provided tables that have
    no binary column (plumbing demo; NOT used for fixtures)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ks = pdf[id_col].to_numpy()
            rows = {"image_id": [], "bytes": [], "w": [], "h": [], "fmt": []}
            for k in ks:
                k = int(k)
                fmt = "png" if k % 2 == 0 else "jpeg"
                px = I.gen_pixels(seed, k, w, h)
                rows["image_id"].append(f"img-{k:012d}")
                rows["bytes"].append(I.encode_image(px, fmt))
                rows["w"].append(w)
                rows["h"].append(h)
                rows["fmt"].append(fmt)
            yield pd.DataFrame(rows)

    schema = T.StructType(
        [
            T.StructField("image_id", T.StringType(), False),
            T.StructField("bytes", T.BinaryType(), False),
            T.StructField("w", T.IntegerType(), False),
            T.StructField("h", T.IntegerType(), False),
            T.StructField("fmt", T.StringType(), False),
        ]
    )
    return df.select(F.col(id_col)).mapInPandas(run, schema=schema)


def transcode(
    images: DataFrame, to_fmt: str, id_suffix: str | None = None
) -> DataFrame:
    """Decode → re-encode every payload as ``to_fmt`` (Arrow-batched
    mapInPandas, bytes never shuffle).  With the lossy ``'jpg'`` codec
    this manufactures realistic recompressed near-duplicates — the
    standard web-crawl phenomenon image dedup must catch (same picture,
    different bytes, phash within a few bits).  Corrupt payloads are
    dropped, mirroring decode_meta's bad-bytes-are-data stance.

    ``id_suffix`` (default ``~<to_fmt>``) distinguishes the copy from
    its source in downstream pair output."""
    sfx = id_suffix if id_suffix is not None else f"~{to_fmt}"

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {"image_id": [], "bytes": [], "w": [], "h": [], "fmt": []}
            for img_id, data, fmt in zip(pdf["image_id"], pdf["bytes"], pdf["fmt"]):
                try:
                    px = I.decode_image(bytes(data), str(fmt))
                except Exception:
                    continue
                rows["image_id"].append(f"{img_id}{sfx}")
                rows["bytes"].append(I.encode_image(px, to_fmt))
                # dimensions from the decoded pixels, not the (nullable)
                # metadata columns — a null w/h must not fail the task
                rows["w"].append(int(px.shape[1]))
                rows["h"].append(int(px.shape[0]))
                rows["fmt"].append(to_fmt)
            yield pd.DataFrame(rows)

    return images.select("image_id", "bytes", "fmt").mapInPandas(run, schema=RESIZED)


RECOMPRESS_PSNR = T.StructType(
    [
        T.StructField("image_id", T.StringType(), False),
        T.StructField("psnr_db", T.DoubleType(), True),
        T.StructField("pass_40db", T.BooleanType(), True),
    ]
)


def recompress_psnr(
    images: DataFrame, to_fmt: str, cap_db: float = 99.0
) -> DataFrame:
    """The input_hint per-row invariant (decoded-pixel PSNR ≥ 40 dB for
    lossy) as a dataset operator: decode → re-encode as ``to_fmt`` →
    decode again → PSNR(original, recompressed), all inside ONE Arrow
    batch kernel — bytes never shuffle, only the id and two scalars
    leave the executor.  Lossless round-trips (infinite PSNR) are
    capped at ``cap_db`` so the column stays finite and hashable;
    undecodable payloads yield NULL psnr with ``pass_40db = False``
    (bad bytes are data, not exceptions)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, vals, ok = [], [], []
            for img_id, data, fmt in zip(pdf["image_id"], pdf["bytes"], pdf["fmt"]):
                ids.append(img_id)
                try:
                    px = I.decode_image(bytes(data), str(fmt))
                    rt = I.decode_image(I.encode_image(px, to_fmt), to_fmt)
                    db = min(I.psnr(px, rt), cap_db)
                    vals.append(round(db, 2))
                    ok.append(db >= 40.0)
                except Exception:
                    vals.append(None)
                    ok.append(False)
            yield pd.DataFrame({"image_id": ids, "psnr_db": vals, "pass_40db": ok})

    return images.select("image_id", "bytes", "fmt").mapInPandas(
        run, schema=RECOMPRESS_PSNR
    )


# --------------------------------------------------------------- audio
# Same plumbing contract as the image/video kernels: binary column in,
# metadata projection out via ONE mapInPandas, bytes never shuffle.
# The codec underneath (crawler_spark.audio) is REAL — RIFF/WAVE PCM16.

from .. import audio as AU  # noqa: E402  (modality kernels grouped here)

AUDIO_META = T.StructType(
    [
        T.StructField("audio_id", T.StringType(), False),
        T.StructField("sr", T.IntegerType(), True),
        T.StructField("n_samples", T.LongType(), True),
        T.StructField("duration_ms", T.LongType(), True),
        T.StructField("rms", T.DoubleType(), True),
        T.StructField("zcr", T.DoubleType(), True),
        T.StructField("dominant_hz", T.DoubleType(), True),
        T.StructField("decode_ok", T.BooleanType(), False),
    ]
)


def audio_features(audio: DataFrame) -> DataFrame:
    """Decode every WAV payload → scalar feature row (duration, RMS,
    zero-crossing rate, FFT-dominant frequency).  Corrupt payloads
    yield decode_ok=False with NULL features — bad bytes are data."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {k.name: [] for k in AUDIO_META.fields}
            for aid, data in zip(pdf["audio_id"], pdf["bytes"]):
                rows["audio_id"].append(aid)
                try:
                    x, sr = AU.decode_wav(bytes(data))
                    f = AU.features(x, sr)
                    rows["sr"].append(sr)
                    rows["n_samples"].append(f["n_samples"])
                    rows["duration_ms"].append(f["duration_ms"])
                    rows["rms"].append(f["rms"])
                    rows["zcr"].append(f["zcr"])
                    rows["dominant_hz"].append(f["dominant_hz"])
                    rows["decode_ok"].append(True)
                except Exception:
                    for k in ("sr", "n_samples", "duration_ms", "rms", "zcr", "dominant_hz"):
                        rows[k].append(None)
                    rows["decode_ok"].append(False)
            yield pd.DataFrame(rows)

    return audio.select("audio_id", "bytes").mapInPandas(run, schema=AUDIO_META)


AUDIO_RESAMPLED = T.StructType(
    [
        T.StructField("audio_id", T.StringType(), False),
        T.StructField("bytes", T.BinaryType(), True),
        T.StructField("sr", T.IntegerType(), True),
        T.StructField("n_samples", T.LongType(), True),
    ]
)


def audio_resample(audio: DataFrame, to_sr: int) -> DataFrame:
    """Decode → linear resample to ``to_sr`` → re-encode WAV, one Arrow
    kernel per batch.  Undecodable payloads pass through as NULL bytes
    rather than failing the task."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {k.name: [] for k in AUDIO_RESAMPLED.fields}
            for aid, data in zip(pdf["audio_id"], pdf["bytes"]):
                rows["audio_id"].append(aid)
                try:
                    x, sr = AU.decode_wav(bytes(data))
                    y = AU.resample_linear(x, sr, to_sr)
                    rows["bytes"].append(AU.encode_wav(y, to_sr))
                    rows["sr"].append(to_sr)
                    rows["n_samples"].append(y.shape[0])
                except Exception:
                    rows["bytes"].append(None)
                    rows["sr"].append(None)
                    rows["n_samples"].append(None)
            yield pd.DataFrame(rows)

    return audio.select("audio_id", "bytes").mapInPandas(run, schema=AUDIO_RESAMPLED)


def attach_synthetic_audio(df: DataFrame, id_col: str, seed: int = 42, sr: int = 8000) -> DataFrame:
    """Deterministic WAV payload per integer id (plumbing demo, like
    attach_synthetic_images).  Every 4th id is re-encoded as a real
    IMA ADPCM WAV (format tag 0x11) — the decoder dispatches on the
    fmt chunk, so downstream feature extraction is codec-blind."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {"audio_id": [], "bytes": [], "sr": [], "fmt": []}
            for k in pdf[id_col].to_numpy():
                k = int(k)
                wav = AU.gen_tone(seed, k, sr=sr)
                fmt = "wav"
                if k % 4 == 3:
                    pcm, _ = AU.decode_wav(wav)
                    wav = AU.encode_adpcm_wav(pcm[:, 0], sr)
                    fmt = "wav-adpcm"
                rows["audio_id"].append(f"aud-{k:012d}")
                rows["bytes"].append(wav)
                rows["sr"].append(sr)
                rows["fmt"].append(fmt)
            yield pd.DataFrame(rows)

    schema = T.StructType(
        [
            T.StructField("audio_id", T.StringType(), False),
            T.StructField("bytes", T.BinaryType(), False),
            T.StructField("sr", T.IntegerType(), False),
            T.StructField("fmt", T.StringType(), False),
        ]
    )
    return df.select(id_col).mapInPandas(run, schema=schema)
