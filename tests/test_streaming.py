"""Structured Streaming surface: stream/batch equivalence, watermark
late-data semantics, streaming dedup, and exactly-once sink replay."""

from __future__ import annotations

import glob
import json
import os
from datetime import datetime, timedelta

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from crawler_spark import streaming as ST

SCHEMA = T.StructType(
    [
        T.StructField("url_hash", T.LongType(), False),
        T.StructField("host", T.StringType(), False),
        T.StructField("ts", T.TimestampType(), False),
    ]
)

T0 = datetime(2026, 1, 1, 0, 0, 0)


def _write_batch(spark, path, rows, name):
    df = spark.createDataFrame(rows, SCHEMA).coalesce(1)
    df.write.mode("overwrite").parquet(os.path.join(path, name))
    # file source watches one directory level: move part files up
    src = glob.glob(os.path.join(path, name, "part-*.parquet"))
    assert src
    os.replace(src[0], os.path.join(path, f"{name}.parquet"))
    import shutil

    shutil.rmtree(os.path.join(path, name))


def _rows(spec):
    return [(h, f"host{h % 3}", T0 + timedelta(minutes=m)) for h, m in spec]


def test_windowed_counts_stream_equals_batch(spark, tmp_path):
    """The streamed watermarked window agg over N micro-batches must
    equal the one-shot batch aggregation over the same files (no late
    data in this case)."""
    src = str(tmp_path / "src")
    os.makedirs(src)
    _write_batch(spark, src, _rows([(1, 0), (2, 3), (3, 11)]), "b0")
    _write_batch(spark, src, _rows([(4, 12), (5, 14), (6, 25)]), "b1")

    stream = ST.read_parquet_stream(spark, src, SCHEMA)
    agg = ST.windowed_counts(stream, "ts", ["host"], "10 minutes", "10 minutes")
    q = (
        agg.writeStream.format("memory")
        .queryName("win_counts")
        .outputMode("complete")
        .start()
    )
    try:
        q.processAllAvailable()
        got = {
            (r["win_start"], r["host"]): r["n"]
            for r in spark.sql("SELECT * FROM win_counts").collect()
        }
    finally:
        q.stop()

    batch = ST.windowed_counts(
        spark.read.schema(SCHEMA).parquet(src), "ts", ["host"], "10 minutes"
    )
    want = {(r["win_start"], r["host"]): r["n"] for r in batch.collect()}
    assert got == want and len(want) > 2


def test_windowed_counts_drops_late_event(spark, tmp_path):
    """Append mode + watermark: an event arriving after the watermark
    passed its window is DROPPED (bounded state at 10^10 events); the
    closed window's count excludes it."""
    src = str(tmp_path / "src")
    os.makedirs(src)
    # batch 0 advances event time to minute 40 -> watermark 30; the
    # watermark-commit batch inside processAllAvailable finalizes (emits
    # + evicts) the 00:00-00:10 window with its two on-time events
    _write_batch(spark, src, _rows([(1, 0), (2, 5), (3, 40)]), "b0")

    stream = ST.read_parquet_stream(spark, src, SCHEMA)
    agg = ST.windowed_counts(stream, "ts", [], "10 minutes", "10 minutes")
    q = (
        agg.writeStream.format("memory")
        .queryName("late_counts")
        .outputMode("append")
        .start()
    )
    try:
        q.processAllAvailable()
        emitted = {
            r["win_start"]: r["n"]
            for r in spark.sql("SELECT * FROM late_counts").collect()
        }
        assert emitted == {T0: 2}, emitted
        # a minute-6 event now arrives behind the watermark: its window
        # state is gone, the row is dropped (bounded state is exactly
        # this discard); minute-41 keeps the stream moving
        _write_batch(spark, src, _rows([(9, 6), (4, 41)]), "b1")
        q.processAllAvailable()
        emitted = {
            r["win_start"]: r["n"]
            for r in spark.sql("SELECT * FROM late_counts").collect()
        }
    finally:
        q.stop()
    # the late minute-6 arrival did not reopen or re-emit the window
    assert emitted[T0] == 2 and len(emitted) == 1


def test_dedup_stream_emits_once_within_horizon(spark, tmp_path):
    src = str(tmp_path / "src")
    os.makedirs(src)
    _write_batch(spark, src, _rows([(1, 0), (2, 1)]), "b0")
    _write_batch(spark, src, _rows([(1, 2), (3, 3)]), "b1")  # 1 is a dup

    stream = ST.read_parquet_stream(spark, src, SCHEMA)
    ded = ST.dedup_stream(stream, ["url_hash"], "ts", "30 minutes")
    q = (
        ded.writeStream.format("memory")
        .queryName("dedup_out")
        .outputMode("append")
        .start()
    )
    try:
        q.processAllAvailable()
        got = sorted(
            r["url_hash"] for r in spark.sql("SELECT * FROM dedup_out").collect()
        )
    finally:
        q.stop()
    assert got == [1, 2, 3]


def test_idempotent_sink_replay_and_end_to_end(spark, tmp_path):
    """foreachBatch sink: re-applying a delivered batch id is a no-op
    (exactly-once on at-least-once redelivery), and the streamed rows
    land in parquet equal to the source."""
    src = str(tmp_path / "src")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(src)
    _write_batch(spark, src, _rows([(1, 0), (2, 1)]), "b0")
    _write_batch(spark, src, _rows([(3, 2)]), "b1")

    stream = ST.read_parquet_stream(spark, src, SCHEMA)
    q = ST.run_stream_to_parquet(stream, out, ckpt)
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    data = spark.read.parquet(os.path.join(out, "data"))
    assert sorted(r["url_hash"] for r in data.collect()) == [1, 2, 3]
    logs = sorted(glob.glob(os.path.join(out, "_applied_batches", "*.json")))
    assert len(logs) == 2
    applied = [json.load(open(p)) for p in logs]
    assert sum(a["rows"] for a in applied) == 3

    # simulate at-least-once redelivery of batch 0
    sink = ST.IdempotentParquetSink(out)
    sink(spark.createDataFrame(_rows([(1, 0), (2, 1)]), SCHEMA), 0)
    data2 = spark.read.parquet(os.path.join(out, "data"))
    assert data2.count() == 3, "replayed batch must not duplicate rows"
    # an unseen batch id DOES append
    sink(spark.createDataFrame(_rows([(7, 9)]), SCHEMA), 99)
    assert spark.read.parquet(os.path.join(out, "data")).count() == 4


def test_dedup_stream_requires_watermark_horizon(spark):
    # guard: operator is watermarked (bounded state) by construction
    df = spark.createDataFrame([], SCHEMA)
    ded = ST.dedup_stream(df, ["url_hash"], "ts", "5 minutes")
    assert "url_hash" in ded.columns
    with pytest.raises(Exception):
        ST.read_parquet_stream(None, "/nonexistent", SCHEMA)


def test_sessionize_stream_stateful(spark, tmp_path):
    """applyInPandasWithState sessionization: sessions close when the
    watermark passes end+gap (event-time timeout) or when a same-key
    batch arrives past the gap; state is removed on emit."""
    src = str(tmp_path / "src")
    os.makedirs(src)
    # user 1: events at minutes 0 and 5 (one session); user 2: minute 3
    _write_batch(spark, src, _rows_u([(1, 0), (1, 5), (2, 3)]), "b0")

    stream = ST.read_parquet_stream(spark, src, SCHEMA)
    sess = ST.sessionize_stream(
        stream, "url_hash", "ts", gap_sec=600, watermark_delay="10 minutes"
    )
    q = (
        sess.writeStream.format("memory")
        .queryName("sessions")
        .outputMode("append")
        .start()
    )
    try:
        q.processAllAvailable()
        # watermark still at minute -5..0ish: nothing closed yet
        # user 1 again at minute 60: advances the watermark far past
        # minute 5+gap AND is itself past the gap (double trigger: the
        # old session closes by arrival, user 2's by timeout)
        _write_batch(spark, src, _rows_u([(1, 60)]), "b1")
        q.processAllAvailable()
        got = {
            (r["key"], r["session_start"].minute, r["session_end"].minute, r["n_events"])
            for r in spark.sql("SELECT * FROM sessions").collect()
        }
        assert (1, 0, 5, 2) in got, got
        assert (2, 3, 3, 1) in got, got
        # the minute-60 session is still open (watermark 50 < 60+gap)
        assert all(k != 1 or s != 0 or e != 0 for k, s, e, _ in got)
        assert len(got) == 2, got
    finally:
        q.stop()


def _rows_u(spec):
    """(key, minute) rows — key doubles as the session key."""
    return [(k, f"host{k}", T0 + timedelta(minutes=m)) for k, m in spec]


def test_sessionize_splits_intra_batch_gaps(spark, tmp_path):
    """A catch-up micro-batch delivering events separated by more than
    the gap must yield MULTIPLE sessions (time-sorted segment split),
    matching what the batch sessionizer would produce."""
    src = str(tmp_path / "src")
    os.makedirs(src)
    # ONE batch for key 1: minutes 0,5 | hole | 30,32 | hole | 60
    _write_batch(
        spark, src, _rows_u([(1, 0), (1, 5), (1, 30), (1, 32), (1, 60)]), "b0"
    )
    stream = ST.read_parquet_stream(spark, src, SCHEMA)
    sess = ST.sessionize_stream(
        stream, "url_hash", "ts", gap_sec=600, watermark_delay="10 minutes"
    )
    q = (
        sess.writeStream.format("memory")
        .queryName("catchup_sessions")
        .outputMode("append")
        .start()
    )
    try:
        q.processAllAvailable()
        got = sorted(
            (r["session_start"].minute, r["session_end"].minute, r["n_events"])
            for r in spark.sql("SELECT * FROM catchup_sessions").collect()
        )
    finally:
        q.stop()
    # the two complete segments closed (by arrival and/or timeout: the
    # watermark from minute 60 is 50, past 32+10); minute-60 stays open
    assert got == [(0, 5, 2), (30, 32, 2)], got


def test_idempotent_sink_crash_between_write_and_marker(spark, tmp_path):
    """Replay after a crash that landed the data but not the marker must
    NOT duplicate rows: each batch overwrites its own partition dir."""
    out = str(tmp_path / "out")
    sink = ST.IdempotentParquetSink(out)
    df = spark.createDataFrame(_rows([(1, 0), (2, 1)]), SCHEMA)
    sink(df, 0)
    # simulate the crash: data landed, marker lost
    os.remove(os.path.join(out, "_applied_batches", "0.json"))
    sink(df, 0)  # redelivery
    data = spark.read.parquet(os.path.join(out, "data"))
    assert data.count() == 2, "replayed batch duplicated rows"
    assert sorted(r["url_hash"] for r in data.collect()) == [1, 2]


def test_pacing_stream_equals_batch_operator(spark, tmp_path):
    """pacing_stream over in-order micro-batches must emit exactly the
    batch pacing_schedule's rows (the contract pins the batch side
    against DuckDB; this pins the streaming twin against the batch)."""
    from crawler_spark.operators.politeness import pacing_schedule

    src = str(tmp_path / "src")
    os.makedirs(src)
    # host0: bursts arriving faster than the 120s delay; host1 sparse
    b0 = [(1, 0), (2, 0), (4, 1), (3, 0)]
    b1 = [(5, 10), (6, 10), (7, 30)]
    _write_batch(spark, src, _rows(b0), "b0")
    _write_batch(spark, src, _rows(b1), "b1")

    stream = ST.read_parquet_stream(spark, src, SCHEMA)
    paced = ST.pacing_stream(stream, delay_ms=120_000, watermark_sec=600)
    q = (
        paced.writeStream.format("memory")
        .queryName("paced")
        .outputMode("append")
        .start()
    )
    try:
        q.processAllAvailable()
        got = {
            (r["host"], r["url_hash"], r["ts_ms"], r["sched_ms"])
            for r in spark.sql("SELECT * FROM paced").collect()
        }
    finally:
        q.stop()

    batch_in = spark.createDataFrame(_rows(b0) + _rows(b1), SCHEMA).select(
        "host",
        "url_hash",
        F.unix_millis(F.col("ts").cast("timestamp_ltz")).alias("ts_ms"),
    )
    expect = {
        (r["host"], r["url_hash"], r["ts_ms"], r["sched_ms"])
        for r in pacing_schedule(batch_in, 120_000).collect()
    }
    assert got == expect
    # and the pacing constraint holds per host
    by_host = {}
    for h, _, _, s in sorted(got, key=lambda r: r[3]):
        assert all(abs(s - p) >= 120_000 for p in by_host.get(h, [])), got
        by_host.setdefault(h, []).append(s)


def test_pacing_stream_state_gc_is_lossless(spark, tmp_path):
    """A host idle past the GC horizon has its state dropped, and a
    later event restarts the recurrence at its own arrival time — the
    identical result retained state would give (losslessness proof in
    the docstring, pinned here end-to-end)."""
    src = str(tmp_path / "src")
    os.makedirs(src)
    _write_batch(spark, src, _rows([(1, 0)]), "b0")
    # minute 60 advances the watermark (wm 600s) far past
    # sched(0) + horizon; host0's state times out
    _write_batch(spark, src, _rows([(2, 60)]), "b1")
    _write_batch(spark, src, _rows([(3, 90)]), "b2")

    stream = ST.read_parquet_stream(spark, src, SCHEMA)
    paced = ST.pacing_stream(stream, delay_ms=120_000, watermark_sec=600)
    q = (
        paced.writeStream.format("memory")
        .queryName("paced_gc")
        .outputMode("append")
        .start()
    )
    try:
        q.processAllAvailable()
        rows = {
            r["url_hash"]: (r["ts_ms"], r["sched_ms"])
            for r in spark.sql("SELECT * FROM paced_gc").collect()
        }
    finally:
        q.stop()
    # every event schedules at its own arrival (all gaps > delay),
    # whether its host state survived or was GC'd in between
    assert len(rows) == 3
    for ts_ms, sched_ms in rows.values():
        assert sched_ms == ts_ms, rows


def test_decode_meta_stream_equals_batch(spark, tmp_path):
    """The image-decode Arrow kernel (multimodal.decode_meta) is
    stateless mapInPandas, so it runs UNCHANGED on a streaming frame —
    the payload axis composes with Structured Streaming: per-row
    results over micro-batches equal the one-shot batch decode of the
    same files (including the corrupt-payload routing)."""
    import pyspark.sql.functions as F

    from crawler_spark.functions.multimodal import (
        attach_synthetic_images,
        decode_meta,
    )

    src = str(tmp_path / "imgs")
    docs = spark.range(0, 24).select(F.col("id").alias("doc_id"))
    imgs = attach_synthetic_images(docs, "doc_id").withColumn(
        "bytes",
        F.when(
            F.expr("CAST(substr(image_id, -1, 1) AS INT) % 8 = 0"),
            F.expr("substring(bytes, 1, 4)"),  # corrupt a slice
        ).otherwise(F.col("bytes")),
    )
    imgs.write.parquet(src)
    schema = imgs.schema

    stream = spark.readStream.schema(schema).parquet(src)
    q = (
        decode_meta(stream)
        .writeStream.format("memory")
        .queryName("img_meta_stream")
        .outputMode("append")
        .start()
    )
    try:
        q.processAllAvailable()
        got = {
            r["image_id"]: (r["dec_phash"], r["decode_ok"])
            for r in spark.sql("SELECT * FROM img_meta_stream").collect()
        }
    finally:
        q.stop()

    want = {
        r["image_id"]: (r["dec_phash"], r["decode_ok"])
        for r in decode_meta(spark.read.parquet(src)).collect()
    }
    assert got == want and len(want) == 24
    assert any(not ok for (_, ok) in want.values())  # corrupt routing hit
