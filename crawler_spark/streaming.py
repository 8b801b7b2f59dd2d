"""Structured Streaming surface: the always-on mirror of the batch
round loop.

The reference is cron-tick batch (stack.yml:16,46,76,104 — a saga
every 5/30 min); engine.py re-expresses that as resumable batch
rounds.  This module is the third execution form the graft brief asks
for: the same operators as an unbounded micro-batch pipeline —
`readStream` file source → watermarked event-time operators →
idempotent `foreachBatch` sink.  Nothing here forks operator logic:
the aggregation expressions are shared with the batch path so the
stream is equivalence-testable against `spark.read` over the same
files (pinned in tests/test_streaming.py).

Scale notes (identical to a 1000-executor deployment):
- watermarks bound ALL state: windowed aggs drop closed windows,
  streaming dedup drops keys older than the horizon — state size is
  O(events-in-horizon), never O(history);
- `foreachBatch` + batch-id commit log gives exactly-once parquet
  appends on top of at-least-once batch redelivery (the same
  idempotent-write discipline as sinks.StateStore's round commits);
- file-source micro-batches are the local stand-in for Kafka/queue
  sources — swapping `readStream.parquet` for `readStream.format(
  "kafka")` changes no operator downstream.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T


def read_parquet_stream(
    spark: SparkSession,
    path: str,
    schema: T.StructType,
    max_files_per_trigger: int = 1,
) -> DataFrame:
    """Unbounded read over a directory of parquet files.  The explicit
    schema is mandatory (streaming cannot infer), and one-file triggers
    make micro-batch boundaries deterministic for tests."""
    return (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(path)
    )


def windowed_counts(
    events: DataFrame,
    ts_col: str,
    keys: list[str],
    window_duration: str = "10 minutes",
    watermark_delay: str = "10 minutes",
) -> DataFrame:
    """Event-time tumbling-window counts with late-data bound — works
    identically on a stream (state dropped when the watermark passes a
    window) and on a batch frame (watermark is a no-op there), so the
    batch run over the same files is the oracle."""
    return (
        events.withWatermark(ts_col, watermark_delay)
        .groupBy(F.window(ts_col, window_duration).alias("win"), *keys)
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            F.col("win.start").alias("win_start"),
            F.col("win.end").alias("win_end"),
            *keys,
            "n",
        )
    )


def dedup_stream(
    events: DataFrame,
    key_cols: list[str],
    ts_col: str,
    watermark_delay: str = "10 minutes",
) -> DataFrame:
    """Streaming URL-seen: emit each key once, state bounded by the
    watermark horizon (a key recurring later than the horizon may be
    re-emitted — the exact tradeoff the batch engine's Bloom+anti-join
    makes differently: unbounded memory vs bounded re-fetch window).

    ``dropDuplicatesWithinWatermark`` (not plain ``dropDuplicates``):
    with the plain form Spark only evicts dedup state when the
    event-time column is PART of the key subset — keyed on url_hash
    alone it would retain every key forever (O(history) state, the
    exact failure this operator exists to avoid)."""
    return events.withWatermark(ts_col, watermark_delay).dropDuplicatesWithinWatermark(
        key_cols
    )


class IdempotentParquetSink:
    """`foreachBatch` target: land each micro-batch in parquet exactly
    once.  Streaming guarantees at-least-once batch delivery after
    restart; two mechanisms together make that exactly-once:

    - each batch OVERWRITES its own deterministic partition directory
      (``data/batch_id=N``) — a replay of batch N lands on the same
      path, so even a crash BETWEEN the data write and the marker write
      cannot duplicate rows (an append-to-shared-dir scheme would);
    - a batch-id marker file (written after the data) short-circuits
      full replays — the same write-then-commit discipline as the batch
      StateStore's round checkpoints (sinks/__init__.py).

    The row count in the marker is recovered from the just-written
    parquet footers (metadata-only read), not by re-computing the
    upstream plan a second time."""

    def __init__(self, out_dir: str):
        self.out_dir = out_dir
        self._log = os.path.join(out_dir, "_applied_batches")
        os.makedirs(self._log, exist_ok=True)

    def applied(self, batch_id: int) -> bool:
        return os.path.exists(os.path.join(self._log, f"{batch_id}.json"))

    def __call__(self, batch_df: DataFrame, batch_id: int) -> None:
        if self.applied(batch_id):
            return  # redelivered batch: already fully applied
        path = os.path.join(self.out_dir, "data", f"batch_id={batch_id}")
        batch_df.write.mode("overwrite").parquet(path)
        n = batch_df.sparkSession.read.parquet(path).count()  # footer-only
        with open(os.path.join(self._log, f"{batch_id}.json"), "w") as f:
            json.dump({"batch_id": batch_id, "rows": n}, f)


def run_stream_to_parquet(
    stream_df: DataFrame,
    out_dir: str,
    checkpoint_dir: str,
    output_mode: str = "append",
):
    """Start the query through the idempotent sink; caller awaits
    `processAllAvailable()`/`stop()` (tests) or `awaitTermination()`
    (deployment)."""
    sink = IdempotentParquetSink(out_dir)
    return (
        stream_df.writeStream.foreachBatch(sink)
        .outputMode(output_mode)
        .option("checkpointLocation", checkpoint_dir)
        .start()
    )


SESSION_OUT = T.StructType(
    [
        T.StructField("key", T.LongType(), False),
        T.StructField("session_start", T.TimestampType(), False),
        T.StructField("session_end", T.TimestampType(), False),
        T.StructField("n_events", T.LongType(), False),
    ]
)

_SESSION_STATE = T.StructType(
    [
        T.StructField("start_ms", T.LongType(), False),
        T.StructField("end_ms", T.LongType(), False),
        T.StructField("n", T.LongType(), False),
    ]
)


def sessionize_stream(
    events: DataFrame,
    key_col: str,
    ts_col: str,
    gap_sec: int = 1800,
    watermark_delay: str = "30 minutes",
) -> DataFrame:
    """Custom stateful streaming operator (`applyInPandasWithState`, the
    graft brief's escape hatch for operators Spark's built-ins lack):
    event-time session windows per key, emitted when the watermark
    passes ``session_end + gap`` (event-time timeout), state removed on
    emit — state is O(open sessions), never O(history).

    Semantics (the streaming twin of contract.q_sessionize's batch
    lag+cumsum): a batch's per-key events are time-sorted and split at
    every >gap hole (a catch-up batch delivering hours of event time
    yields the same sessions the batch operator would); segments within
    ``gap_sec`` of the open session extend it, earlier complete
    segments close immediately, and the final open segment closes by
    event-time timeout when the watermark passes ``end + gap``.
    Arrivals later than the watermark horizon are dropped by Spark
    before reaching the state function.  Known approximation shared
    with any emit-on-close sessionizer: an out-of-order arrival that
    would BRIDGE two sessions of which one already closed cannot
    retract the emitted row."""
    import pandas as pd  # noqa: PLC0415 — worker-side import

    gap_ms = gap_sec * 1000

    def fn(key, pdfs, state):
        if state.hasTimedOut:
            start_ms, end_ms, n = state.get
            state.remove()
            yield pd.DataFrame(
                {
                    "key": [key[0]],
                    "session_start": [pd.Timestamp(start_ms, unit="ms")],
                    "session_end": [pd.Timestamp(end_ms, unit="ms")],
                    "n_events": [n],
                }
            )
            return
        parts = [
            pdf[ts_col].astype("int64") // 1_000_000 for pdf in pdfs if len(pdf)
        ]
        if not parts:
            return
        ts = pd.concat(parts).sort_values().to_numpy()
        brk = (
            [0]
            + [i for i in range(1, len(ts)) if ts[i] - ts[i - 1] > gap_ms]
            + [len(ts)]
        )
        segments = [
            (int(ts[s]), int(ts[e - 1]), e - s) for s, e in zip(brk[:-1], brk[1:])
        ]
        closed = []
        cur = tuple(state.get) if state.exists else None
        for mn, mx, n_new in segments:
            if cur is not None and mn <= cur[1] + gap_ms:
                cur = (min(cur[0], mn), max(cur[1], mx), cur[2] + n_new)
            else:
                if cur is not None:
                    closed.append(cur)
                cur = (mn, mx, n_new)
        state.update((int(cur[0]), int(cur[1]), int(cur[2])))
        # close when the watermark passes the gap after the last event
        state.setTimeoutTimestamp(int(cur[1]) + gap_ms)
        if closed:
            yield pd.DataFrame(
                {
                    "key": [key[0] for _ in closed],
                    "session_start": [pd.Timestamp(s, unit="ms") for s, _, _ in closed],
                    "session_end": [pd.Timestamp(e, unit="ms") for _, e, _ in closed],
                    "n_events": [c for _, _, c in closed],
                }
            )

    return (
        events.withWatermark(ts_col, watermark_delay)
        .groupBy(F.col(key_col))
        .applyInPandasWithState(
            fn, SESSION_OUT, _SESSION_STATE, "append", "EventTimeTimeout"
        )
    )


PACING_OUT = T.StructType(
    [
        T.StructField("host", T.StringType(), False),
        T.StructField("url_hash", T.LongType(), False),
        T.StructField("ts_ms", T.LongType(), False),
        T.StructField("sched_ms", T.LongType(), False),
    ]
)

_PACING_STATE = T.StructType([T.StructField("last_sched_ms", T.LongType(), False)])


def pacing_stream(
    candidates: DataFrame,
    delay_ms: int,
    host_col: str = "host",
    ts_col: str = "ts",
    tiebreak_col: str = "url_hash",
    watermark_sec: int = 600,
) -> DataFrame:
    """Streaming twin of ``operators.politeness.pacing_schedule``: each
    arriving candidate gets its dispatch slot ``sched = max(arrival,
    last_sched + delay_ms)``, with the per-host ``last_sched`` carried
    across micro-batches in ``applyInPandasWithState`` state (one long
    per active host).

    State GC is LOSSLESS by construction: a host's state is dropped by
    event-time timeout only once the watermark passes ``last_sched +
    watermark + delay``.  Any later-accepted event of that host has
    event time above ``watermark - watermark_delay >= last_sched +
    delay``, where the recurrence's max() resolves to the arrival time
    anyway — so the restart emits exactly what the retained state would
    have.  State is therefore O(hosts active within the horizon), never
    O(hosts ever seen), and the stream agrees with the batch operator
    on every in-order prefix (the contract pins the batch side against
    DuckDB; tests pin stream == batch).

    Within a micro-batch rows are paced in (ts, tiebreak) order; an
    out-of-order arrival ACROSS batches (within the watermark horizon)
    is paced on arrival — a real-time scheduler cannot dispatch into
    the past — which is the one declared divergence from the batch
    twin's global event-time order.
    """
    import numpy as np  # noqa: PLC0415 — worker-side import
    import pandas as pd  # noqa: PLC0415 — worker-side import

    horizon_ms = watermark_sec * 1000 + delay_ms

    def fn(key, pdfs, state):
        if state.hasTimedOut:
            state.remove()
            return
        frames = [pdf for pdf in pdfs if len(pdf)]
        if not frames:
            return
        pdf = pd.concat(frames)
        ts = (pdf[ts_col].astype("int64") // 1_000_000).to_numpy()
        order = np.lexsort((pdf[tiebreak_col].to_numpy(), ts))
        last = state.get[0] if state.exists else None
        scheds = []
        for i in order:
            t = int(ts[i])
            s = t if last is None else max(t, last + delay_ms)
            scheds.append(s)
            last = s
        state.update((int(last),))
        state.setTimeoutTimestamp(int(last) + horizon_ms)
        yield pd.DataFrame(
            {
                "host": [key[0]] * len(order),
                "url_hash": pdf[tiebreak_col].to_numpy()[order],
                "ts_ms": ts[order],
                "sched_ms": scheds,
            }
        )

    return (
        candidates.withWatermark(ts_col, f"{watermark_sec} seconds")
        .groupBy(F.col(host_col))
        .applyInPandasWithState(
            fn, PACING_OUT, _PACING_STATE, "append", "EventTimeTimeout"
        )
    )
