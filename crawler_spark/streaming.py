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
    makes differently: unbounded memory vs bounded re-fetch window)."""
    return events.withWatermark(ts_col, watermark_delay).dropDuplicates(key_cols)


class IdempotentParquetSink:
    """`foreachBatch` target: append each micro-batch to a parquet
    directory exactly once.  Streaming guarantees at-least-once batch
    delivery after restart; a batch-id commit log (one marker file per
    applied batch, written AFTER the data lands) turns that into
    exactly-once — the same write-then-commit discipline as the batch
    StateStore's round checkpoints (sinks/__init__.py)."""

    def __init__(self, out_dir: str):
        self.out_dir = out_dir
        self._log = os.path.join(out_dir, "_applied_batches")
        os.makedirs(self._log, exist_ok=True)

    def applied(self, batch_id: int) -> bool:
        return os.path.exists(os.path.join(self._log, f"{batch_id}.json"))

    def __call__(self, batch_df: DataFrame, batch_id: int) -> None:
        if self.applied(batch_id):
            return  # redelivered batch: already fully applied
        n = batch_df.count()
        batch_df.write.mode("append").parquet(os.path.join(self.out_dir, "data"))
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
