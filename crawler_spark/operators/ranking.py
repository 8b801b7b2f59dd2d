"""Deterministic global sequence numbers WITHOUT a single-partition window.

The crawl order must be identical across parallelism levels
(north_rule), so ordering can never come from ``monotonically_
increasing_id`` or partition order.  A naive
``row_number().over(Window.orderBy(...))`` is deterministic but pulls
the whole dataset through ONE partition — a non-starter at 10^10 rows.

``global_sequence`` computes the same dense 1..N numbering scalably:

1. ``repartitionByRange`` on the sort keys — partitions hold ordered,
   non-overlapping key ranges (partition i's keys all sort before
   partition i+1's);
2. per-partition ``row_number`` over a window partitioned by
   ``spark_partition_id()`` — embarrassingly parallel;
3. add each partition's cumulative predecessor count (a tiny P-row
   aggregate, broadcast-joined back).

Correctness requires the key tuple to be a total order (unique) —
callers pass (priority, page, url_hash) where url_hash is unique
within a dispatch set.  Pinned invariant: result is independent of the
input's partitioning (tests/test_ranking.py runs it at 1, 4 and 13
partitions and compares bit-for-bit).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def global_sequence(
    df: DataFrame,
    keys: list[str],
    seq_col: str = "seq",
    num_partitions: int | None = None,
    small: bool = False,
) -> DataFrame:
    """``small=True``: the caller knows the frame is driver-window-sized
    (≲10^6 rows — e.g. from the previous round's committed row count),
    so a single-partition window is used: same numbering, zero extra
    jobs (it fuses into the downstream stage) instead of the ranged
    path's sample + count jobs.  Results are bit-identical."""
    sc = df.sparkSession
    if small:
        w = Window.orderBy(*[F.col(k).asc() for k in keys])
        return df.withColumn(seq_col, F.row_number().over(w).cast("long"))
    if num_partitions is None:
        num_partitions = int(sc.conf.get("spark.sql.shuffle.partitions"))

    ranged = df.repartitionByRange(num_partitions, *[F.col(k) for k in keys]).withColumn(
        "_pid", F.spark_partition_id()
    )
    # One extra narrow job: per-partition counts → cumulative offsets.
    counts = ranged.groupBy("_pid").count().collect()
    counts.sort(key=lambda r: r["_pid"])
    offsets, acc = {}, 0
    for r in counts:
        offsets[r["_pid"]] = acc
        acc += r["count"]
    off_df = sc.createDataFrame(
        [(pid, off) for pid, off in offsets.items()], "_pid: int, _off: long"
    )
    w = Window.partitionBy("_pid").orderBy(*[F.col(k).asc() for k in keys])
    return (
        ranged.withColumn("_rn", F.row_number().over(w))
        .join(F.broadcast(off_df), "_pid")
        .withColumn(seq_col, (F.col("_rn") + F.col("_off")).cast("long"))
        .drop("_pid", "_rn", "_off")
    )
