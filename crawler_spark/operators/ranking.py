"""Deterministic global sequence numbers WITHOUT a single-partition window.

The crawl order must be identical across parallelism levels
(north_rule), so ordering can never come from ``monotonically_
increasing_id`` or partition order.  A naive
``row_number().over(Window.orderBy(...))`` is deterministic but pulls
the whole dataset through ONE partition — a non-starter at 10^10 rows.

``global_sequence`` computes the same dense 1..N numbering scalably
and DETERMINISTICALLY:

1. one aggregation derives exact (min, max) of the final sort key;
2. every row gets a value-range bucket of the final key —
   ``floor((key - min) / span * B)`` — a fixed, order-preserving,
   sampling-free binning (this is the load-bearing choice:
   ``repartitionByRange`` SAMPLES with an RDD-id-derived seed, and
   under AQE the counts job and the numbering job re-plan and
   re-sample independently, so its boundaries are not stable across
   actions, sessions, or cluster sizes — observed as divergent
   dispatch fingerprints between local[8] and local[32]);
3. exact per-(prefix-keys, bucket) counts → cumulative offsets via a
   running-sum window over the (combos × B row — tiny) counts frame,
   computed IN Spark so prefix-key ordering is Spark's own (binary
   UTF-8 for strings, nulls first) — a driver-side Python sort of the
   same tuples would raise on NULL keys and can order non-ASCII
   strings differently;
4. per-bucket ``row_number`` window + broadcast offset join.

Correctness requires the key tuple to be a total order (unique final
key within (prefix, bucket) — callers pass (priority, page, url_hash)
where url_hash is unique within a dispatch set).  Uniformly-hashed
final keys (url_hash) spread evenly over buckets; a low-cardinality
final key degrades parallelism (fewer distinct buckets), never
correctness.  Pinned invariants: identical output at any partitioning
and any ``buckets``/parallelism (tests/test_operators.py), and
bit-equal to the single-window path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

# Ranged-vs-single-window crossover (shared by engine.py and
# contract.py — two call sites previously encoded different guesses).
# Measured on this box (local[32], int keys): the single-partition
# window sorts 10^5 rows in ~0.1 s and 10^6 rows in ~0.9 s, while the
# bucketed path's two extra jobs cost ~0.6-0.8 s of driver/job latency
# regardless of size — so the crossover sits near 10^6 rows; below it
# the one-task sort is cheaper AND fuses into the downstream stage.
SMALL_SEQ_MAX_ROWS = 1_000_000


def _range_bucket(df: DataFrame, last: str, buckets: int):
    """Deterministic value-range bucket expression for the final sort
    key (shared by global_sequence and running_total — see module
    docstring for why this must be sampling-free)."""
    mn, mx = df.agg(F.min(last), F.max(last)).first()
    if mn is None or mn == mx:
        return F.lit(0).cast("int")
    span = float(mx) - float(mn)
    # double-precision binning of an integer key is monotone
    # non-decreasing, which is all the bucketing needs
    return F.least(
        F.lit(buckets - 1),
        F.greatest(
            F.lit(0),
            F.floor((F.col(last).cast("double") - float(mn)) / span * buckets),
        ),
    ).cast("int")


def global_sequence(
    df: DataFrame,
    keys: list[str],
    seq_col: str = "seq",
    num_partitions: int | None = None,  # kept for API compat; unused
    small: bool = False,
    buckets: int = 256,
) -> DataFrame:
    """``small=True``: the caller knows the frame is driver-window-sized
    (≲10^5 rows — e.g. from the previous round's committed row count),
    so a single-partition window is used: same numbering, zero extra
    jobs (it fuses into the downstream stage) instead of the bucketed
    path's two aggregation jobs.  Results are bit-identical."""
    if small:
        w = Window.orderBy(*[F.col(k).asc() for k in keys])
        return df.withColumn(seq_col, F.row_number().over(w).cast("long"))

    pre, last = keys[:-1], keys[-1]
    b = df.withColumn("_bkt", _range_bucket(df, last, buckets))

    # running sum over the global (pre…, _bkt) order; the counts frame
    # is combos × B rows, so the single-partition window is trivial
    w_off = Window.orderBy(
        *[F.col(k).asc() for k in pre], F.col("_bkt").asc()
    ).rowsBetween(Window.unboundedPreceding, -1)
    off_df = (
        b.groupBy(*pre, "_bkt")
        .count()
        .withColumn("_off", F.coalesce(F.sum("count").over(w_off), F.lit(0)))
        .drop("count")
    )

    w = Window.partitionBy(*pre, "_bkt").orderBy(F.col(last).asc())
    return (
        b.withColumn("_rn", F.row_number().over(w))
        .join(F.broadcast(off_df), [*pre, "_bkt"])
        .withColumn(seq_col, (F.col("_rn") + F.col("_off")).cast("long"))
        .drop("_bkt", "_rn", "_off")
    )


def running_total(
    df: DataFrame,
    keys: list[str],
    val_col: str,
    out_col: str = "running_total",
    small: bool = False,
    buckets: int = 256,
) -> DataFrame:
    """EXCLUSIVE running sum of ``val_col`` over the global ``keys``
    order — global_sequence generalized from prefix COUNT to prefix SUM
    (the numbering is the ``val=1`` special case), with the identical
    deterministic value-range-bucket scheme and the same total-order
    contract on ``keys``.

    Row i gets ``sum(val over all rows strictly before i)`` — 0 for the
    first row.  Exclusive (not inclusive) because the main consumer is
    boundary assignment (token-budget shard packing: a row belongs to
    the shard its FIRST token lands in), and the inclusive form is just
    ``out + val``.

    Scale shape: one agg for (min, max), per-(prefix, bucket) partial
    sums → exclusive offsets via a window over the tiny counts frame,
    one intra-bucket exclusive-sum window — no single-partition window
    over the data, no sampling, bit-identical at any parallelism
    (pinned in tests/test_operators.py)."""
    if small:
        w = Window.orderBy(*[F.col(k).asc() for k in keys]).rowsBetween(
            Window.unboundedPreceding, -1
        )
        return df.withColumn(
            out_col, F.coalesce(F.sum(val_col).over(w), F.lit(0)).cast("long")
        )

    pre, last = keys[:-1], keys[-1]
    b = df.withColumn("_bkt", _range_bucket(df, last, buckets))

    w_off = Window.orderBy(
        *[F.col(k).asc() for k in pre], F.col("_bkt").asc()
    ).rowsBetween(Window.unboundedPreceding, -1)
    off_df = (
        b.groupBy(*pre, "_bkt")
        .agg(F.sum(val_col).alias("_bsum"))
        .withColumn("_off", F.coalesce(F.sum("_bsum").over(w_off), F.lit(0)))
        .drop("_bsum")
    )

    w = (
        Window.partitionBy(*pre, "_bkt")
        .orderBy(F.col(last).asc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    return (
        b.withColumn("_run", F.coalesce(F.sum(val_col).over(w), F.lit(0)))
        .join(F.broadcast(off_df), [*pre, "_bkt"])
        .withColumn(out_col, (F.col("_run") + F.col("_off")).cast("long"))
        .drop("_bkt", "_run", "_off")
    )
