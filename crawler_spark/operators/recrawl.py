"""Adaptive recrawl scheduling: estimate per-URL change frequency from
the fetch history and derive the next fetch time — the freshness loop
a continuous crawler runs on top of the frontier (the reference
re-runs its whole crawl on a cron timer with no per-URL adaptivity:
stack.yml schedule + otodom/orchestrator/handler.go:63).

Model: a "change" is a fetch whose observed value differs from the
previous fetch of the same URL; the recrawl interval is the observed
span divided by the change count, clamped to [1 h, 7 d].  All
arithmetic is exact integer milliseconds (``unix_millis`` + integer
``div``) so the schedule is bit-identical across engines.

Scale shape: ONE window partitioned by url_id (parallel across URLs —
at 10^10 URLs each partition is the per-URL history, a few rows) into
one combiner-backed groupBy.  No global sort, no driver state.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

MIN_INTERVAL_MS = 3_600_000  # 1 hour
MAX_INTERVAL_MS = 604_800_000  # 7 days


def recrawl_schedule(
    fetches: DataFrame,
    url_col: str = "url_id",
    ts_col: str = "ts",
    value_col: str = "value",
    tiebreak_col: str = "event_id",
) -> DataFrame:
    """(url_id, n_fetches, n_changes, span_ms, interval_ms,
    next_fetch_ms) per URL from its fetch history."""
    # rename BEFORE the window so the groupBy below keys on the very
    # attribute the window partitioned by — re-aliasing between them
    # defeats Catalyst's alias-aware partitioning propagation and costs
    # a second (same-key) exchange
    if url_col != "url_id":
        fetches = fetches.withColumnRenamed(url_col, "url_id")
    w = Window.partitionBy("url_id").orderBy(F.col(ts_col), F.col(tiebreak_col))
    hist = fetches.select(
        F.col("url_id"),
        # parquet ts may be TIMESTAMP_NTZ; session TZ is pinned UTC
        # (session.py) so the LTZ cast is instant-preserving and
        # matches DuckDB epoch_ms
        F.unix_millis(F.col(ts_col).cast("timestamp_ltz")).alias("ms"),
        F.col(value_col).alias("v"),
        F.lag(F.col(value_col)).over(w).alias("prev_v"),
    )
    agg = hist.groupBy("url_id").agg(
        F.count(F.lit(1)).alias("n_fetches"),
        F.sum(
            (F.col("prev_v").isNotNull() & (F.col("v") != F.col("prev_v"))).cast("long")
        ).alias("n_changes"),
        (F.max("ms") - F.min("ms")).alias("span_ms"),
        F.max("ms").alias("last_ms"),
    )
    interval = F.least(
        F.greatest(
            F.expr("div(span_ms, greatest(n_changes, 1))"),
            F.lit(MIN_INTERVAL_MS).cast("long"),
        ),
        F.lit(MAX_INTERVAL_MS).cast("long"),
    )
    return agg.select(
        "url_id",
        "n_fetches",
        "n_changes",
        "span_ms",
        interval.alias("interval_ms"),
        (F.col("last_ms") + interval).alias("next_fetch_ms"),
    )
