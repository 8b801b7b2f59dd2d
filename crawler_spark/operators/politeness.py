"""Per-host politeness budget (SURVEY.md §2.4 G6).

The reference bounds fetch concurrency fleet-wide: 15-20 crawler
replicas (stack.yml:138-139,158-159) and a 40-slot response channel
(otodom/orchestrator/handler.go:91).  We re-express this as a per-host,
per-round dispatch budget:

- rank frontier rows within each host by the canonical crawl order
  (priority, page, url_hash) — reference order is ascending page
  (PageSorter, otodom/commons/page.go:10-14); priority and url_hash
  make the tuple total;
- dispatch the top ``budget(host)`` rows; the rest stay in the frontier
  for the next round (deferred, attempts unchanged);
- budget derives from robots crawl_delay:
  ``base`` when delay==0, else ``clamp(round_ms // delay, 1, base)``.

Skew note (north_rule "salted for hot domains"): the *selection* is a
per-host window — bounded state per host — and the *dispatch set* is
then physically repartitioned by (host, salt=url_hash % S) before the
fetch UDF so one hot host spreads over S tasks without affecting the
logical order (ordering never depends on partitioning).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

ORDER_KEYS = ["priority", "page", "url_hash"]

DEFAULT_BASE_BUDGET = 8
DEFAULT_ROUND_MS = 600


def host_budget_col(crawl_delay_ms, base_budget: int, round_ms: int):
    """Budget expression; NULL delay (host missing in robots) → base."""
    d = F.coalesce(crawl_delay_ms, F.lit(0))
    return (
        F.when(d <= 0, F.lit(base_budget))
        .otherwise(F.greatest(F.lit(1), F.least(F.lit(base_budget), F.floor(F.lit(round_ms) / d))))
        .cast("int")
    )


def rank_with_budget(
    frontier: DataFrame,
    robots: DataFrame,
    base_budget: int = DEFAULT_BASE_BUDGET,
    round_ms: int = DEFAULT_ROUND_MS,
) -> DataFrame:
    """Window-rank the frontier per host and tag each row ``_dispatch``.

    Returned whole (rather than pre-split) so the caller can persist
    ONE frame and derive both the dispatch set and the deferred
    remainder from the same cache — splitting first would recompute
    the window for each side.
    """
    w = Window.partitionBy("host").orderBy(*[F.col(k).asc() for k in ORDER_KEYS])
    return (
        frontier.join(F.broadcast(robots.select("host", "crawl_delay_ms")), "host", "left")
        .withColumn("_budget", host_budget_col(F.col("crawl_delay_ms"), base_budget, round_ms))
        .withColumn("_rn", F.row_number().over(w))
        .withColumn("_dispatch", F.col("_rn") <= F.col("_budget"))
        .drop("_rn", "_budget", "crawl_delay_ms")
    )


def split_by_budget(
    frontier: DataFrame,
    robots: DataFrame,
    base_budget: int = DEFAULT_BASE_BUDGET,
    round_ms: int = DEFAULT_ROUND_MS,
) -> tuple[DataFrame, DataFrame]:
    """→ (dispatch, deferred).  robots is small → broadcast join."""
    ranked = rank_with_budget(frontier, robots, base_budget, round_ms)
    dispatch = ranked.filter(F.col("_dispatch")).drop("_dispatch")
    deferred = ranked.filter(~F.col("_dispatch")).drop("_dispatch")
    return dispatch, deferred


def salt_partition(
    dispatch: DataFrame, num_salts: int = 8, num_partitions: int | None = None
) -> DataFrame:
    """Physical-only: spread hot hosts across tasks for the fetch stage.

    Pass ``num_partitions`` (typically default parallelism) to PIN the
    task count: a repartition without an explicit N is advisory and AQE
    coalesces it by BYTE size — the wrong granularity signal for the
    CPU-bound fetch/extract/verify stages downstream, whose cost is per
    row, not per byte.  A politeness-bounded round is small in bytes,
    so byte-based coalescing collapses it to one task and the round's
    dominant compute stops scaling with cores.
    """
    cols = [F.col("host"), F.pmod(F.col("url_hash"), F.lit(num_salts))]
    if num_partitions:
        return dispatch.repartition(num_partitions, *cols)
    return dispatch.repartition(*cols)


def spread_partition(dispatch: DataFrame, num_partitions: int) -> DataFrame:
    """Maximal salting: partition by the full ``url_hash`` (salt = the
    hash itself), spreading EVERY host uniformly across all tasks.

    For the closed-world fetch path the downstream extract/decode/verify
    chain is pure per-row CPU with no host affinity to preserve, so the
    right physical layout is the most uniform one — (host, salt%S)
    clustering only adds bucket-weight variance that shows up as a
    straggler tail at wide parallelism (measured at local[32], 130k
    pages: 96 host-salt partitions 201 s vs 320 url_hash partitions
    98.5 s for the identical stage).  ``salt_partition`` remains the
    right layout for the live-web ``fetch_http_map`` path, where
    host-clustered batches enable connection reuse and in-batch
    crawl-delay pacing.  Deterministic (hash partitioning on a
    deterministic column) — the crawl order never depends on physical
    layout either way."""
    return dispatch.repartition(num_partitions, F.col("url_hash"))


def pacing_schedule(
    candidates: DataFrame,
    delay_ms: int,
    host_col: str = "host",
    ts_col: str = "ts_ms",
    tiebreak_col: str = "url_hash",
) -> DataFrame:
    """Per-host dispatch pacing: the k-th candidate of a host (in
    (ts, tiebreak) order) fires at ``sched_k = max(ts_k,
    sched_{k-1} + delay_ms)`` — never before it arrives, never closer
    than ``delay_ms`` to the previous dispatch of the same host.

    The recurrence unrolls to ``sched_k = max_{j<=k}(ts_j - j*delay)
    + k*delay``, so it is ONE running-max window per host — no
    iterative/driver loop, integer-ms exact (oracle-safe), and the
    state per host inside the window is a single max.  The streaming
    twin is ``crawler_spark.streaming.pacing_stream`` (same recurrence
    held in applyInPandasWithState state across micro-batches).
    """
    w = Window.partitionBy(host_col).orderBy(
        F.col(ts_col).asc(), F.col(tiebreak_col).asc()
    )
    rn = F.row_number().over(w).cast("long")
    base = F.col(ts_col) - rn * F.lit(delay_ms)
    run_max = F.max(base).over(
        Window.partitionBy(host_col)
        .orderBy(F.col(ts_col).asc(), F.col(tiebreak_col).asc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return candidates.withColumn("_rn", rn).select(
        *candidates.columns,
        (run_max + F.col("_rn") * F.lit(delay_ms)).cast("long").alias("sched_ms"),
    )
