"""Crawler-trap detection: per-host URL-shape statistics that flag
hosts generating unbounded synthetic URL spaces (segment loops,
calendar/path explosions) so the frontier can demote or cap them.

The reference crawls a single curated site and never needs this
(otodom/total_pages/handler.go:53-65 walks a bounded page range); at
10^10-frontier scale trap hosts are the dominant waste, so the graft
adds the standard signals:

* **segment loops** — a path repeating one segment ≥3 times
  (``/a/b/a/b/a``-style recursion traps),
* **path-space collapse** — many URLs over few distinct paths
  (session-id / calendar params),
* **depth explosion** — max path depth.

Scale shape: one narrow per-URL projection (split + array stats, all
codegen), then ONE combiner-backed groupBy(host).  No windows, no
joins; output is O(hosts), so the verdict table itself broadcasts back
onto the frontier for gating.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def url_shape(urls: DataFrame, host_col: str = "host", path_col: str = "path") -> DataFrame:
    """Per-URL shape row: (host, path, depth, is_loop).

    ``depth`` = number of non-empty path segments; ``is_loop`` = some
    single segment occurs ≥3 times (per-segment max count — per-row
    array expressions, no shuffle).
    """
    segs = F.filter(F.split(F.col(path_col), "/"), lambda s: s != "")
    # "some segment ≥3×" needs the per-segment max count, not the total
    # duplicate excess: /2024/01/g/g/p/p has excess 2 from two
    # legitimately doubled segments and is NOT a recursion trap.  The
    # nested filter is O(depth²) per row but paths are short and it
    # stays whole-stage codegen (no shuffle, no UDF).
    loop = F.exists(
        F.array_distinct(segs),
        lambda d: F.size(F.filter(segs, lambda s: s == d)) >= F.lit(3),
    )
    return urls.select(
        F.col(host_col).alias("host"),
        F.col(path_col).alias("path"),
        F.size(segs).cast("long").alias("depth"),
        loop.alias("is_loop"),
    )


def trap_verdict(shapes: DataFrame) -> DataFrame:
    """Per-host trap verdict over ``url_shape`` rows.

    Returns (host, n_urls, n_loop, max_depth, n_paths, is_trap) where
    ``is_trap`` = loop share ≥30% (exact integer ``10*n_loop >=
    3*n_urls``) OR depth ≥ 12.
    """
    agg = shapes.groupBy("host").agg(
        F.count(F.lit(1)).alias("n_urls"),
        F.sum(F.col("is_loop").cast("long")).alias("n_loop"),
        F.max("depth").alias("max_depth"),
        F.countDistinct("path").alias("n_paths"),
    )
    return agg.withColumn(
        "is_trap",
        (F.col("n_loop") * 10 >= F.col("n_urls") * 3) | (F.col("max_depth") >= 12),
    )


def gate_frontier(
    frontier: DataFrame, verdicts: DataFrame, host_col: str = "host"
) -> DataFrame:
    """Drop every frontier row on a trap-flagged host.  The verdict
    table is O(hosts) — it BROADCASTS into a left-anti join, so the
    frontier (the 10^10-row side) never shuffles for the gate.  Same
    composition shape as the robots gate (operators/robots.py)."""
    traps = verdicts.filter(F.col("is_trap")).select(F.col("host").alias(host_col))
    return frontier.join(F.broadcast(traps), host_col, "left_anti")
