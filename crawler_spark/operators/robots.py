"""robots.txt gating (north_rule: robots-gated scheduling).

Candidate URLs are checked at frontier-insertion time against a small
per-host rule table broadcast to every task.  A row is blocked when its
host has a non-empty ``disallow_prefix`` and the URL path starts with
it.  Blocked rows never enter the frontier (counted for metrics).

The reference has no robots handling — this is a graft axis; semantics
(single prefix per host, path-prefix match) mirror the fixture contract
FIXTURES.md §4 and are mirrored exactly in the golden model.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..canon import path_col


def tag_robots(candidates: DataFrame, robots: DataFrame) -> DataFrame:
    """Add a ``_blocked`` flag; join on host, broadcast the rule table."""
    return (
        candidates.join(F.broadcast(robots.select("host", "disallow_prefix")), "host", "left")
        .withColumn(
            "_blocked",
            (F.coalesce(F.col("disallow_prefix"), F.lit("")) != F.lit(""))
            & path_col(F.col("url")).startswith(F.col("disallow_prefix")),
        )
        .drop("disallow_prefix")
    )


def split_robots(candidates: DataFrame, robots: DataFrame) -> tuple[DataFrame, DataFrame]:
    """→ (allowed, blocked)."""
    tagged = tag_robots(candidates, robots)
    return (
        tagged.filter(~F.col("_blocked")).drop("_blocked"),
        tagged.filter(F.col("_blocked")).drop("_blocked"),
    )
