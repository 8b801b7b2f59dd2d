"""Frontier expansion + merge (SURVEY.md §2.4 G1/G2, §2.6 O1, §2.7 U1).

The reference discovers pagination by max-aggregating pager anchors
(total_pages/handler.go:36-42) and then generates page URLs
``for i := 1; i < lastPage; i++`` (total_pages/handler.go:53-65) — note
the pinned off-by-one: THE LAST PAGE IS NEVER EMITTED, and page 1 is a
distinct URL duplicating the seed listing's content.  We reproduce both
quirks deliberately (tests pin them).

In the closed-world graft the pager max is already materialized as
``last_page`` on the fetched seed page, so expansion is
``explode(sequence(1, last_page - 1))`` + the P5 URL constructor —
pure JVM expressions, linear in output size, no shuffle until the
dedup merge.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..canon import with_url_identity
from .extract import with_page_param
from .politeness import ORDER_KEYS

FRONTIER_COLS = [
    "url",
    "url_hash",
    "host",
    "page",
    "priority",
    "round_added",
    "attempts",
    "seed_id",
    "domain",
    "schema_name",
    "schema_version",
]


def expand_pages(fetched_seeds: DataFrame, round_no: int) -> DataFrame:
    """New frontier candidates from successfully-fetched seed pages.

    Input rows must carry: url (seed URL), last_page, seed_id, domain,
    schema_name, schema_version.  Output: frontier-shaped candidates for
    pages 1..last_page-1 (reference off-by-one), priority 1.
    """
    exploded = fetched_seeds.select(
        F.col("url").alias("_seed_url"),
        "seed_id",
        "domain",
        "schema_name",
        "schema_version",
        F.explode(F.sequence(F.lit(1), F.col("last_page") - 1)).alias("page"),
    ).select(
        with_page_param(F.col("_seed_url"), F.col("page")).alias("url"),
        "page",
        "seed_id",
        "domain",
        "schema_name",
        "schema_version",
    )
    return (
        with_url_identity(exploded)
        .withColumn("priority", F.lit(1))
        .withColumn("round_added", F.lit(round_no))
        .withColumn("attempts", F.lit(0))
        .select(*FRONTIER_COLS)
    )


def dedup_within(candidates: DataFrame) -> DataFrame:
    """Deterministic within-batch dedup: keep the row that sorts first by
    the canonical order keys for each url_hash (U1 union then distinct)."""
    w = Window.partitionBy("url_hash").orderBy(*[F.col(k).asc() for k in ORDER_KEYS])
    return candidates.withColumn("_rn", F.row_number().over(w)).filter(F.col("_rn") == 1).drop(
        "_rn"
    )


def merge_into_frontier(next_frontier: DataFrame, new_candidates: DataFrame) -> DataFrame:
    """U1/U2: union new candidates, dropping any url already queued."""
    fresh = new_candidates.join(
        next_frontier.select("url_hash"), "url_hash", "left_anti"
    )
    return next_frontier.select(*FRONTIER_COLS).unionByName(fresh.select(*FRONTIER_COLS))
