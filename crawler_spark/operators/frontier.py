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


def split_head(frontier: DataFrame, k: int) -> tuple[DataFrame, DataFrame]:
    """(head, tail): per-host top-``k`` rows by the canonical crawl
    order vs the rest.

    The head is the frontier's working set: with a per-host dispatch
    budget of at most ``b`` rows per round, only the per-host top
    ``b × rounds-until-refill`` rows can possibly be dispatched before
    the next refill, so the politeness window never needs to see the
    tail at all.  Invariant: every tail row sorts strictly after every
    head row of its host, so dispatching the head's top-b IS the
    frontier's top-b.  Callers persist the input (two filters over one
    window).
    """
    w = Window.partitionBy("host").orderBy(*[F.col(c).asc() for c in ORDER_KEYS])
    ranked = frontier.withColumn("_hrn", F.row_number().over(w))
    head = ranked.filter(F.col("_hrn") <= k).drop("_hrn")
    tail = ranked.filter(F.col("_hrn") > k).drop("_hrn")
    return head, tail


def dedup_keys(frontier: DataFrame) -> DataFrame:
    """Cross-source url_hash dedup for refill/compaction merges (the
    head and the reconstructed tail can briefly hold copies of one key
    — e.g. a row pulled into the head in-memory during a refill round).

    Deterministic preference: highest ``attempts`` first (a retried
    row must keep its count, or retry exhaustion resets), then earliest
    ``round_added`` (an already-queued key keeps its original row —
    the rewrite-model merge semantics).  Remaining ties are identical
    rows, so the choice is value-deterministic.
    """
    w = Window.partitionBy("url_hash").orderBy(
        F.col("attempts").desc(), F.col("round_added").asc()
    )
    return (
        frontier.withColumn("_krn", F.row_number().over(w))
        .filter(F.col("_krn") == 1)
        .drop("_krn")
    )
