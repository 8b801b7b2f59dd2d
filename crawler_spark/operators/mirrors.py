"""Mirror / alias-host detection: pairs of sources serving largely the
same content, found by counting shared distinct token-shingle hashes.

A web-scale frontier wastes enormous budget crawling mirrors (the same
site behind several hostnames, CDN aliases, scraped re-hosts).  The
reference crawls one curated site and never meets this
(otodom/orchestrator/handler.go:63-101 walks a single domain); at
10^10-URL scale mirror collapse is a first-class hygiene stage: detect
host pairs with high content containment, then keep one of each pair
in the frontier.

Scale shape (all sizes at the 10^6-host / 10^10-doc design point):

* the per-(source, shingle) table is built with one explode + one
  ``distinct`` — keys are (string, int64) pairs, text never shuffles;
* **hot-shingle cap**: a shingle present on more than
  ``max_gram_sources`` sources is boilerplate ("all rights reserved")
  and is DROPPED before the self-join.  Without the cap one universal
  shingle fans out to C(n_hosts, 2) pairs — the same skew failure the
  simhash band join guards against; with it, per-shingle join fan-out
  is bounded by ``max_gram_sources**2``;
* the cap filter, the self-join, and the pair count all hash on the
  same keys (``gh``, then the pair), so every shuffle is
  combiner-backed and AQE can reuse the ``gh`` exchange;
* per-source totals are O(sources) rows and BROADCAST back for the
  containment score — integer basis points (``div``), bit-identical
  across engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions import text as TX


def source_shingles(
    docs: DataFrame,
    n: int = 7,
    source_col: str = "source",
    text_col: str = "text",
) -> DataFrame:
    """Distinct (source, gh) rows: every token ``n``-gram a source
    serves, as a portable 60-bit hash (``text.md5_int60`` — the same
    cross-engine-checkable hash the other curation ops use).  Per-doc
    duplicates are already collapsed by ``token_ngrams`` (distinct per
    doc); the ``distinct()`` collapses across a source's documents."""
    return (
        docs.select(
            F.col(source_col).alias("source"),
            F.explode(TX.token_ngrams(text_col, n)).alias("gram"),
        )
        .select("source", TX.md5_int60(F.col("gram")).alias("gh"))
        .distinct()
    )


def mirror_pairs(
    docs: DataFrame,
    n: int = 7,
    min_shared: int = 20,
    max_gram_sources: int = 64,
    source_col: str = "source",
    text_col: str = "text",
) -> DataFrame:
    """Source pairs sharing at least ``min_shared`` distinct token
    ``n``-gram hashes, with an exact-integer containment score.

    Returns (source_a, source_b, shared_grams, containment_bp) where
    ``source_a < source_b`` and ``containment_bp`` = floor(10000 *
    shared / min(|grams_a|, |grams_b|)) — the overlap coefficient in
    basis points, so a small site fully contained in a large mirror
    still scores 10000.

    Shingles on more than ``max_gram_sources`` sources are dropped
    before the self-join (boilerplate; see module docstring).
    """
    gs = source_shingles(docs, n=n, source_col=source_col, text_col=text_col)

    # combiner-backed per-shingle source count; gs is already distinct
    # on (source, gh) so count(*) == countDistinct(source)
    gh_ok = (
        gs.groupBy("gh")
        .agg(F.count(F.lit(1)).alias("nsrc"))
        .filter((F.col("nsrc") >= 2) & (F.col("nsrc") <= max_gram_sources))
        .select("gh")
    )
    capped = gs.join(gh_ok, "gh")

    pairs = (
        capped.select("gh", F.col("source").alias("source_a"))
        .join(capped.select("gh", F.col("source").alias("source_b")), "gh")
        .filter(F.col("source_a") < F.col("source_b"))
        .groupBy("source_a", "source_b")
        .agg(F.count(F.lit(1)).cast("long").alias("shared_grams"))
        .filter(F.col("shared_grams") >= min_shared)
    )

    totals = gs.groupBy("source").agg(F.count(F.lit(1)).alias("n_grams"))
    return (
        pairs.join(
            F.broadcast(totals.select(F.col("source").alias("source_a"), F.col("n_grams").alias("na"))),
            "source_a",
        )
        .join(
            F.broadcast(totals.select(F.col("source").alias("source_b"), F.col("n_grams").alias("nb"))),
            "source_b",
        )
        .select(
            "source_a",
            "source_b",
            "shared_grams",
            F.expr("div(10000 * shared_grams, least(na, nb))").alias("containment_bp"),
        )
    )


def collapse_mirrors(frontier: DataFrame, pairs: DataFrame, host_col: str = "host") -> DataFrame:
    """Frontier gate: for every detected mirror pair, drop the
    lexicographically larger host (the deterministic loser — same
    keeper rule as min-id dedup).  The loser list is O(mirror pairs)
    rows and BROADCASTS into a left-anti join, so the 10^10-row
    frontier never shuffles — the same composition shape as the robots
    and trap gates (operators/robots.py, operators/traps.py)."""
    losers = pairs.select(F.col("source_b").alias(host_col)).distinct()
    return frontier.join(F.broadcast(losers), host_col, "left_anti")
