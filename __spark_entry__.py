"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship politeness-budgeted crawl-round composite
on sf0.001.  ``queries()``/``oracle_sql()`` — one entry per implemented
operator from SURVEY.md §2 plus the training-data ops (dedup,
similarity, text analysis, multimodal); definitions live in
``crawler_spark.contract``.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from crawler_spark import contract


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return contract.q_crawl_round(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(contract.QUERIES)


def oracle_sql() -> dict[str, str]:
    return dict(contract.ORACLES)
