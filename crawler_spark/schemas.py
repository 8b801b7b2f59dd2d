"""All engine StructTypes in one place (SURVEY.md §1, FIXTURES.md).

The reference ships its schema as data (Field triples,
otodom/commons/entry.go:12-27); we declare real Spark StructTypes and
keep ``schema_name``/``schema_version`` as partition columns for
evolution (SURVEY.md §1.4).
"""

from __future__ import annotations

from pyspark.sql import types as T

# BASELINE.json input_hint — the image+caption payload table.
WEB_IMAGES = T.StructType(
    [
        T.StructField("image_id", T.StringType(), False),
        T.StructField("bytes", T.BinaryType(), False),
        T.StructField("w", T.IntegerType(), False),
        T.StructField("h", T.IntegerType(), False),
        T.StructField("fmt", T.StringType(), False),
        T.StructField("caption", T.StringType(), False),
        T.StructField("phash", T.LongType(), False),
    ]
)

SEEDS = T.StructType(
    [
        T.StructField("seed_id", T.IntegerType(), False),
        T.StructField("url", T.StringType(), False),
        T.StructField("domain", T.StringType(), False),
        T.StructField("schema_name", T.StringType(), False),
        T.StructField("schema_version", T.StringType(), False),
        T.StructField("priority", T.IntegerType(), False),
    ]
)

# The synthetic "web": what a fetch of a URL returns (closed world).
WEB_PAGES = T.StructType(
    [
        T.StructField("url", T.StringType(), False),
        T.StructField("url_hash", T.LongType(), False),
        T.StructField("host", T.StringType(), False),
        T.StructField("page", T.IntegerType(), False),
        T.StructField("last_page", T.IntegerType(), False),
        T.StructField("listing_ids", T.ArrayType(T.LongType()), False),
        T.StructField("listing_prices", T.ArrayType(T.StringType()), False),
        T.StructField("listing_links", T.ArrayType(T.StringType()), False),
        T.StructField("fail_attempts", T.IntegerType(), False),
    ]
)

ROBOTS = T.StructType(
    [
        T.StructField("host", T.StringType(), False),
        T.StructField("disallow_prefix", T.StringType(), True),
        T.StructField("crawl_delay_ms", T.IntegerType(), False),
    ]
)

# The work queue (reference []Page, otodom/commons/page.go:4-7).
FRONTIER = T.StructType(
    [
        T.StructField("url", T.StringType(), False),
        T.StructField("url_hash", T.LongType(), False),
        T.StructField("host", T.StringType(), False),
        T.StructField("page", T.IntegerType(), False),
        T.StructField("priority", T.IntegerType(), False),
        T.StructField("round_added", T.IntegerType(), False),
        T.StructField("attempts", T.IntegerType(), False),
        T.StructField("seed_id", T.IntegerType(), False),
        T.StructField("domain", T.StringType(), False),
        T.StructField("schema_name", T.StringType(), False),
        T.StructField("schema_version", T.StringType(), False),
    ]
)

URL_SEEN = T.StructType(
    [
        T.StructField("url_hash", T.LongType(), False),
        T.StructField("first_round", T.IntegerType(), False),
    ]
)

# Dispatch log: the crawl ordering evidence (north_rule).
DISPATCH_LOG = T.StructType(
    [
        T.StructField("round", T.IntegerType(), False),
        T.StructField("seq", T.LongType(), False),
        T.StructField("url_hash", T.LongType(), False),
        T.StructField("url", T.StringType(), False),
        T.StructField("host", T.StringType(), False),
        T.StructField("page", T.IntegerType(), False),
        T.StructField("priority", T.IntegerType(), False),
    ]
)

# Result rows: one per extracted listing (reference Entry, 7 string cols,
# otodom/flat_crawler/handler.go:17-25) + the image payload columns.
RESULTS = T.StructType(
    [
        T.StructField("round", T.IntegerType(), False),
        T.StructField("schema_name", T.StringType(), False),
        T.StructField("schema_version", T.StringType(), False),
        T.StructField("domain", T.StringType(), False),
        T.StructField("page_url_hash", T.LongType(), False),
        T.StructField("image_id", T.StringType(), False),
        T.StructField("caption", T.StringType(), False),
        T.StructField("bytes", T.BinaryType(), True),
        T.StructField("w", T.IntegerType(), True),
        T.StructField("h", T.IntegerType(), True),
        T.StructField("fmt", T.StringType(), True),
        T.StructField("phash", T.LongType(), True),
        T.StructField("price_digits", T.StringType(), True),
        T.StructField("link", T.StringType(), True),
        # verify_rows gate (engine cfg.verify_rows, input_hint invariant)
        T.StructField("psnr_db", T.DoubleType(), True),
        T.StructField("phash_ok", T.BooleanType(), True),
    ]
)

# Metrics/lineage rows (reference Result, commons/result.go:6-11 + R3).
CRAWL_METRICS = T.StructType(
    [
        T.StructField("round", T.IntegerType(), False),
        T.StructField("status", T.BooleanType(), False),
        T.StructField("domain", T.StringType(), True),
        T.StructField("ingestion_time", T.TimestampType(), True),
        T.StructField("message", T.StringType(), True),
        T.StructField("n_dispatched", T.LongType(), False),
        T.StructField("n_fetched", T.LongType(), False),
        T.StructField("n_failed", T.LongType(), False),
        T.StructField("n_dead", T.LongType(), False),
        T.StructField("n_results", T.LongType(), False),
        T.StructField("n_expanded", T.LongType(), False),
        T.StructField("n_deduped", T.LongType(), False),
        T.StructField("n_blocked_robots", T.LongType(), False),
        T.StructField("n_deferred_politeness", T.LongType(), False),
    ]
)
