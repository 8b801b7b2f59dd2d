"""Deterministic synthetic-web fixture generator (FIXTURES.md §§1-4).

Everything is derived from (seed, index) or from ``xxhash64`` of the
URL itself — no wall clock, no network, no Python PRNG state shared
across processes — so regeneration is bit-identical anywhere.

Generation is *distributed*: seeds are a tiny driver-side table; pages
are derived with pure Spark expressions (explode/sequence/transform —
this is the same frontier-expansion shape the engine itself uses); the
image payload table is generated with ``mapInPandas`` (Arrow-batched
numpy, parallel across executors).  Fixtures are written once to
parquet; the Spark engine and the pure-Python golden model then read
the *same files*, which decouples generator internals from crawl
equivalence.

Scale knobs: n_seeds, n_hosts, n_images.  A fetch of page p of seed s
returns 24 listings (reference: ~24 articles per otodom listing page,
flat_crawler/handler.go:93).
"""

from __future__ import annotations

import os
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import images as I
from .canon import with_url_identity
from .schemas import WEB_IMAGES

# Reference extraction corpus (otodom/commons/extensions_test.go:11-15):
# Polish-formatted numerics with non-breaking-space grouping.
POLISH_PRICES = [
    "40 zł/m²",
    "39 m²",
    "1 100 zł /mc",
    "2 350 zł",
    "58,5 m²",
    "750 000 zł",
]

LISTINGS_PER_PAGE = 24
DEFAULT_SEED = 42

# Raw selector-text analogues for the two extraction variants
# (flat_crawler/handler.go:95-101 vs office_crawler/handler.go:94-101):
# rooms (flat-only selector), area (both), total price (office-only).
POLISH_ROOMS = ["2 pokoje", "3 pokoje", "4 pokoje", "kawalerka"]  # last: no digits
POLISH_AREAS = ["39 m²", "58,5 m²", "120 m²"]
POLISH_TOTALS = ["750 000 zł", "1 100 zł /mc", "2 350 zł"]


# ------------------------------------------------------------------ seeds
def gen_seeds_df(
    spark: SparkSession, n_seeds: int, n_hosts: int, seed: int = DEFAULT_SEED
) -> DataFrame:
    """Seed list (reference: SOURCE_URL env per saga, stack.yml:24,54,84,112).

    Hosts are assigned by a multiplicative hash so several seeds share a
    host (politeness contention); cat==seed_id keeps URLs unique.
    """
    df = spark.range(n_seeds).select(
        F.col("id").cast("int").alias("seed_id"),
        F.pmod(F.xxhash64(F.col("id") + F.lit(seed)), F.lit(n_hosts)).alias("_h"),
    )
    return df.select(
        "seed_id",
        F.format_string("https://host%04d.example/list?cat=%d", "_h", "seed_id").alias("url"),
        F.when(F.col("seed_id") % 2 == 0, "otodom-rent").otherwise("otodom-buy").alias("domain"),
        F.when(F.col("seed_id") % 2 == 0, "flat").otherwise("office").alias("schema_name"),
        F.lit("v0.0.3").alias("schema_version"),
        F.lit(0).alias("priority"),
    )


# ------------------------------------------------------------------ web pages
def gen_web_pages_df(seeds: DataFrame, n_images: int) -> DataFrame:
    """The closed-world web: every page a fetch could return.

    Page 0 is the seed listing itself; pages 1..last_page are the
    pagination variants (URL construction per total_pages/handler.go:54-60:
    seed URLs always contain '?', so the page param joins with '&').
    """
    lp = (F.pmod(F.xxhash64(F.col("url")), F.lit(8)) + F.lit(3)).cast("int")
    pages = (
        seeds.withColumn("last_page", lp)
        .select(
            "url",
            "last_page",
            F.explode(F.sequence(F.lit(0), F.col("last_page"))).alias("page"),
        )
        .select(
            F.when(F.col("page") == 0, F.col("url"))
            .otherwise(F.concat("url", F.lit("&page="), F.col("page")))
            .alias("url"),
            "page",
            "last_page",
        )
    )
    pages = with_url_identity(pages)
    j = F.sequence(F.lit(0), F.lit(LISTINGS_PER_PAGE - 1))
    price_arr = F.array(*[F.lit(p) for p in POLISH_PRICES])
    # pre-mod the hash into 31 bits before arithmetic: xxhash64 spans the
    # full long range and `h + x*c` overflows under ANSI mode otherwise
    h31 = F.pmod(F.xxhash64("url"), F.lit(1 << 31))
    fail_r = F.pmod(F.xxhash64("url"), F.lit(100))
    return pages.select(
        "url",
        "url_hash",
        "host",
        "page",
        "last_page",
        F.transform(
            j, lambda x: F.pmod(h31 + x * F.lit(2654435761), F.lit(n_images))
        ).alias("listing_ids"),
        F.transform(
            j,
            lambda x: F.element_at(
                price_arr, (F.pmod(h31 + x, F.lit(len(POLISH_PRICES))) + 1).cast("int")
            ),
        ).alias("listing_prices"),
        F.transform(
            j,
            lambda x: F.format_string(
                "https://%s/oferta/x-ID%d.html#a%d",
                "host",
                F.pmod(h31 + x * F.lit(2654435761), F.lit(n_images)),
                F.pmod(x, F.lit(16)),
            ),
        ).alias("listing_links"),
        F.transform(
            j,
            lambda x: F.element_at(
                F.array(*[F.lit(s) for s in POLISH_ROOMS]),
                (F.pmod(h31 + x * 3, F.lit(len(POLISH_ROOMS))) + 1).cast("int"),
            ),
        ).alias("listing_rooms"),
        F.transform(
            j,
            lambda x: F.element_at(
                F.array(*[F.lit(s) for s in POLISH_AREAS]),
                (F.pmod(h31 + x * 5, F.lit(len(POLISH_AREAS))) + 1).cast("int"),
            ),
        ).alias("listing_areas"),
        F.transform(
            j,
            lambda x: F.element_at(
                F.array(*[F.lit(s) for s in POLISH_TOTALS]),
                (F.pmod(h31 + x * 7, F.lit(len(POLISH_TOTALS))) + 1).cast("int"),
            ),
        ).alias("listing_totals"),
        F.when(fail_r < 90, F.lit(0))
        .when(fail_r < 99, (F.pmod(F.xxhash64(F.concat("url", F.lit("fail"))), F.lit(4)) + 1))
        .otherwise(F.lit(99))
        .cast("int")
        .alias("fail_attempts"),
    )


# ------------------------------------------------------------------ robots
def gen_robots_df(spark: SparkSession, n_hosts: int) -> DataFrame:
    """robots.txt rules per host (FIXTURES.md §4): hosts h%10==0 disallow
    the /list prefix entirely; crawl delay cycles {0,100,500} ms."""
    return spark.range(n_hosts).select(
        F.format_string("https://host%04d.example", "id").alias("_base"),
        F.format_string("host%04d.example", "id").alias("host"),
        F.when(F.col("id") % 10 == 0, F.lit("/list")).otherwise(F.lit("")).alias(
            "disallow_prefix"
        ),
        F.element_at(
            F.array(F.lit(0), F.lit(100), F.lit(500)), (F.pmod(F.col("id"), F.lit(3)) + 1).cast("int")
        ).cast("int").alias("crawl_delay_ms"),
    ).drop("_base")


# ------------------------------------------------------------------ images
DIM_PROFILES = {
    # (w options, h options) cycled by image index
    "default": ((32, 64, 96), (32, 48, 64)),
    # uniform small payloads: used by the scaling bench so aggregate
    # byte volume stays RAM-resident while row counts (and therefore
    # decode/verify parallel work) scale up
    "small": ((32, 32, 32), (32, 32, 32)),
}


def gen_web_images_df(
    spark: SparkSession,
    n_images: int,
    seed: int = DEFAULT_SEED,
    parallelism: int = 32,
    dim_profile: str = "default",
) -> DataFrame:
    """input_hint payload table, generated distributed via mapInPandas."""
    w_opts, h_opts = DIM_PROFILES[dim_profile]

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        adj = ["quiet", "bright", "spacious", "cozy", "modern", "sunny", "classic"]
        noun = ["flat", "office", "loft", "studio", "house", "suite", "room",
                "atelier", "duplex", "penthouse", "cabin"]
        city = ["Warszawa", "Krakow", "Gdansk", "Wroclaw", "Poznan"]
        for pdf in batches:
            ks = pdf["id"].to_numpy()
            rows = {"image_id": [], "bytes": [], "w": [], "h": [], "fmt": [],
                    "caption": [], "phash": []}
            for k in ks:
                k = int(k)
                w = w_opts[k % 3]
                h = h_opts[k % 3]
                fmt = "jpeg" if k % 4 == 0 else "png"
                px = I.gen_pixels(seed, k, w, h)
                data = I.encode_image(px, fmt)
                ph = I.phash64(I.decode_image(data, fmt))
                rows["image_id"].append(f"img-{k:012d}")
                rows["bytes"].append(data)
                rows["w"].append(w)
                rows["h"].append(h)
                rows["fmt"].append(fmt)
                rows["caption"].append(
                    f"caption {k}: {adj[k % 7]} {noun[k % 11]} in {city[k % 5]}"
                )
                rows["phash"].append(ph)
            yield pd.DataFrame(rows)

    return (
        spark.range(n_images)
        .repartition(parallelism)
        .mapInPandas(gen, schema=WEB_IMAGES)
    )


# ------------------------------------------------------------------ write-all
def write_fixtures(
    spark: SparkSession,
    out_dir: str,
    n_seeds: int = 40,
    n_hosts: int = 12,
    n_images: int = 2000,
    seed: int = DEFAULT_SEED,
    dim_profile: str = "default",
) -> dict[str, str]:
    """Generate + write all fixture tables; returns {name: path}."""
    paths = {}
    seeds = gen_seeds_df(spark, n_seeds, n_hosts, seed)
    for name, df in [
        ("seeds", seeds),
        ("web_pages", gen_web_pages_df(seeds, n_images)),
        ("robots", gen_robots_df(spark, n_hosts)),
        ("web_images", gen_web_images_df(spark, n_images, seed, dim_profile=dim_profile)),
    ]:
        p = os.path.join(out_dir, name)
        df.write.mode("overwrite").parquet(p)
        paths[name] = p
    return paths
