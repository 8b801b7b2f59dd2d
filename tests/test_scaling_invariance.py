"""Parallelism invariance (north_rule: identical crawl ordering and
URL-seen set at any cluster size).

The full local[8]-vs-local[32] evidence runs in
scripts/scaling_bench.py (separate JVMs, fingerprint compare); this
in-suite test varies every parallelism-shaped knob that can vary
*within* one session — shuffle partitions, fetch-stage task
granularity, bloom partition count, input partitioning — and pins
bit-identical outputs.
"""

from __future__ import annotations

import pytest

from crawler_spark import fixtures as FX
from crawler_spark import schemas as S
from crawler_spark.engine import CrawlConfig, CrawlEngine
from crawler_spark.sinks import StateStore

MAX_ROUNDS = 12


@pytest.fixture(scope="module")
def fx(spark, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("web-inv"))
    return FX.write_fixtures(spark, out, n_seeds=8, n_hosts=5, n_images=120)


def _run(spark, fx, root, shuffle_parts, pages_per_task, bloom_parts, repart):
    spark.conf.set("spark.sql.shuffle.partitions", str(shuffle_parts))
    try:
        store = StateStore(spark, root)
        web = spark.read.parquet(fx["web_pages"])
        seeds = spark.read.parquet(fx["seeds"])
        if repart:
            web = web.repartition(repart)
            seeds = seeds.repartition(repart)
        engine = CrawlEngine(
            spark,
            store,
            web_pages=web,
            web_images=spark.read.parquet(fx["web_images"]),
            robots=spark.read.parquet(fx["robots"]),
            config=CrawlConfig(
                base_budget=3,
                max_rounds=MAX_ROUNDS,
                pages_per_task=pages_per_task,
                bloom_min_keys=1,
                bloom_parts=bloom_parts,
            ),
        )
        engine.run(seeds)
        log = sorted(
            (r["round"], r["seq"], r["url_hash"])
            for r in store.read("dispatch_log").select("round", "seq", "url_hash").collect()
        )
        seen = sorted(
            (r["url_hash"], r["first_round"])
            for r in store.read("url_seen", S.URL_SEEN).collect()
        )
        return log, seen
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", "4")


def test_dispatch_log_invariant_across_parallelism(spark, fx, tmp_path):
    configs = [
        (1, 1, 2, 1),     # sequential-ish
        (4, 8, 8, 3),     # default-ish
        (13, 3, 5, 7),    # awkward prime partitioning
    ]
    outs = [
        _run(spark, fx, str(tmp_path / f"s{i}"), *cfg) for i, cfg in enumerate(configs)
    ]
    assert outs[0][0] == outs[1][0] == outs[2][0], "dispatch log varies with parallelism"
    assert outs[0][1] == outs[1][1] == outs[2][1], "URL-seen set varies with parallelism"
    assert len(outs[0][0]) > 20
