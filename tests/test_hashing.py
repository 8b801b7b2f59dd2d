"""Pin pure-Python XXH64 == Spark xxhash64 (strings and longs)."""

from __future__ import annotations

from pyspark.sql import functions as F

from crawler_spark.hashing import xxhash64_long, xxhash64_str

STRINGS = [
    "",
    "a",
    "abc",
    "1234",
    "12345678",
    "123456789012345",
    "1234567890123456",
    "https://host0001.example/list?cat=3&page=7",
    "https://www.otodom.pl/oferta/mieszkanie-trzypokojowe-ID43Vih",
    "x" * 31,
    "y" * 32,
    "z" * 33,
    "unicode-żółć-日本語-🚀" ,
    "a" * 1000,
]

LONGS = [0, 1, -1, 42, 2**62, -(2**62), 123456789012345678]


def test_xxhash64_str_matches_spark(spark):
    df = spark.createDataFrame([(s,) for s in STRINGS], ["s"])
    got = {r["s"]: r["h"] for r in df.select("s", F.xxhash64("s").alias("h")).collect()}
    for s in STRINGS:
        assert got[s] == xxhash64_str(s), f"mismatch for {s!r}"


def test_xxhash64_long_matches_spark(spark):
    df = spark.createDataFrame([(v,) for v in LONGS], "v: long")
    got = {r["v"]: r["h"] for r in df.select("v", F.xxhash64("v").alias("h")).collect()}
    for v in LONGS:
        assert got[v] == xxhash64_long(v), f"mismatch for {v}"
