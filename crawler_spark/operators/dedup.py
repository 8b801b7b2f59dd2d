"""URL-seen dedup: partitioned Bloom prefilter + exact anti-join.

Semantics = the reference's ``INSERT ... ON CONFLICT DO NOTHING``
(commons/Entry.go:37): a candidate URL is dropped iff its canonical
hash is already in the seen set.  Exactness is mandatory (north_rule:
"identical URL-seen set"), so the Bloom filter is *only* a prefilter:

- candidates whose partition Bloom says "definitely new" skip the join
  entirely (the overwhelming majority in a growing crawl);
- the "maybe seen" remainder goes through an exact ``left_anti`` join.

At 10^10 seen URLs the anti-join's build side is the bottleneck; the
prefilter shrinks the probe set by orders of magnitude.  Filters are
partitioned by ``pmod(url_hash, n_parts)`` so each blob stays small
(bits sized for the partition's key count) and filter build is
embarrassingly parallel (``applyInPandas`` per partition, numpy
bitset).  Membership tests are Arrow-batched pandas UDFs over the
broadcast blob dict — no per-row Python.

Spark's own runtime Bloom pushdown
(``spark.sql.optimizer.runtime.bloomFilter.enabled``) covers the
in-plan join case; this operator exists because the seen set is
*persistent cross-round state*, rebuilt incrementally, not a plan-local
subquery.  (``bloom_filter_agg``/``might_contain`` are not exposed as
public SQL functions in this Spark build — verified — hence the
pandas-UDF implementation.)
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

BLOOM_SCHEMA = T.StructType(
    [
        T.StructField("part_id", T.IntegerType(), False),
        T.StructField("filter", T.BinaryType(), False),
        T.StructField("n_keys", T.LongType(), False),
    ]
)

_K_HASHES = 5
_BITS_PER_KEY = 10  # ~1% FPP at k=5


def _bit_positions(hashes: np.ndarray, m_bits: int) -> Iterator[np.ndarray]:
    """Double hashing: g_i(x) = h1 + i*h2 mod m (Kirsch-Mitzenmacher)."""
    h = hashes.astype(np.uint64)
    h1 = h % np.uint64(m_bits)
    h2 = (h >> np.uint64(17) | np.uint64(1)) % np.uint64(m_bits)
    for i in range(_K_HASHES):
        yield ((h1 + np.uint64(i) * h2) % np.uint64(m_bits)).astype(np.int64)


def _build_filter(hashes: np.ndarray, m_bits: int) -> bytes:
    bits = np.zeros(m_bits, dtype=bool)
    for pos in _bit_positions(hashes, m_bits):
        bits[pos] = True
    return np.packbits(bits).tobytes()


def _test_filter(blob: bytes, hashes: np.ndarray) -> np.ndarray:
    bits = np.unpackbits(np.frombuffer(blob, dtype=np.uint8))
    m_bits = len(bits)
    maybe = np.ones(len(hashes), dtype=bool)
    for pos in _bit_positions(hashes, m_bits):
        maybe &= bits[pos].astype(bool)
    return maybe


def part_id_col(url_hash, n_parts: int):
    return F.pmod(F.col(url_hash) if isinstance(url_hash, str) else url_hash, F.lit(n_parts)).cast(
        "int"
    )


def build_seen_filters(seen: DataFrame, n_parts: int = 64) -> DataFrame:
    """Per-partition Bloom blobs over the full seen set (url_hash BIGINT)."""

    def build(pdf: pd.DataFrame) -> pd.DataFrame:
        part = int(pdf["part_id"].iloc[0])
        h = pdf["url_hash"].to_numpy(dtype=np.int64)
        m_bits = max(1024, 8 * ((len(h) * _BITS_PER_KEY + 7) // 8))
        return pd.DataFrame(
            {"part_id": [part], "filter": [_build_filter(h, m_bits)], "n_keys": [len(h)]}
        )

    return (
        seen.select("url_hash")
        .withColumn("part_id", part_id_col("url_hash", n_parts))
        .groupBy("part_id")
        .applyInPandas(build, schema=BLOOM_SCHEMA)
    )


def anti_join_seen(
    candidates: DataFrame,
    seen: DataFrame,
    filters: DataFrame | None = None,
    n_parts: int = 64,
) -> DataFrame:
    """candidates \\ seen, by url_hash — exact, Bloom-prefiltered.

    ``filters``: output of :func:`build_seen_filters` (or None → plain
    anti-join).  The logical result is identical with or without the
    prefilter (pinned in tests); only the join input size changes.
    """
    if filters is None:
        return candidates.join(seen.select("url_hash"), "url_hash", "left_anti")

    blobs = {r["part_id"]: bytes(r["filter"]) for r in filters.collect()}
    spark = candidates.sparkSession
    bc = spark.sparkContext.broadcast(blobs)

    @F.pandas_udf(T.BooleanType())
    def maybe_seen(url_hash: pd.Series) -> pd.Series:
        h = url_hash.to_numpy(dtype=np.int64)
        parts = (h % n_parts + n_parts) % n_parts  # pmod
        out = np.zeros(len(h), dtype=bool)
        table = bc.value
        for p in np.unique(parts):
            blob = table.get(int(p))
            if blob is None:
                continue
            m = parts == p
            out[m] = _test_filter(blob, h[m])
        return pd.Series(out)

    flagged = candidates.withColumn("_maybe", maybe_seen(F.col("url_hash")))
    definitely_new = flagged.filter(~F.col("_maybe")).drop("_maybe")
    needs_check = flagged.filter(F.col("_maybe")).drop("_maybe")
    checked = needs_check.join(seen.select("url_hash"), "url_hash", "left_anti")
    return definitely_new.unionByName(checked)
