"""Snapshot-committed parquet state store (SURVEY.md §1.3, §4.2 item 4).

Iceberg-style semantics without the Iceberg runtime jar (not available
offline in this sandbox — the swap is confined to this module):

- every table is a directory of round-partitioned parquet
  (``<table>/round=N/``), Hive layout → Catalyst partition-prunes on
  ``round`` exactly like the reference's Hive-style MinIO paths
  (storage/handler.go:103);
- append tables (results, url_seen, metrics, dispatch_log, dead, …)
  accumulate one partition per round; the frontier is an INCREMENTAL
  log (``frontier_add``/``frontier_del`` deltas over a periodically
  compacted ``frontier_base`` snapshot — see :meth:`read_frontier`),
  so per-round frontier write volume is ∝ the round's delta, not
  O(|frontier|);
- a round becomes visible only when ``checkpoint.json`` is atomically
  replaced (tmp + os.replace) AFTER all its partitions are fully
  written — readers resolve the committed round first and read only
  partition dirs ≤ it, so a crash mid-round leaves invisible garbage
  that the next run simply overwrites: snapshot isolation + exactly-
  once per round (the reference gets idempotence from ON CONFLICT DO
  NOTHING, commons/Entry.go:37; we get it from atomic manifest swap);
- resuming = read checkpoint, continue from round+1 (north_rule
  resumability; equivalence pinned in tests/test_engine.py).
"""

from __future__ import annotations

import json
import os
import shutil
import tempfile
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

APPEND_TABLES = (
    "results",
    "url_seen",
    "metrics",
    "dispatch_log",
    "dead",
    "expansion_log",
    "schemas",
    "frontier_add",
    "frontier_del",
    "url_seen_del",  # recrawl invalidations (engine admin rounds)
)
REWRITE_TABLES = ("frontier_base", "frontier_head", "seen_filters")

# Hive sub-partitioning inside each round dir, mirroring the reference's
# object layout `schema_name=%s/schema_version=%s/created=%d/...`
# (storage/handler.go:103): results/round=N/schema_name=…/schema_version=…/
# → Catalyst partition-prunes per-schema reads down to one subtree.
TABLE_PARTITIONS = {"results": ["schema_name", "schema_version"]}
# layout-optional Hive columns: applied only when the engine put them in
# the frame (url_seen's seen_part = pmod(url_hash, n_parts), the pruned
# exact-verify layout — CrawlConfig.partition_url_seen)
OPTIONAL_TABLE_PARTITIONS = {"url_seen": ["seen_part"]}


def _round_of(dirname: str) -> int | None:
    """Round number of a ``round=N`` partition dir; None for anything
    else (stray editor/tmp dirs must be ignored, not crash every read)."""
    if not dirname.startswith("round="):
        return None
    try:
        return int(dirname.split("=", 1)[1])
    except ValueError:
        return None


class StateStore:
    def __init__(self, spark: SparkSession, root: str):
        self.spark = spark
        self.root = root
        os.makedirs(root, exist_ok=True)

    # ------------------------------------------------------------- commit
    def _ckpt_path(self) -> str:
        return os.path.join(self.root, "checkpoint.json")

    def committed(self) -> dict | None:
        p = self._ckpt_path()
        if not os.path.exists(p):
            return None
        with open(p) as f:
            return json.load(f)

    def committed_round(self) -> int:
        c = self.committed()
        return -1 if c is None else int(c["round"])

    def write_partition(
        self, table: str, round_no: int, df: DataFrame, n_files: int | None = None
    ) -> None:
        # `round` lives in the Hive path, not the data files (partition
        # pruning + no duplicate column on basePath reads).  ``n_files``
        # (estimated from the row count the engine already has) keeps
        # small state tables to one file instead of one per shuffle
        # partition — at both bench and cluster scale, directory fan-out
        # on 100-row tables is pure overhead.
        if "round" in df.columns:
            df = df.drop("round")
        if n_files is not None:
            df = df.coalesce(n_files)
        path = os.path.join(self.root, table, f"round={round_no}")
        writer = df.write.mode("overwrite")
        pcols = TABLE_PARTITIONS.get(table)
        if pcols is None:
            opt = OPTIONAL_TABLE_PARTITIONS.get(table)
            if opt and all(c in df.columns for c in opt):
                pcols = opt
        if pcols:
            writer = writer.partitionBy(*pcols)
        writer.parquet(path)

    def write_row_partition(self, table: str, round_no: int, row: dict, schema) -> None:
        """Driver-side single-row partition write (pyarrow, no Spark job).

        For per-round metadata rows (metrics/lineage): a Spark job +
        commit protocol for ONE row costs seconds; pyarrow writes the
        same Spark-readable parquet in milliseconds."""
        import pyarrow as pa
        import pyarrow.parquet as pq

        path = os.path.join(self.root, table, f"round={round_no}")
        os.makedirs(path, exist_ok=True)
        arrays, names = [], []
        for f in schema.fields:
            if f.name == "round":
                continue
            v = row.get(f.name)
            t = f.dataType.simpleString()
            pa_t = {
                "int": pa.int32(),
                "bigint": pa.int64(),
                "string": pa.string(),
                "boolean": pa.bool_(),
                "timestamp": pa.timestamp("us", tz="UTC"),
            }[t]
            arrays.append(pa.array([v], type=pa_t))
            names.append(f.name)
        pq.write_table(pa.table(arrays, names=names), os.path.join(path, "part-0.parquet"))

    # ---------------------------------------------------- footer stats
    def partition_row_count(self, table: str, round_no: int) -> int:
        """Row count of one round partition from parquet footers —
        driver-side milliseconds, no Spark job.  Exact (parquet footers
        carry num_rows)."""
        import pyarrow.parquet as pq

        path = os.path.join(self.root, table, f"round={round_no}")
        if not os.path.isdir(path):
            return 0
        total = 0
        for d, _dirs, files in os.walk(path):  # Hive sub-partitions nest
            for f in files:
                if f.endswith(".parquet") or f.startswith("part-"):
                    try:
                        total += pq.read_metadata(os.path.join(d, f)).num_rows
                    except Exception:
                        continue
        return total

    def read_partition_column(self, table: str, round_no: int, column: str):
        """One column of one round partition as a pyarrow ChunkedArray
        (driver-side).  Only for partitions known to be driver-sized —
        callers gate on partition_row_count first."""
        import pyarrow.parquet as pq

        path = os.path.join(self.root, table, f"round={round_no}")
        return pq.read_table(path, columns=[column])[column]

    def commit(self, round_no: int, stats: dict | None = None) -> None:
        """Atomically publish round ``round_no`` (and everything before it)."""
        payload = {
            "round": round_no,
            "committed_at_unix": int(time.time()),
            "stats": stats or {},
        }
        fd, tmp = tempfile.mkstemp(dir=self.root, suffix=".ckpt.tmp")
        with os.fdopen(fd, "w") as f:
            json.dump(payload, f, indent=1)
            # durability before visibility: without the fsync pair a
            # power loss after os.replace can publish an EMPTY checkpoint
            # (rename journaled before data), which fails loudly on the
            # next committed() parse but loses the crawl's resume point
            f.flush()
            os.fsync(f.fileno())
        os.replace(tmp, self._ckpt_path())
        dfd = os.open(self.root, os.O_RDONLY)
        try:
            os.fsync(dfd)
        finally:
            os.close(dfd)

    # ------------------------------------------------------------- read
    def snapshots(self) -> list[int]:
        """Committed snapshot ids (= round numbers) available for time
        travel.  Every commit publishes rounds ≤ N and nothing deletes
        earlier round partitions (vacuum only removes dirs BEYOND the
        checkpoint), so each past committed round remains a readable
        snapshot — the Iceberg snapshot-log analogue of this layout."""
        r = self.committed_round()
        return list(range(0, r + 1)) if r >= 0 else []

    def _resolve_as_of(self, as_of: int | None) -> int:
        r = self.committed_round()
        if as_of is None:
            return r
        if as_of > r or as_of < 0:
            raise ValueError(
                f"as_of={as_of} is not a committed snapshot (committed round: {r})"
            )
        return as_of

    def has_partitions(self, table: str, as_of: int | None = None) -> bool:
        """True iff the table has at least one COMMITTED round partition
        (a dir freshly written by an in-flight round doesn't count)."""
        return bool(self._round_dirs(table, self._resolve_as_of(as_of)))

    def _round_dirs(self, table: str, upto: int) -> list[str]:
        base = os.path.join(self.root, table)
        if not os.path.isdir(base):
            return []
        out = []
        for d in os.listdir(base):
            r = _round_of(d)
            if r is not None and r <= upto:
                out.append((r, os.path.join(base, d)))
        # numeric sort: lexicographic would rank round=9 above round=10,
        # corrupting rewrite-table "latest" reads
        return [p for _, p in sorted(out)]

    def read(
        self,
        table: str,
        schema: T.StructType | None = None,
        rewrite: bool = False,
        as_of: int | None = None,
    ) -> DataFrame:
        """Committed view: all rounds ≤ checkpoint (append tables) or the
        latest committed round only (``rewrite=True`` snapshot tables).

        ``as_of``: time travel — read the table exactly as it was when
        round ``as_of`` was committed (append tables: rounds ≤ as_of;
        rewrite tables: the latest snapshot ≤ as_of).  Must name a
        committed snapshot (:meth:`snapshots`); reading past the
        checkpoint would break snapshot isolation and raises."""
        r = self._resolve_as_of(as_of)
        dirs = self._round_dirs(table, r)
        if rewrite:
            dirs = dirs[-1:]
        if not dirs:
            assert schema is not None, f"empty table {table} needs an explicit schema"
            return self.spark.createDataFrame([], schema)
        base = os.path.join(self.root, table)
        reader = self.spark.read.option("basePath", base)
        if schema is not None:
            # explicit schema skips footer inference (a listing + read
            # job per round otherwise).  Partition discovery still
            # APPENDS the `round` Hive column even under a user schema,
            # so project back to exactly the schema's columns — callers
            # that need `round` pass no schema.
            reader = reader.schema(schema)
            return reader.parquet(*dirs).select(*[f.name for f in schema.fields])
        return reader.parquet(*dirs)

    def _latest_base_round(self, upto: int) -> int:
        base = os.path.join(self.root, "frontier_base")
        if not os.path.isdir(base):
            return -1
        rounds = [
            r for r in (_round_of(d) for d in os.listdir(base))
            if r is not None and r <= upto
        ]
        return max(rounds) if rounds else -1

    def read_frontier(self, schema: T.StructType, as_of: int | None = None) -> DataFrame:
        """Committed frontier TAIL, reconstructed from the incremental
        log.  (The per-host top-K working set lives in the separate
        ``frontier_head`` rewrite table; the engine reads this tail only
        at compaction refills — never on steady rounds.)

        ``as_of`` time-travels the reconstruction: base snapshot ≤
        as_of plus deltas ≤ as_of — the tail exactly as committed at
        that round (pinned against live per-round captures in tests).

        The tail is NOT rewritten per round (an O(|frontier|) write
        every round dwarfs the dispatched delta at 10^10 rows).  State =
        a base snapshot (``frontier_base``, written at bootstrap and at
        compaction rounds) plus per-round deltas: ``frontier_add``
        (head-overflow demotions) and ``frontier_del`` (dispatched
        url_hashes — kills a lazily-duplicated tail copy of a key that
        entered the head independently).  A key is live iff its latest
        add round ≥ its latest del round (tie means live), and its row
        is the latest add.  Reconstruction is two url_hash-key shuffles
        over base+deltas; compaction bounds the delta tail.
        """
        from pyspark.sql import Window
        from pyspark.sql import functions as F

        r = self._resolve_as_of(as_of)
        base_round = self._latest_base_round(r)
        if base_round < 0:
            return self.spark.createDataFrame([], schema)
        cols = [f.name for f in schema.fields]
        base_df = (
            self.spark.read.schema(schema)
            .parquet(os.path.join(self.root, "frontier_base", f"round={base_round}"))
            .withColumn("_add_round", F.lit(base_round))
        )
        add_dirs = [
            d
            for d in self._round_dirs("frontier_add", r)
            if int(os.path.basename(d).split("=", 1)[1]) > base_round
        ]
        del_dirs = [
            d
            for d in self._round_dirs("frontier_del", r)
            if int(os.path.basename(d).split("=", 1)[1]) > base_round
        ]
        if not add_dirs and not del_dirs:
            return base_df.drop("_add_round")
        adds = base_df
        if add_dirs:
            delta = (
                self.spark.read.option(
                    "basePath", os.path.join(self.root, "frontier_add")
                )
                .parquet(*add_dirs)
                .withColumn("_add_round", F.col("round").cast("int"))
                .select(*cols, "_add_round")
            )
            adds = adds.unionByName(delta)
        w = Window.partitionBy("url_hash").orderBy(F.col("_add_round").desc())
        latest = adds.withColumn("_rn", F.row_number().over(w)).filter(
            F.col("_rn") == 1
        )
        if del_dirs:
            dels = (
                self.spark.read.option(
                    "basePath", os.path.join(self.root, "frontier_del")
                )
                .parquet(*del_dirs)
                .select("url_hash", F.col("round").cast("int").alias("_del_round"))
                .groupBy("url_hash")
                .agg(F.max("_del_round").alias("_del_round"))
            )
            latest = latest.join(dels, "url_hash", "left").filter(
                F.col("_del_round").isNull()
                | (F.col("_add_round") >= F.col("_del_round"))
            )
        return latest.select(*cols)

    # ------------------------------------------------------------- hygiene
    def vacuum_uncommitted(self) -> None:
        """Drop partition dirs beyond the committed round (crash debris)."""
        r = self.committed_round()
        for table in APPEND_TABLES + REWRITE_TABLES:
            base = os.path.join(self.root, table)
            if not os.path.isdir(base):
                continue
            for d in os.listdir(base):
                rd = _round_of(d)
                if rd is not None and rd > r:
                    shutil.rmtree(os.path.join(base, d), ignore_errors=True)
