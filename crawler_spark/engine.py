"""The crawl engine: a driver loop of deterministic batch rounds.

Each round re-expresses the reference's orchestrator saga
(otodom/orchestrator/handler.go:23-77, traced in SURVEY.md §3.1) as one
Spark dataflow:

    frontier ──politeness window──▶ dispatch ──⋈ web──▶ fetched
       │  deferred                      │seq (global order)   │
       ▼                                ▼                     ▼
    next frontier ◀── merge ◀── expansion(new pages)   ok / retry / dead
       ▲                 │anti-join seen (Bloom-prefiltered)   │
       └─────────────────┴──────────── retries ◀───────────────┘
    writes: results + url_seen + dispatch_log + metrics + dead
    then ONE atomic checkpoint commit (snapshot isolation / resume).

Round structure mirrors the reference's cron-tick batch model
(stack.yml:16,46,76,104 — SURVEY.md §1.5): not an always-on stream but
re-runnable batch rounds with exactly-once state commits.

Determinism guarantee (north_rule "identical crawl ordering"): every
ordering decision derives from the total key (priority, page, url_hash)
— never from timestamps, partition order or monotonically_increasing_id
— so the dispatch log is bit-identical at any parallelism
(tests/test_scaling_invariance.py runs local[8] vs local[32]).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import schemas as S
from .canon import with_url_identity
from .operators import dedup as D
from .operators import fetch as FE
from .operators import frontier as FR
from .operators import politeness as P
from .operators import robots as R
from .operators.ranking import global_sequence
from .sinks import StateStore


@dataclass
class CrawlConfig:
    base_budget: int = P.DEFAULT_BASE_BUDGET
    round_ms: int = P.DEFAULT_ROUND_MS
    max_rounds: int = 64
    seed_limit: int | None = None  # reference mode: 1 (G7 single-seed)
    use_bloom: bool = True
    bloom_parts: int = 64
    num_salts: int = 8
    run_ts: str = "2026-01-01T00:00:00Z"  # P7: one deterministic stamp per run
    extra: dict = field(default_factory=dict)


class CrawlEngine:
    def __init__(
        self,
        spark: SparkSession,
        store: StateStore,
        web_pages: DataFrame,
        web_images: DataFrame,
        robots: DataFrame,
        config: CrawlConfig | None = None,
    ):
        self.spark = spark
        self.store = store
        self.web_pages = web_pages
        self.web_images = web_images
        self.robots = robots
        self.cfg = config or CrawlConfig()

    # ------------------------------------------------------------ bootstrap
    def bootstrap(self, seeds: DataFrame) -> None:
        """Round 0: seeds → robots gate → initial frontier snapshot."""
        if self.cfg.seed_limit is not None:
            # G7 pin: the reference processes exactly one seed per run
            # (otodom/orchestrator/handler.go:34,74); we generalize to N.
            seeds = seeds.orderBy("seed_id").limit(self.cfg.seed_limit)
        cand = (
            with_url_identity(seeds.select("seed_id", "url", "domain", "schema_name",
                                           "schema_version", "priority"))
            .withColumn("page", F.lit(0))
            .withColumn("round_added", F.lit(0))
            .withColumn("attempts", F.lit(0))
            .select(*FR.FRONTIER_COLS)
        )
        allowed, blocked = R.split_robots(cand, self.robots)
        allowed = FR.dedup_within(allowed).persist()
        n_allowed, n_blocked = allowed.count(), blocked.count()
        self.store.write_partition("frontier", 0, allowed)
        self.store.write_partition(
            "metrics", 0, self._metrics_row(0, n_blocked_robots=n_blocked, message="bootstrap")
        )
        self.store.commit(0, {"frontier_rows": n_allowed})
        allowed.unpersist()

    # ------------------------------------------------------------ one round
    def run_round(self, round_no: int) -> dict:
        """One batch round.  Action count is kept low deliberately (each
        Spark job has fixed overhead that dominates at small SF): one agg
        over the persisted fetch output, one agg over the expansion, and
        metadata-cheap counts of the parquet partitions just written."""
        cfg = self.cfg
        st = self.store
        frontier = st.read_frontier(S.FRONTIER)

        dispatch, deferred = P.split_by_budget(
            frontier, self.robots, cfg.base_budget, cfg.round_ms
        )
        dispatch = global_sequence(dispatch, P.ORDER_KEYS).persist()

        fetched = FE.fetch_closed_world(
            P.salt_partition(dispatch, cfg.num_salts), self.web_pages
        ).persist()
        ok, retry, dead = FE.split_fetch_outcomes(fetched)

        # results: extraction over successful pages, image payload joined last
        results = FE.extract_results(ok, self.web_images, round_no)

        # expansion: successfully fetched SEED pages (page==0) discover pagination
        expansion = R.tag_robots(
            FR.expand_pages(ok.filter(F.col("page") == 0), round_no), self.robots
        ).persist()
        exp_allowed = FR.dedup_within(expansion.filter(~F.col("_blocked")).drop("_blocked"))

        # seen set grows by this round's successful fetches
        seen_prev = st.read("url_seen", S.URL_SEEN).select("url_hash", "first_round")
        new_seen = ok.select("url_hash", F.lit(round_no).alias("first_round"))

        filters = (
            D.build_seen_filters(seen_prev, cfg.bloom_parts)
            if cfg.use_bloom and st.committed_round() > 0
            else None
        )
        fresh = D.anti_join_seen(
            exp_allowed, seen_prev.unionByName(new_seen), filters, cfg.bloom_parts
        )
        next_frontier = FR.merge_into_frontier(
            deferred.select(*FR.FRONTIER_COLS).unionByName(retry.select(*FR.FRONTIER_COLS)),
            fresh,
        )

        # ---- writes (all derive from the two persisted frames)
        st.write_partition(
            "dispatch_log",
            round_no,
            dispatch.select("seq", "url_hash", "url", "host", "page", "priority"),
        )
        st.write_partition("results", round_no, results)
        st.write_partition("url_seen", round_no, new_seen)
        st.write_partition("dead", round_no, dead.select(*FR.FRONTIER_COLS))
        st.write_partition("frontier", round_no, next_frontier)

        # ---- consolidated stats
        fs = fetched.agg(
            F.count("*").alias("n_dispatched"),
            F.sum(F.col("ok").cast("long")).alias("n_ok"),
            F.sum((F.col("found") & ~F.col("ok")).cast("long")).alias("n_found_failed"),
            F.sum((~F.col("found")).cast("long")).alias("n_404"),
            F.sum(
                (F.col("found") & ~F.col("ok") & (F.col("attempts") + 1 >= FE.MAX_ATTEMPTS))
                .cast("long")
            ).alias("n_exhausted"),
        ).first()
        es = expansion.agg(
            F.count("*").alias("n_candidates"),
            F.sum(F.col("_blocked").cast("long")).alias("n_blocked"),
        ).first()
        n_dispatched = fs["n_dispatched"] or 0
        n_ok = fs["n_ok"] or 0
        n_dead = (fs["n_404"] or 0) + (fs["n_exhausted"] or 0)
        n_retry = (fs["n_found_failed"] or 0) - (fs["n_exhausted"] or 0)
        n_expanded = (es["n_candidates"] or 0) - (es["n_blocked"] or 0)

        written_frontier = self.spark.read.parquet(f"{st.root}/frontier/round={round_no}")
        n_frontier = written_frontier.count()
        # fresh expansion rows are exactly those stamped with this round
        n_fresh = written_frontier.filter(F.col("round_added") == round_no).count()
        n_results = self.spark.read.parquet(f"{st.root}/results/round={round_no}").count()
        n_deferred = n_frontier - n_retry - n_fresh

        st.write_partition(
            "metrics",
            round_no,
            self._metrics_row(
                round_no,
                n_dispatched=n_dispatched,
                n_fetched=n_ok,
                n_failed=n_retry + n_dead,
                n_dead=n_dead,
                n_results=n_results,
                n_expanded=n_expanded,
                n_deduped=n_expanded - n_fresh,
                n_blocked_robots=es["n_blocked"] or 0,
                n_deferred_politeness=n_deferred,
                message="saga completed",  # reference orchestrator/handler.go:76
            ),
        )
        st.commit(round_no, {"frontier_rows": n_frontier, "dispatched": n_dispatched})

        dispatch.unpersist()
        fetched.unpersist()
        expansion.unpersist()
        return {
            "round": round_no,
            "n_dispatched": n_dispatched,
            "n_fetched": n_ok,
            "n_results": n_results,
            "frontier_rows": n_frontier,
        }

    # ------------------------------------------------------------ full run
    def run(self, seeds: DataFrame | None = None, resume: bool = False) -> list[dict]:
        """Run to frontier exhaustion (or max_rounds).  With resume=True,
        continue from the committed checkpoint instead of bootstrapping."""
        if resume:
            self.store.vacuum_uncommitted()
            start = self.store.committed_round() + 1
            assert start >= 1, "nothing to resume from"
        else:
            assert seeds is not None, "fresh run needs seeds"
            self.bootstrap(seeds)
            start = 1
        history = []
        for r in range(start, self.cfg.max_rounds + 1):
            stats = self.run_round(r)
            history.append(stats)
            if stats["n_dispatched"] == 0 or stats["frontier_rows"] == 0:
                break
        return history

    # ------------------------------------------------------------ helpers
    def _metrics_row(self, round_no: int, **kw) -> DataFrame:
        defaults = dict(
            status=True,
            domain=None,
            message=None,
            n_dispatched=0,
            n_fetched=0,
            n_failed=0,
            n_dead=0,
            n_results=0,
            n_expanded=0,
            n_deduped=0,
            n_blocked_robots=0,
            n_deferred_politeness=0,
        )
        defaults.update(kw)
        row = [
            (
                round_no,
                bool(defaults["status"]),
                defaults["domain"],
                None,  # ingestion_time filled below from run_ts
                defaults["message"],
                *[int(defaults[k]) for k in (
                    "n_dispatched", "n_fetched", "n_failed", "n_dead", "n_results",
                    "n_expanded", "n_deduped", "n_blocked_robots", "n_deferred_politeness",
                )],
            )
        ]
        df = self.spark.createDataFrame(row, S.CRAWL_METRICS)
        return df.withColumn(
            "ingestion_time", F.to_timestamp(F.lit(self.cfg.run_ts))
        )
