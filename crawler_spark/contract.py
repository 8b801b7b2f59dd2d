"""Driver-contract queries: every SURVEY.md §2 operator (and the
training-data ops) as a (spark, sf_dir) → DataFrame callable with a
DuckDB-runnable oracle SQL mirror.

Column-name discipline: every computed column is aliased identically
in the Spark builder and the oracle SQL (the driver's compare sorts
columns by name and value-hashes).  Types are pinned cross-engine:
counts/ranks → BIGINT, money → integer cents, similarity/score
doubles → round(x, 4).

Operator → query mapping is the one planned in SURVEY.md §2.8
("Driver-contract queries").
"""

from __future__ import annotations

import os
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .functions import neardup as ND
from .functions import similarity as SIM
from .functions import text as TX
from .functions.multimodal import (
    attach_synthetic_images,
    decode_meta,
    recompress_psnr,
    transcode,
)
from .functions.temporal import asof_join, interval_join
from .operators.extract import extract_number, take_before, with_page_param
from .operators.ranking import SMALL_SEQ_MAX_ROWS, global_sequence
from .operators.skew import salted_join

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


# =====================================================================
# §2.2 scalar extraction operators
# =====================================================================
def q_extract_number(spark, sf):
    """P3 — ExtractNumber (otodom/commons/extensions.go:10-17)."""
    return _t(spark, sf, "part").select(
        "p_partkey", extract_number("p_name").alias("digits")
    )


def q_substring_before(spark, sf):
    """P4 — TakeChractersBefore (otodom/commons/extensions.go:20-22)."""
    return _t(spark, sf, "part").select(
        "p_partkey", take_before("p_type", " ").alias("head")
    )


def q_page_url(spark, sf):
    """P5 — page-param URL construction (total_pages/handler.go:54-60)."""
    part = _t(spark, sf, "part")
    base = F.concat(
        F.lit("https://example.com/p/"),
        F.col("p_partkey").cast("string"),
        F.when(F.col("p_size") % 2 == 0, F.lit("?q=1")).otherwise(F.lit("")),
    )
    page = (F.pmod(F.col("p_partkey"), F.lit(5)) + 1).cast("long")
    return part.select("p_partkey", with_page_param(base, page).alias("page_url"))


def q_url_canon(spark, sf):
    """URL canonicalization — the north-star's URL-seen primitive as a
    direct query (canon.py: fragment strip + .html cut + host/path
    split, all whole-stage-codegen expressions, no Python).  Synthetic
    URLs exercise every branch: fragments, .html suffixes, query
    strings, bare hosts.  The xxhash64 identity itself is covered
    rows-only elsewhere (q_fingerprint); here the string pipeline is
    oracle-checked exactly."""
    from .canon import canonical_url_col, host_col, path_col

    part = _t(spark, sf, "part")
    url = F.concat(
        F.lit("https://host"),
        F.pmod(F.col("p_partkey"), F.lit(7)).cast("string"),
        F.lit(".example/item/"),
        F.col("p_partkey").cast("string"),
        F.when(F.col("p_size") % 3 == 0, F.lit(".html#frag"))
        .when(F.col("p_size") % 3 == 1, F.lit(".html?page=2"))
        .otherwise(F.lit("")),
    )
    return part.select(
        "p_partkey",
        url.alias("raw_url"),
        canonical_url_col(url).alias("canon_url"),
        host_col(url).alias("host"),
        path_col(url).alias("path"),
    )


def q_url_canon_full(spark, sf):
    """RFC 3986 §6 syntax normalization (canon.full_canonical_url_col):
    scheme/host lowercasing, default-port strip, fragment drop, query-
    param sort, empty-query drop.  Synthesized URLs exercise every
    branch: SHOUTING scheme+host, :80 vs :8080 vs :443 ports, unsorted
    two-param queries, fragments, bare paths.  The dedup lever a
    general crawler's URL-seen set needs beyond the reference's
    fragment/.html cut (q_url_canon)."""
    from .canon import full_canonical_url_col

    part = _t(spark, sf, "part")
    k = F.col("p_partkey")
    s = F.col("p_size") % 5
    url = F.concat(
        F.when(s == 0, F.lit("HTTP://")).otherwise(F.lit("https://")),
        F.when(k % 2 == 0, F.lit("Host")).otherwise(F.lit("host")),
        F.pmod(k, F.lit(7)).cast("string"),
        F.lit(".Example"),
        F.when(s == 0, F.lit(":80"))
        .when(s == 1, F.lit(":443"))
        .when(s == 2, F.lit(":8080"))
        .otherwise(F.lit("")),
        F.lit("/item/"),
        k.cast("string"),
        F.when(s == 3, F.lit("?z=9&a=1")).when(s == 4, F.lit("?a=1&z=9")).otherwise(F.lit("")),
        F.when(k % 3 == 0, F.lit("#frag")).otherwise(F.lit("")),
    )
    return part.select(
        "p_partkey",
        url.alias("raw_url"),
        full_canonical_url_col(url).alias("canon_url"),
    )


def q_robots_gate(spark, sf):
    """Robots.txt prefix gate (north_rule: robots-gated scheduling) as a
    direct oracle query — the engine's ``tag_robots`` operator
    (operators/robots.py, applied at frontier insertion in
    engine.py:149,:293) over synthetic candidate URLs built from
    ``part``.  Seven hosts: hosts 0-4 carry a rule row ('/private/'
    for even host ids, '/listing/' for odd), hosts 5-6 have NO robots
    row at all, exercising the left-join NULL branch (no rule ⇒
    allowed) exactly.  Golden robots-compliance tests pin the crawl
    loop; this pins the predicate itself cross-engine."""
    from .canon import host_col
    from .operators.robots import tag_robots

    part = _t(spark, sf, "part")
    url = F.concat(
        F.lit("https://host"),
        F.pmod(F.col("p_partkey"), F.lit(7)).cast("string"),
        F.lit(".example"),
        F.when(F.col("p_size") % 3 == 0, F.lit("/private/"))
        .when(F.col("p_size") % 3 == 1, F.lit("/listing/"))
        .otherwise(F.lit("/item/")),
        F.col("p_partkey").cast("string"),
        F.lit(".html"),
    )
    cand = part.select("p_partkey", url.alias("url"), host_col(url).alias("host"))
    robots = spark.range(5).select(
        F.concat(F.lit("host"), F.col("id").cast("string"), F.lit(".example")).alias(
            "host"
        ),
        F.when(F.col("id") % 2 == 0, F.lit("/private/"))
        .otherwise(F.lit("/listing/"))
        .alias("disallow_prefix"),
    )
    return tag_robots(cand, robots).select(
        "p_partkey", "url", "host", F.col("_blocked").alias("blocked")
    )


def q_robots_rfc_gate(spark, sf):
    """Full RFC 9309 robots matching (operators/robots.rfc_robots_verdict)
    — multiple Allow/Disallow rules per host, ``*`` wildcards, ``$``
    end-anchors, longest-match-wins with Allow breaking length ties,
    no-match ⇒ allowed.  The single-prefix gate (q_robots_gate) is the
    engine/fixture contract; this pins the full grammar a general
    crawler needs.  Six path shapes × four hosts exercise every branch:
    allow-overrides-shorter-disallow (/private/public/ over /private/),
    anchored wildcard (/*.pdf$), mid-path wildcard (/files/*/b$), exact
    length tie (allow + disallow '/tie/a' ⇒ allowed), plain prefix, and
    a rule-less host (NULL branch ⇒ allowed)."""
    from .operators.robots import rfc_robots_verdict

    part = _t(spark, sf, "part")
    k = F.col("p_partkey")
    s = F.col("p_size") % 6
    path = (
        F.when(s == 0, F.concat(F.lit("/private/doc"), k.cast("string"), F.lit(".pdf")))
        .when(s == 1, F.concat(F.lit("/private/public/page"), k.cast("string")))
        .when(s == 2, F.concat(F.lit("/files/a"), F.pmod(k, F.lit(7)).cast("string"), F.lit("/b")))
        .when(s == 3, F.concat(F.lit("/item/"), k.cast("string"), F.lit(".html")))
        .when(s == 4, F.concat(F.lit("/public/x"), k.cast("string")))
        .otherwise(F.concat(F.lit("/tie/a"), k.cast("string")))
    )
    host = F.concat(F.lit("h"), F.pmod(k, F.lit(4)).cast("string"), F.lit(".example"))
    cand = part.select("p_partkey", host.alias("host"), path.alias("path"))
    rules = spark.createDataFrame(
        [
            ("h0.example", "disallow", "/private/"),
            ("h0.example", "allow", "/private/public/"),
            ("h0.example", "disallow", "/*.pdf$"),
            ("h1.example", "disallow", "/files/*/b$"),
            ("h1.example", "disallow", "/*.pdf$"),
            ("h1.example", "disallow", "/item/"),
            ("h2.example", "allow", "/tie/a"),
            ("h2.example", "disallow", "/tie/a"),
            ("h2.example", "disallow", "/public/"),
        ],
        "host string, rule_type string, pattern string",
    )
    return rfc_robots_verdict(cand, rules, ["p_partkey"]).select(
        "p_partkey", "host", "path", "allowed", F.col("match_len").cast("long").alias("match_len")
    )


def q_sitemap_extract(spark, sf):
    """Sitemap-source extraction — the crawl-tier discovery op the
    reference lacks (it discovers via pagination only): pull every
    <loc> from sitemap-XML documents with regexp_extract_all (one
    codegen pass, no XML parser dependency), explode, and canonicalize
    each URL through the engine's canon pipeline.  Synthetic sitemaps
    carry three URLs each (plain, ?page query, #fragment) so the
    canon/host split is exercised on extraction output, not just on
    literal columns (q_url_canon)."""
    from .canon import canonical_url_col, host_col

    part = _t(spark, sf, "part")
    k = F.col("p_partkey").cast("string")
    h = F.pmod(F.col("p_partkey"), F.lit(7)).cast("string")
    base = F.concat(F.lit("https://host"), h, F.lit(".example/item/"), k)
    xml = F.concat(
        F.lit("<urlset><url><loc>"), base,
        F.lit(".html</loc></url><url><loc>"), base,
        F.lit(".html?page=2</loc></url><url><loc>"), base,
        F.lit(".html#frag</loc></url></urlset>"),
    )
    locs = F.regexp_extract_all(xml, F.lit("<loc>([^<]*)</loc>"), 1)
    return (
        part.select("p_partkey", F.explode(locs).alias("url"))
        .select(
            "p_partkey",
            "url",
            canonical_url_col(F.col("url")).alias("canon_url"),
            host_col(F.col("url")).alias("host"),
        )
    )


def q_surt_index(spark, sf):
    """SURT-keyed URL index (Sort-friendly URI Reordering Transform,
    the CDX/web-archive canonical ordering): reverse the host labels so
    all URLs of a registrable domain sort adjacent —
    ``com,example,www)/path`` — which turns per-domain range scans over
    a 10^11-row URL index into contiguous reads and makes the index
    range-partitionable by domain prefix.  Pure codegen (split /
    reverse / array_join); the oracle mirrors with list_reverse +
    array_to_string."""
    k = F.col("p_partkey").cast("string")
    url = F.concat(
        F.lit("https://www.sub"),
        F.pmod(F.col("p_partkey"), F.lit(5)).cast("string"),
        F.lit(".example"),
        F.pmod(F.col("p_partkey"), F.lit(3)).cast("string"),
        F.lit(".com/item/"),
        k,
    )
    host = F.regexp_extract(url, r"^[a-z]+://([^/]+)", 1)
    path = F.regexp_extract(url, r"^[a-z]+://[^/]+(/.*)$", 1)
    surt = F.concat(
        F.array_join(F.reverse(F.split(host, r"\.")), ","), F.lit(")"), path
    )
    return _t(spark, sf, "part").select(
        F.col("p_partkey").alias("url_id"), url.alias("url"), surt.alias("surt")
    )


def q_snapshot_diff(spark, sf):
    """Re-crawl snapshot diff — the incremental-crawl primitive: full
    outer join of two (url, fingerprint) snapshots, classifying every
    URL as added / removed / changed (unchanged rows are dropped
    before the shuffle output).  Fixture: old = keys not ≡0 (mod 10),
    new = keys not ≡0 (mod 7), content fingerprint flips for keys ≡0
    (mod 3) — exercising all three branches.  At 10^10 URLs both sides
    shuffle once on url_id; fingerprints are md5 so the compare ships
    32 bytes/row, never page bodies."""
    part = _t(spark, sf, "part")
    old = part.filter(F.col("p_partkey") % 10 != 0).select(
        F.col("p_partkey").alias("url_id"), F.md5(F.col("p_name")).alias("old_fp")
    )
    new = part.filter(F.col("p_partkey") % 7 != 0).select(
        F.col("p_partkey").alias("url_id"),
        F.md5(
            F.when(
                F.col("p_partkey") % 3 == 0, F.concat(F.col("p_name"), F.lit("!"))
            ).otherwise(F.col("p_name"))
        ).alias("new_fp"),
    )
    j = old.join(new, "url_id", "full_outer")
    change = (
        F.when(F.col("old_fp").isNull(), "added")
        .when(F.col("new_fp").isNull(), "removed")
        .when(F.col("old_fp") != F.col("new_fp"), "changed")
        .otherwise("unchanged")
    )
    return j.withColumn("change", change).filter("change <> 'unchanged'").select(
        "url_id", "change"
    )


def q_html_strip(spark, sf):
    """Visible-text extraction from HTML — the boilerplate-strip pass a
    training corpus runs on every fetched page: drop <script> blocks
    (content and all), strip remaining tags, decode the common
    entities, collapse whitespace.  Three regexp_replace passes of
    whole-stage codegen, no parser dependency, no Python; the oracle
    replays the identical automaton-compatible patterns (no
    backreferences, RE2-safe).  Script bodies may contain '<'
    (lazy ``[\\s\\S]*?`` match, not ``[^<]*``), and ``&amp;`` decodes
    LAST so nested entities like ``&amp;lt;`` yield the literal
    ``&lt;`` instead of double-decoding."""
    part = _t(spark, sf, "part")
    html = F.concat(
        F.lit("<html><head><script>var k="),
        F.col("p_partkey").cast("string"),
        F.lit(";</script></head><body><h1>"),
        F.col("p_name"),
        F.lit("</h1><p class=\"c\">"),
        F.col("p_type"),
        F.lit(" &amp; co &lt;since "),
        F.col("p_size").cast("string"),
        F.lit("&gt;</p></body></html>"),
    )
    text = TX.html_visible_text(html)
    return part.select(
        F.col("p_partkey").alias("doc_id"),
        text.alias("text"),
        F.length(text).cast("long").alias("n_chars"),
    )


def q_extract_office(spark, sf):
    """P2 — dual schema-variant projection sharing ONE source
    (office_crawler/handler.go:92-102 vs flat_crawler/handler.go:93-104):
    the office variant's price is the per-m² selector and adds
    total_price; rooms is flat-only.  Variant-specific columns are NULL
    for the other variant (one superset table, as the engine's results
    sink does — operators/fetch.py:extract_results)."""
    part = _t(spark, sf, "part")
    schema_name = F.when(F.col("p_size") % 2 == 0, F.lit("flat")).otherwise(
        F.lit("office")
    )
    return part.select(
        "p_partkey",
        schema_name.alias("schema_name"),
        extract_number("p_name").alias("price_digits"),
        F.when(
            schema_name == "flat", (F.pmod("p_partkey", F.lit(5)) + 1).cast("string")
        ).alias("rooms"),
        F.when(schema_name == "office", extract_number("p_brand")).alias(
            "total_price_digits"
        ),
    )


def q_json_envelope(spark, sf):
    """P8 — JSON marshal of the payload envelope (NewEntry,
    otodom/commons/entry.go:50-69) as to_json(struct(...))."""
    return _t(spark, sf, "nation").select(
        "n_nationkey",
        F.to_json(F.struct("n_nationkey", "n_name")).alias("envelope"),
    )


def q_safe_cast(spark, sf):
    """P6 — strconv.Atoi skip-on-error (total_pages/handler.go:30-43)."""
    return _t(spark, sf, "events").select(
        "event_id",
        F.regexp_extract("props", r"[0-9]+", 0).try_cast("long").alias("k_val"),
    )


def q_json_decode(spark, sf):
    """S3 — JSON request decode (database/handler.go:26) as from_json."""
    return _t(spark, sf, "events").select(
        "event_id",
        F.from_json("props", "k BIGINT").getField("k").alias("k_val"),
    )


def q_run_stamp(spark, sf):
    """P7 — one deterministic run timestamp stamped per row
    (orchestrator/handler.go:25; never current_timestamp())."""
    return _t(spark, sf, "events").select(
        "event_id", F.to_timestamp(F.lit("2026-01-01 00:00:00")).alias("run_ts")
    )


def q_partitioned_write(spark, sf):
    """S5 — Hive-partitioned sink round-trip (storage/handler.go:103):
    write lineitem aggregates partitioned by (l_returnflag,
    l_linestatus), read back (rows-only check: side-effecting)."""
    import tempfile

    out = tempfile.mkdtemp(prefix="q-partwrite-")
    agg = (
        _t(spark, sf, "lineitem")
        .groupBy("l_returnflag", "l_linestatus", "l_orderkey")
        .agg(F.count("*").alias("n"))
    )
    agg.write.mode("overwrite").partitionBy("l_returnflag", "l_linestatus").parquet(out)
    return spark.read.parquet(out).groupBy("l_returnflag", "l_linestatus").agg(
        F.count("*").alias("n_groups"), F.sum("n").alias("n_rows")
    )


# =====================================================================
# §2.4 frontier expansion / joins
# =====================================================================
def q_frontier_expand(spark, sf):
    """G2 — page-range generator, 1..last_page-1 off-by-one pinned
    (total_pages/handler.go:53-65); last_page := p_size%8+3."""
    return (
        _t(spark, sf, "part")
        .select(
            "p_partkey",
            F.explode(
                F.sequence(F.lit(1), F.pmod(F.col("p_size"), F.lit(8)) + F.lit(2))
            ).alias("_page"),
        )
        .select("p_partkey", F.col("_page").cast("long").alias("page"))
    )


def q_max_page(spark, sf):
    """G1/A3 — max aggregation (total_pages/handler.go:36-42)."""
    return (
        _t(spark, sf, "orders")
        .groupBy("o_custkey")
        .agg(
            F.max("o_orderkey").alias("max_order"),
            F.count("*").alias("n_orders"),
        )
    )


def q_equi_join(spark, sf):
    """G4 — fetch = frontier⋈web as an equi hash join (orchestrator
    handler.go:132-138), here orders⋈lineitem with exact-cents agg."""
    o = _t(spark, sf, "orders")
    l = _t(spark, sf, "lineitem")
    cents = F.round(F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100).cast("long")
    return (
        o.join(l, o.o_orderkey == l.l_orderkey)
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("n_items"), F.sum(cents).alias("revenue_cents"))
    )


def q_broadcast_join(spark, sf):
    """G4 broadcast variant — small dims broadcast (robots/seeds shape)."""
    c = _t(spark, sf, "customer")
    n = _t(spark, sf, "nation")
    r = _t(spark, sf, "region")
    cents = F.round(F.col("c_acctbal") * 100).cast("long")
    return (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("r_name")
        .agg(F.count("*").alias("n_customers"), F.sum(cents).alias("acctbal_cents"))
    )


# =====================================================================
# §2.5 aggregation / §2.7 set ops / §2.3 filters
# =====================================================================
def q_group_collect(spark, sf):
    """A1/A2 — group-by key + set-accumulate (orchestrator:99-119)."""
    return (
        _t(spark, sf, "events")
        .groupBy("user_id")
        .agg(
            F.count("*").alias("n_events"),
            F.array_join(F.array_sort(F.collect_set("event_type")), ",").alias("types"),
        )
    )


def q_schema_last(spark, sf):
    """A2 — last-writer-wins schema map (orchestrator/handler.go:114):
    one value kept per key, the one written last in the deterministic
    order (max_by)."""
    return (
        _t(spark, sf, "events")
        .groupBy("user_id")
        .agg(
            F.max_by("event_type", "event_id").alias("last_type"),
            F.max("event_id").alias("last_event_id"),
        )
    )


def q_metrics_counts(spark, sf):
    """A4 — counts → metrics rows."""
    qty = F.round(F.col("l_quantity")).cast("long")
    return (
        _t(spark, sf, "lineitem")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(F.count("*").alias("n"), F.sum(qty).alias("sum_qty"))
    )


def q_union_all(spark, sf):
    """U1 — entries union (orchestrator:108-113)."""
    o = _t(spark, sf, "orders").select(
        F.col("o_orderkey").alias("key"), F.lit("orders").alias("src")
    )
    l = _t(spark, sf, "lineitem").select(
        F.col("l_orderkey").alias("key"), F.lit("lineitem").alias("src")
    )
    return o.unionByName(l)


def q_anti_join_dedup(spark, sf):
    """U2/F4 — ON CONFLICT DO NOTHING as left_anti (commons/Entry.go:37)."""
    c = _t(spark, sf, "customer")
    o = _t(spark, sf, "orders").select("o_custkey")
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select("c_custkey", "c_name")


def q_cuckoo_dedup(spark, sf):
    """U2/F4 cuckoo arm — the deletable URL-seen prefilter end-to-end:
    fold the seen set into partitioned cuckoo state, un-see a stale
    subset (recrawl invalidation, the operation the Bloom arm cannot
    do), then exact-verified anti-join.  The filter never changes
    semantics, so the oracle is plain SQL (operators/dedup_cuckoo.py).
    """
    from .operators import dedup_cuckoo as DC

    cand = _t(spark, sf, "customer").select("c_custkey", "c_name")
    cand = cand.withColumn("url_hash", F.col("c_custkey"))
    seen = _t(spark, sf, "orders").select(F.col("o_custkey").alias("url_hash")).distinct()
    empty = spark.createDataFrame([], DC.FILTER_STATE_SCHEMA)
    state = DC.update_seen_filters(empty, seen, n_parts=8)
    stale = seen.filter(F.col("url_hash") % 10 == 0)
    state = DC.delete_keys(state, stale, n_parts=8)
    live = seen.join(stale, "url_hash", "left_anti")
    return DC.anti_join_seen_partitioned(cand, live, state, n_parts=8).select(
        "c_custkey", "c_name"
    )


def q_filter_nonempty(spark, sf):
    """F1-F3 — skip empty-keyed / nil batches (orchestrator:101-112)."""
    return (
        _t(spark, sf, "events")
        .filter(
            F.col("event_type").isNotNull()
            & (F.col("event_type") != "")
            & F.col("props").isNotNull()
        )
        .select("event_id", "event_type")
    )


# =====================================================================
# §2.6 ordering / §2.8 windows
# =====================================================================
def q_order_by(spark, sf):
    """O1 — canonical total order via the scalable global_sequence
    operator (partition-count-invariant, crawler_spark.operators.ranking)."""
    import pyarrow.parquet as pq

    part = _t(spark, sf, "part").select("p_partkey", "p_size")
    # small=True below the shared SMALL_SEQ_MAX_ROWS crossover: the
    # single-window path fuses into the downstream stage instead of
    # paying the ranged path's extra jobs (the engine applies the same
    # constant, engine.py run_round).
    # Row count from the parquet footer — driver-side, no Spark job.
    # Bit-identical numbering either way (pinned in test_operators).
    n = pq.read_metadata(f"{sf}/part.parquet").num_rows
    return global_sequence(part, ["p_size", "p_partkey"], small=n < SMALL_SEQ_MAX_ROWS).select(
        "p_partkey", "p_size", "seq"
    )


def q_host_budget_topk(spark, sf):
    """G6 — per-host politeness budget as window rank ≤ 3."""
    w = Window.partitionBy("user_id").orderBy(F.col("ts").asc(), F.col("event_id").asc())
    return (
        _t(spark, sf, "events")
        .withColumn("rn", F.row_number().over(w).cast("long"))
        .filter(F.col("rn") <= 3)
        .select("user_id", "event_id", "rn")
    )


def q_crawl_delay_schedule(spark, sf):
    """G6 timeline variant — the engine's ACTUAL budget expression
    (operators/politeness.py host_budget_col: base when delay==0, else
    clamp(round_ms//delay, 1, base)) applied to a frontier-shaped frame,
    plus the dispatch schedule it implies: row k of a host fires at
    (k-1)*crawl_delay_ms into the round.  Host delays 0/150/300/450/600
    ms exercise every clamp branch (8, 4, 2, 1, 1) and hosts 5-6 have
    no robots row (NULL delay → full base budget).  q_host_budget_topk
    pins the generic window-rank; this pins the crawl_delay arithmetic
    itself cross-engine."""
    from .operators.politeness import host_budget_col

    part = _t(spark, sf, "part")
    fr = part.select(
        F.pmod(F.col("p_partkey"), F.lit(7)).cast("long").alias("host_id"),
        F.col("p_partkey").cast("long").alias("url_hash"),
        (F.col("p_size") % 4).cast("long").alias("priority"),
        (F.col("p_partkey") % 11).cast("long").alias("page"),
    )
    robots = spark.range(5).select(
        F.col("id").alias("host_id"),
        (F.col("id") * 150).cast("long").alias("crawl_delay_ms"),
    )
    w = Window.partitionBy("host_id").orderBy("priority", "page", "url_hash")
    return (
        fr.join(F.broadcast(robots), "host_id", "left")
        .withColumn(
            "budget",
            host_budget_col(F.col("crawl_delay_ms"), 8, 600).cast("long"),
        )
        .withColumn("rn", F.row_number().over(w).cast("long"))
        .filter(F.col("rn") <= F.col("budget"))
        .select(
            "host_id",
            "url_hash",
            "rn",
            ((F.col("rn") - 1) * F.coalesce("crawl_delay_ms", F.lit(0)))
            .cast("long")
            .alias("sched_offset_ms"),
            "budget",
        )
    )


def q_redirect_resolve(spark, sf):
    """Redirect-chain resolution (functions/graph.resolve_chains):
    follow a functional redirect mapping to its terminal URL with exact
    hop counts, by pointer doubling — ceil(log2 L) self-joins instead
    of L per-hop iterations (five shuffles for length-32 chains at
    10^10 URLs).  Fixture: key k redirects to k-1 unless k is a
    multiple of 5, giving chains of length 1-4 ending at multiples of
    5.  The DuckDB oracle walks the same mapping with a recursive CTE
    — a genuinely different algorithm agreeing row-for-row."""
    from .functions.graph import resolve_chains

    part = _t(spark, sf, "part")
    mapping = part.filter(F.col("p_partkey") % 5 != 0).select(
        F.col("p_partkey").cast("long").alias("src"),
        (F.col("p_partkey") - 1).cast("long").alias("dst"),
    )
    return resolve_chains(mapping, max_hops=8).select(
        F.col("node").alias("url_id"), F.col("final").alias("final_id"), "hops"
    )


def q_pagerank_hosts(spark, sf):
    """Host-authority PageRank (functions/graph.pagerank): 5 synchronous
    iterations over the host link graph in EXACT micro-unit integer
    arithmetic (``rank DIV outdeg`` contributions, damping 85/100,
    dangling mass dropped) — integer sums are order-independent, so the
    result hash-matches across engines and parallelism where a float
    PageRank would drift.  The frontier-priority upgrade over the
    reference's insertion-order host dispatch
    (otodom/orchestrator/handler.go:59-101).  One edges⋈ranks shuffle +
    one aggregation per iteration, rank table only in motion.  The
    DuckDB oracle unrolls the identical recurrence as chained CTEs —
    a genuinely independent evaluation order agreeing bit-for-bit."""
    return _host_pagerank(spark, sf)


_PAGERANK_MEMO: dict[tuple[str, str], DataFrame] = {}


def _host_pagerank(spark, sf):
    """Shared by q_pagerank_hosts / q_authority_order / q_crawl_budget
    (mirrors the oracle side's _pagerank_ctes fixture): the
    orders-derived host link graph through functions/graph.pagerank.

    Memoized per (session, sf): pagerank() returns an eager
    localCheckpoint (a materialized O(hosts) table), so the three
    authority consumers reuse ONE computation of the 5-iteration
    recurrence — exactly how a production pipeline treats its rank
    table (computed once per corpus snapshot, read by every consumer),
    and the queries stay independently callable."""
    from .functions.graph import pagerank

    key = (spark.sparkContext.applicationId, sf)
    hit = _PAGERANK_MEMO.get(key)
    if hit is not None:
        return hit
    edges = (
        _t(spark, sf, "orders")
        .select(
            (F.col("o_custkey") % 1000).cast("long").alias("src"),
            (F.col("o_orderkey") % 1000).cast("long").alias("dst"),
        )
        .filter("src <> dst")
    )
    out = pagerank(edges, n_iter=5).select(
        F.col("node").alias("host_id"), "rank_micros"
    )
    _PAGERANK_MEMO[key] = out
    return out


def q_authority_order(spark, sf):
    """Authority-first global crawl order — PageRank WIRED INTO frontier
    sequencing, not just computed: every frontier URL is joined to its
    host's authority score (broadcast — the rank table is hosts-sized)
    and the whole frontier gets one deterministic dispatch sequence via
    the scalable global_sequence operator ordered by (authority desc,
    host, url).  This is the standard upgrade over the reference's
    insertion-order dispatch: high-authority hosts drain first under
    the same politeness budgets.  Hosts absent from the link graph
    coalesce to the damping base (150000 micros, same as an
    all-dangling node).  The oracle replays the PageRank CTE chain plus
    a ROW_NUMBER over the identical total order."""
    import pyarrow.parquet as pq

    pr = _host_pagerank(spark, sf)
    frontier = _t(spark, sf, "orders").select(
        (F.col("o_custkey") % 1000).cast("long").alias("host_id"),
        F.col("o_orderkey").alias("url_id"),
    )
    j = frontier.join(F.broadcast(pr), "host_id", "left").withColumn(
        "neg_rank", -F.coalesce("rank_micros", F.lit(150_000))
    )
    n = pq.read_metadata(f"{sf}/orders.parquet").num_rows
    return global_sequence(
        j, ["neg_rank", "host_id", "url_id"], small=n < SMALL_SEQ_MAX_ROWS
    ).select("host_id", "url_id", "seq")


def q_anchor_text(spark, sf):
    """Anchor-text aggregation — the classic web-index signal: for
    every link target, the top-3 terms used in anchors pointing at it
    (term-count desc, term asc tie-break).  Explode → two-key count →
    per-target row_number window; the count aggregation is map-side
    combinable and the window partitions by target, so at 10^12 links
    the only full-width shuffle carries (target, term) partial counts,
    never raw anchors."""
    links = _t(spark, sf, "part").select(
        (F.col("p_partkey") % 500).cast("long").alias("target_id"),
        F.explode(F.split(F.col("p_name"), " ")).alias("term"),
    )
    counts = links.groupBy("target_id", "term").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    w = Window.partitionBy("target_id").orderBy(
        F.col("cnt").desc(), F.col("term").asc()
    )
    return counts.withColumn(
        "rank", F.row_number().over(w).cast("long")
    ).filter("rank <= 3")


def q_content_sniff(spark, sf):
    """Magic-byte content-type sniffing over a BinaryType payload
    column — the fetch-side classifier a multimodal crawl runs before
    routing bytes to the image/audio/video decoders (images.py,
    audio.py, video.py all assume their container; this is the
    dispatcher).  The payload is built with unhex() and sniffed with
    binary substring+hex — pure whole-stage-codegen JVM expressions,
    bytes never touch Python.  The DuckDB oracle classifies the same
    hex text by prefix: engines traverse different representations
    (bytes vs hex chars) of the same value and must agree."""
    key = F.col("p_partkey")
    payload = F.lpad(key.cast("string"), 16, "0")  # decimal digits = valid hex
    m = key % 6
    hx = F.concat(
        F.when(m == 0, F.lit("89504E470D0A1A0A"))
        .when(m == 1, F.lit("FFD8FFE000104A464946"))
        .when(m == 2, F.lit("474946383961"))
        .when(
            m == 3,
            F.concat(F.lit("52494646"), payload.substr(1, 8), F.lit("57415645")),
        )
        .when(m == 4, F.lit("255044462D312E34"))
        .otherwise(F.lit("4445414442454546")),
        payload,
    )
    b = _t(spark, sf, "part").select(
        F.col("p_partkey").alias("file_id"), F.unhex(hx).alias("data")
    )

    def h(pos: int, n: int):  # hex of payload bytes [pos, pos+n)
        return F.hex(F.expr(f"substring(data, {pos}, {n})"))

    mime = (
        F.when(h(1, 8) == "89504E470D0A1A0A", "image/png")
        .when(h(1, 3) == "FFD8FF", "image/jpeg")
        .when(h(1, 6).isin("474946383761", "474946383961"), "image/gif")
        .when((h(1, 4) == "52494646") & (h(9, 4) == "57415645"), "audio/x-wav")
        .when(h(1, 5) == "255044462D", "application/pdf")
        .otherwise("application/octet-stream")
    )
    return b.select(
        "file_id",
        F.length("data").cast("long").alias("n_bytes"),
        mime.alias("mime"),
    )


def _host_urls(spark, sf):
    return _t(spark, sf, "lineitem").select(
        (F.col("l_suppkey") % 50).cast("long").alias("host_id"),
        (F.col("l_orderkey") % 10000).cast("long").alias("url_hash"),
    )


def q_distinct_urls(spark, sf):
    """Exact distinct-URL count per host — the crawl-coverage metric —
    in the skew-safe two-level form: dedup on (host, url) first (a
    map-side-combinable distinct), then count per host.  A single
    countDistinct over a hot host centralizes its whole key set in one
    task; the two-level plan spreads level 1 across the (host, url)
    key space, so a host with 10^9 URLs still parallelizes.  The HLL
    scale path is q_distinct_urls_approx."""
    return (
        _host_urls(spark, sf)
        .distinct()
        .groupBy("host_id")
        .agg(F.count(F.lit(1)).cast("long").alias("n_urls"))
    )


def q_distinct_urls_approx(spark, sf):
    """HyperLogLog++ distinct-URL count per host (approx_count_distinct,
    rsd=2%) — the 100 TB path: constant ~kB of sketch state per host
    instead of the full key set, one pass, mergeable across partitions
    and days.  Rows-only (sketch estimates are not reproducible in
    DuckDB); relative error vs the exact twin is test-pinned ≤5%."""
    return (
        _host_urls(spark, sf)
        .groupBy("host_id")
        .agg(
            F.approx_count_distinct("url_hash", rsd=0.02)
            .cast("long")
            .alias("n_urls_approx")
        )
    )


def q_pacing_schedule(spark, sf):
    """Per-host dispatch pacing (operators/politeness.pacing_schedule):
    the k-th candidate of a host fires at max(arrival, previous dispatch
    + delay) — the real-time generalization of q_crawl_delay_schedule's
    fixed timeline.  The recurrence unrolls to one running-max window
    per host (no iteration), integer-ms exact on both engines.  The
    streaming twin (streaming.pacing_stream) carries the same
    recurrence across micro-batches in applyInPandasWithState state."""
    from .operators.politeness import pacing_schedule

    ev = _t(spark, sf, "events").select(
        F.col("user_id").alias("host"),
        F.unix_millis(F.col("ts").cast("timestamp_ltz")).alias("ts_ms"),
        F.col("event_id").cast("long").alias("url_hash"),
    )
    return pacing_schedule(ev, 1000).select("host", "url_hash", "ts_ms", "sched_ms")


def q_sessionize(spark, sf):
    """Streaming-shaped stateful op: 30-min-gap sessionization via
    lag + running sum (batch mirror of applyInPandasWithState)."""
    w = Window.partitionBy("user_id").orderBy(F.col("ts").asc(), F.col("event_id").asc())
    prev = F.lag("ts").over(w)
    new_sess = F.when(
        prev.isNull() | ((F.unix_timestamp("ts") - F.unix_timestamp(prev)) > 1800), 1
    ).otherwise(0)
    return (
        _t(spark, sf, "events")
        .withColumn(
            "session_id",
            F.sum(new_sess).over(w.rowsBetween(Window.unboundedPreceding, 0)).cast("long"),
        )
        .select("user_id", "event_id", "session_id")
    )


def q_time_rollup(spark, sf):
    """Hierarchical time-bucket rollup (hypertable-style continuous
    aggregate): per-(day, hour) metrics plus day and grand subtotals in
    ONE pass via ROLLUP grouping sets — Spark's Expand feeds a single
    shuffle, no self-union of three aggregations.  grouping_id
    disambiguates levels; rollup NULLs are sentinel-encoded for
    cross-engine value hashing (integer-exact cents)."""
    ev = _t(spark, sf, "events")
    cents = F.round(F.col("value") * 100).cast("long")
    return (
        ev.withColumn("d", F.date_trunc("day", "ts"))
        .withColumn("h", F.hour("ts"))
        .rollup("d", "h")
        .agg(
            F.grouping_id().cast("long").alias("lvl"),
            F.count(F.lit(1)).alias("n"),
            F.sum(cents).alias("value_cents"),
        )
        .withColumn(
            "d", F.coalesce("d", F.to_timestamp(F.lit("1970-01-01 00:00:00")))
        )
        .withColumn("h", F.coalesce(F.col("h").cast("long"), F.lit(-1)))
        .select("lvl", "d", "h", "n", "value_cents")
    )


def q_asof_join(spark, sf):
    """As-of (backward) join: each click event picks up the most recent
    prior-or-equal view by the same user — functions.temporal.asof_join
    (union + ONE keyed window; no inequality-join pair explosion).
    Views are deduped per (user, ts) so the match is well-defined in
    both engines (DuckDB oracle: native ASOF LEFT JOIN)."""
    ev = _t(spark, sf, "events")
    clicks = ev.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts"
    )
    views = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id", "ts")
        .agg(F.max("event_id").alias("view_event_id"))
        .withColumn("view_ts", F.col("ts"))
    )
    # left-join misses encoded null-free (matched flag + sentinels):
    # cross-engine value-hashing of NULL ints/timestamps is
    # representation-dependent (pandas NaN/NaT), sentinels are not
    return (
        asof_join(clicks, views, ["user_id"], "ts", ["view_event_id", "view_ts"])
        .withColumn("matched", F.col("view_event_id").isNotNull())
        .withColumn("view_event_id", F.coalesce("view_event_id", F.lit(-1)))
        .withColumn(
            "view_ts",
            F.coalesce("view_ts", F.to_timestamp(F.lit("1970-01-01 00:00:00"))),
        )
        .select("event_id", "user_id", "ts", "matched", "view_event_id", "view_ts")
    )


def q_interval_join(spark, sf):
    """Point-in-interval range join via grid bucketing
    (functions.temporal.interval_join): clicks landing inside the
    30-minute window after any purchase by the same user.  The join key
    is (user, cell) — selective even for hot users, never the naive
    per-key cross product."""
    ev = _t(spark, sf, "events")
    clicks = ev.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", F.unix_timestamp("ts").alias("p")
    )
    purch = (
        ev.filter(F.col("event_type") == "purchase")
        .select(
            F.col("event_id").alias("purchase_event_id"),
            "user_id",
            F.unix_timestamp("ts").alias("lo"),
        )
        .withColumn("hi", (F.col("lo") + 1800).cast("long"))
    )
    return interval_join(
        clicks, purch, ["user_id"], "p", "lo", "hi", cell_width=1800
    ).select("event_id", "user_id", "purchase_event_id")


def q_shard_pack(spark, sf):
    """Training-shard packing (beyond-reference LLM-data op): documents
    in doc_id order fill contiguous 2048-token shards — shard_id =
    exclusive-prefix-tokens div budget via the distributed prefix sum
    (operators.ranking.running_total; no single-partition window, so
    the identical assignment holds at 10^10 docs)."""
    docs = _t(spark, sf, "documents").select(
        "doc_id", TX.token_count("text").alias("n_tokens")
    )
    return TX.pack_shards(docs, "n_tokens", 2048).select(
        "doc_id", "n_tokens", "shard_id"
    )


def q_salted_join(spark, sf):
    """Skew-handled fact⋈dim equi-join (operators.skew.salted_join):
    events' 5-value event_type key would send every row to ≤5 reducers
    in a plain shuffled join; the fact side is salted by
    pmod(xxhash64(event_id), 16) and the dim side replicated 16×, so
    each hot key spreads across 16 shuffle buckets.  The salt provably
    does not change the answer — the oracle IS the plain join."""
    ev = _t(spark, sf, "events")
    dim = (
        ev.select("event_type")
        .distinct()
        .withColumn("type_weight", F.length("event_type").cast("long"))
    )
    return salted_join(ev, dim, ["event_type"], ["event_id"], n_salts=16).select(
        "event_id",
        "event_type",
        "type_weight",
        F.round(F.col("value") * 100).cast("long").alias("cents"),
    )


def q_window_dedup(spark, sf):
    """Keep-newest-per-key dedup — the re-crawl snapshot pattern (one
    row per URL, the latest fetch wins): ONE keyed window, ties broken
    by event_id so the winner is engine-independent.  At 100 TB this is
    the shape that replaces full-table distinct for versioned corpora
    (shuffle by key once, no global sort)."""
    w = Window.partitionBy("user_id").orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )
    return (
        _t(spark, sf, "events")
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("user_id", "event_id", "ts", "event_type")
    )


def q_pivot(spark, sf):
    """Long→wide pivot: per-user spend by event type as columns.  The
    pivot value list is PINNED so Spark skips the extra distinct-scan
    job and the output schema is static — at 100 TB a data-dependent
    schema is an anti-pattern (one new key = a different table).
    Missing cells are 0 (money), kept integer-cents exact.

    Implemented as conditional aggregation (sum(when(type=t, cents)))
    rather than DataFrame.pivot(): with the value list pinned, .pivot()
    still plans TWO shuffles (groupBy(user,type) then a pivotfirst
    regroup by user) while the conditional form is ONE partial+final
    aggregate around ONE exchange — at 100 TB that second full-table
    shuffle is the whole cost difference (pinned in
    tests/test_plan_properties.py)."""
    types = ["click", "view", "purchase", "signup", "error"]
    ev = _t(spark, sf, "events").withColumn(
        "cents", F.round(F.col("value") * 100).cast("long")
    )
    return ev.groupBy("user_id").agg(
        *[
            F.coalesce(
                F.sum(F.when(F.col("event_type") == t, F.col("cents"))), F.lit(0)
            )
            .cast("long")
            .alias(f"{t}_cents")
            for t in types
        ]
    )


def q_rollup(spark, sf):
    """Multi-level aggregation via grouping sets — ROLLUP(event_type,
    user_bucket) in ONE pass (Spark Expand + single shuffle instead of
    three separate groupBy jobs unioned).  Grouping flags are emitted
    as explicit int columns so the subtotal rows are self-describing
    cross-engine."""
    ev = _t(spark, sf, "events").select(
        "event_type",
        F.pmod(F.col("user_id"), F.lit(10)).cast("long").alias("user_bucket"),
        F.round(F.col("value") * 100).cast("long").alias("cents"),
    )
    return ev.rollup("event_type", "user_bucket").agg(
        F.grouping("event_type").cast("int").alias("g_type"),
        F.grouping("user_bucket").cast("int").alias("g_bucket"),
        F.sum("cents").alias("sum_cents"),
        F.count(F.lit(1)).alias("n"),
    )


def q_semi_join(spark, sf):
    """Existence test as LEFT SEMI join — customers with ≥1 order.
    Semi join never multiplies rows (dim-side duplicates cannot fan
    out) and ships only the join key of the probe side; at 100 TB this
    is the shape for 'filter the corpus by membership in a big keyed
    set' when the set is too large to broadcast a Bloom of."""
    cust = _t(spark, sf, "customer")
    orders = _t(spark, sf, "orders")
    return cust.join(
        orders, cust.c_custkey == orders.o_custkey, "left_semi"
    ).select("c_custkey", "c_name", "c_nationkey")


def q_lag_delta(spark, sf):
    """Per-user inter-event gap via lag() — the sequence-feature
    primitive for sessionization/dwell-time.  ONE keyed window (shuffle
    by user_id, sort within partition); ms-truncated epoch on both
    engines so the diff is integer-exact.  First event per user keeps
    NULL (no synthetic zero)."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    # parquet ts is TIMESTAMP_NTZ; session TZ is pinned UTC (session.py)
    # so the LTZ cast is instant-preserving and matches DuckDB epoch_ms
    ms = F.unix_millis(F.col("ts").cast("timestamp_ltz"))
    return _t(spark, sf, "events").select(
        "user_id",
        "event_id",
        (ms - F.lag(ms).over(w)).cast("long").alias("gap_ms"),
    )


def q_histogram(spark, sf):
    """Fixed-width binned histogram of event value (20 bins × 25.0,
    top-clamped) — the data-profiling primitive.  Bin bounds are PINNED
    literals, not data-dependent min/max, so the job is one pass with a
    map-side-combinable groupBy and the schema is static at any scale."""
    ev = _t(spark, sf, "events")
    bin_ = F.least(F.floor(F.col("value") / 25.0), F.lit(19)).cast("long")
    return (
        ev.groupBy(bin_.alias("bin"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            # per-row cents then integer sum: float-sum order must never
            # decide a rounding, or the cross-engine hash flakes
            F.sum(F.round(F.col("value") * 100).cast("long")).alias("sum_cents"),
        )
        .withColumn("lo", (F.col("bin") * 25).cast("double"))
    )


def q_corpus_filter(spark, sf):
    """Training-corpus quality gate — the composed keep/drop pipeline
    (token-count floor, quality-score floor, confident language) every
    LLM data pipeline runs before dedup.  All three signals come from
    the shared text kernels (functions/text.py) in ONE narrow pass — no
    shuffle at all until the caller aggregates; rejected docs carry a
    machine-readable reason so drop-rate per rule is auditable."""
    docs = _t(spark, sf, "documents")
    scored = docs.select(
        "doc_id",
        TX.token_count("text").alias("n_tokens"),
        TX.quality_score("text").alias("quality_bp"),
        TX.predicted_lang("text").alias("pred_lang"),
    )
    reason = (
        F.when(F.col("n_tokens") < 8, F.lit("too_short"))
        .when(F.col("quality_bp") < 5500, F.lit("low_quality"))
        .when(F.col("pred_lang") == "und", F.lit("no_language"))
        .otherwise(F.lit("kept"))
    )
    return scored.withColumn("reason", reason).withColumn(
        "kept", (F.col("reason") == "kept").cast("boolean")
    )


def q_crawl_round(spark, sf):
    """Flagship composite — one politeness-budgeted crawl round over
    relational fixtures: frontier=orders (host=o_custkey), budget 2/host,
    fetch=⋈lineitem, global dispatch sequence (SURVEY.md §3.1 shape)."""
    o = _t(spark, sf, "orders")
    l = _t(spark, sf, "lineitem").select("l_orderkey")
    pri = F.substring("o_orderpriority", 1, 1).cast("long")
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("pri").asc(), F.col("o_orderdate").asc(), F.col("o_orderkey").asc()
    )
    dispatch = (
        o.withColumn("pri", pri)
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 2)
    )
    fetched = (
        dispatch.join(l, dispatch.o_orderkey == l.l_orderkey, "left")
        .groupBy("o_custkey", "o_orderkey", "pri")
        .agg(F.count("l_orderkey").alias("n_items"))
    )
    # dispatch ≤ 2 rows/custkey, so |fetched| ≤ 2×|customer| — known
    # from the customer footer without a Spark job; below the shared
    # crossover the single-window path skips the ranged path's two
    # extra jobs (same constant + rationale as q_order_by above).
    import pyarrow.parquet as pq

    n_cust = pq.read_metadata(f"{sf}/customer.parquet").num_rows
    return global_sequence(
        fetched, ["pri", "o_orderkey"], small=2 * n_cust < SMALL_SEQ_MAX_ROWS
    ).select("o_custkey", "o_orderkey", "pri", "n_items", "seq")


# =====================================================================
# Training-data ops: text analysis
# =====================================================================
def q_dedup_exact(spark, sf):
    """Exact dedup groups by md5(canonical text)."""
    return ND.exact_dup_groups(_t(spark, sf, "documents"))


def q_fingerprint(spark, sf):
    """Row-level document fingerprint (portable md5 key)."""
    return _t(spark, sf, "documents").select(
        "doc_id", TX.fingerprint("text").alias("fp")
    )


def q_token_count(spark, sf):
    return _t(spark, sf, "documents").select(
        "doc_id",
        TX.token_count("text").alias("n_tokens"),
        TX.bpe_ish_token_count("text").alias("n_bpe_tokens"),
    )


def q_quality_score(spark, sf):
    return _t(spark, sf, "documents").select(
        "doc_id",
        TX.token_count("text").alias("n_tokens"),
        TX.stopword_count("text").alias("n_stopwords"),
        TX.punct_count("text").alias("n_punct"),
        TX.quality_score("text").alias("quality_bp"),
    )


def q_lang_id(spark, sf):
    docs = _t(spark, sf, "documents")
    scores = TX.lang_scores("text")
    return docs.select(
        "doc_id",
        *[scores[lg].alias(f"s_{lg}") for lg in TX.LANG_STOPWORDS],
        TX.predicted_lang("text").alias("pred_lang"),
    )


def q_shingle_stats(spark, sf):
    return _t(spark, sf, "documents").select(
        "doc_id", F.size(TX.char_shingles("text", 5)).cast("long").alias("n_shingles")
    )


def q_ngram_jaccard(spark, sf):
    """EXACT n-gram-Jaccard near-dup pairs (shared-shingle candidates)."""
    return ND.ngram_jaccard_pairs(_t(spark, sf, "documents"), threshold=0.4)


def q_percentiles(spark, sf):
    """Per-group exact interpolated percentiles (p50/p95 of integer
    cents) — Spark `percentile` and DuckDB `quantile_cont` share the
    linear-interpolation definition, so values hash-match at 4 dp.
    Scale note: exact percentile materializes each group's sorted
    values; at 10^10 rows swap in `approx_percentile` (t-digest,
    mergeable partial aggregation) and widen the tolerance — the query
    shape is otherwise identical."""
    ev = _t(spark, sf, "events")
    cents = F.round(F.col("value") * 100).cast("long")
    return (
        ev.withColumn("c", cents)
        .groupBy("event_type")
        .agg(
            F.round(F.percentile("c", F.lit(0.5)), 4).alias("p50"),
            F.round(F.percentile("c", F.lit(0.95)), 4).alias("p95"),
            F.count(F.lit(1)).alias("n"),
        )
    )


def q_heavy_hitters(spark, sf):
    """Corpus-wide top-20 terms — explode + ONE map-side-combined hash
    aggregate + a 20-row total order (the sort input is the vocabulary
    aggregate, not the corpus).  Exact: batch heavy-hitters at any
    scale is partial aggregation; sketches (count-min/SpaceSaving) are
    only needed when the vocabulary itself cannot be shuffled —
    streaming, not batch parquet."""
    toks = (
        _t(spark, sf, "documents")
        .select(F.explode(TX.token_array("text")).alias("term"))
        .filter(F.col("term") != "")
    )
    counts = toks.groupBy("term").agg(F.count(F.lit(1)).alias("n"))
    w = Window.orderBy(F.col("n").desc(), F.col("term").asc())
    return (
        counts.withColumn("rn", F.row_number().over(w).cast("long"))
        .filter(F.col("rn") <= 20)
        .select("term", "n", "rn")
    )


def q_substring_dedup(spark, sf):
    """Exact substring-level dedup signals (Lee et al. 2022,
    "Deduplicating Training Data Makes Language Models Better"): per
    document, how many token positions are covered by a token 10-gram
    occurring ≥2 times ANYWHERE in the corpus (within-doc repeats
    included, as ExactSubstr counts them).  Output per doc: token
    count, duplicated-gram occurrence count, distinct covered token
    positions, and integer per-mille coverage — the signal a corpus
    build thresholds to drop or trim boilerplate-heavy spans at the
    granularity BETWEEN whole-doc near-dup and C4 three-sentence
    chunks (q_chunk_dedup).

    Scale shape: one explode to (doc, pos, gram-hash) rows — the
    standard fixed-N approximation of suffix-array ExactSubstr, which
    needs no global suffix sort — then a combiner-backed count keyed on
    the int64 portable hash, a same-key join back (exchange reuse), a
    bounded ×10 position explode, and one per-doc aggregate.  No
    windows, no driver state; duplicated-gram skew is capped by the
    count table being gh-keyed (a corpus-wide boilerplate gram is ONE
    counter row)."""
    from .functions.curation import substring_dup_stats

    return substring_dup_stats(_t(spark, sf, "documents"), n=10)


def q_tfidf_topk(spark, sf):
    """Per-document top-3 terms by smoothed TF-IDF — explode, two
    hash-aggregations (term frequency; document frequency), a term-keyed
    join, and a per-doc window.  The corpus size enters as one driver
    scalar (a count is an aggregate, not a collect).  Ranking uses the
    ROUNDED score with the term as tiebreak, so ordering is identical
    cross-engine even when libm ln differs in the last ulp."""
    docs = _t(spark, sf, "documents")
    n_docs = docs.count()
    toks = docs.select(
        "doc_id", F.explode(TX.token_array("text")).alias("term")
    ).filter(F.col("term") != "")
    tf = toks.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    dfreq = toks.groupBy("term").agg(F.countDistinct("doc_id").alias("dfr"))
    scored = tf.join(dfreq, "term").select(
        "doc_id",
        "term",
        F.round(
            F.col("tf") * (F.log((n_docs + 1.0) / (F.col("dfr") + 1.0)) + 1.0), 4
        ).alias("score"),
    )
    w = Window.partitionBy("doc_id").orderBy(F.col("score").desc(), F.col("term").asc())
    return (
        scored.withColumn("rn", F.row_number().over(w).cast("long"))
        .filter(F.col("rn") <= 3)
        .select("doc_id", "term", "score", "rn")
    )


def q_train_split(spark, sf):
    """Deterministic 90/10 train/holdout split: the bucket is the
    portable md5-int60 of doc_id mod 100, so a document lands in the
    same split on any cluster size, any engine, any rerun — the only
    sound way to split at 10^10 docs (rand() re-draws per action;
    row-position splits change under repartitioning)."""
    h = TX.md5_int60(F.col("doc_id").cast("string"))
    return _t(spark, sf, "documents").select(
        "doc_id",
        F.pmod(h, F.lit(100)).cast("long").alias("bucket"),
        F.when(F.pmod(h, F.lit(100)) < 90, "train")
        .otherwise("holdout")
        .alias("split"),
    )


def q_bigram_topk(spark, sf):
    """Corpus top-20 bigrams — the adjacent-pair construction stays
    inside the array (zip_with over two slices, no posexplode
    self-join), then ONE map-side-combined hash aggregate over the
    exploded pairs and a 20-row total order over the bigram vocabulary.
    Single-token and empty docs contribute nothing (slice length 0)."""
    toks = TX.token_array("text")
    n = F.size(toks)
    pair_len = F.greatest(n - 1, F.lit(0))
    bigrams = F.zip_with(
        F.slice(toks, 1, pair_len),
        F.slice(toks, 2, pair_len),
        lambda a, b: F.concat(a, F.lit(" "), b),
    )
    counts = (
        _t(spark, sf, "documents")
        .select(F.explode(bigrams).alias("bigram"))
        .groupBy("bigram")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    w = Window.orderBy(F.col("n").desc(), F.col("bigram").asc())
    return (
        counts.withColumn("rn", F.row_number().over(w).cast("long"))
        .filter(F.col("rn") <= 20)
        .select("bigram", "n", "rn")
    )


def q_repetition_ratio(spark, sf):
    """Within-document repetition signals — the Gopher/MassiveText
    repetition-filter family (templated spam and keyword-stuffed pages
    are repetitive; prose is not):

    - ``dup_token_per_mille``: fraction of tokens that repeat an
      earlier token, exact integer per-mille.  Array-local
      (size/array_distinct), zero shuffle — at 100 TB this is a pure
      map over the scan.
    - ``top_bigram_n`` / ``top_bigram_per_mille``: the most frequent
      token bigram's count and its share of all bigram slots.  Bigram
      frequency genuinely needs a per-(doc, bigram) count, so this
      half shuffles ONCE on (doc_id, bigram) — map-side combined, keys
      are (int64, short string), no text column in the shuffle — then
      one per-doc max+sum re-aggregate on doc_id.

    Documents with <2 tokens have no bigrams: LEFT join + coalesce(0)
    keeps them (a one-word doc is not "repetitive").  All scores are
    integer (div semantics) for bit-identical cross-engine equality.
    Reference grounding: extends the scalar-extraction layer of
    otodom/commons/extensions.go:10-22 to corpus curation (graft
    brief), like the rest of the text-quality family."""
    docs = _t(spark, sf, "documents")
    rep = TX.repetition_stats("text")
    stats = docs.select(
        "doc_id",
        rep["n_tokens"].alias("n_tokens"),
        rep["dup_token_per_mille"].alias("dup_token_per_mille"),
    )
    per_doc_bigram = (
        docs.select(
            "doc_id", F.explode(TX.token_ngrams_all("text", 2)).alias("bigram")
        )
        .groupBy("doc_id", "bigram")
        .agg(F.count(F.lit(1)).alias("n"))
        .groupBy("doc_id")
        .agg(
            F.max("n").alias("top_bigram_n"),
            F.sum("n").alias("n_bigrams"),
        )
    )
    return stats.join(per_doc_bigram, "doc_id", "left").select(
        "doc_id",
        "n_tokens",
        "dup_token_per_mille",
        F.coalesce(F.col("top_bigram_n"), F.lit(0)).cast("long").alias("top_bigram_n"),
        F.coalesce(
            F.floor((F.lit(1000) * F.col("top_bigram_n")) / F.col("n_bigrams")),
            F.lit(0),
        )
        .cast("long")
        .alias("top_bigram_per_mille"),
    )


def q_lm_score(spark, sf):
    """Unigram-LM document quality score — mean ln(p(token)) under the
    corpus's own unigram distribution, the classic cheap LM filter for
    training-data curation (gibberish and boilerplate score low).  Two
    passes over the exploded tokens: vocabulary counts, then a
    term-keyed join back and a per-doc mean.  The corpus token total
    enters as one driver scalar (an aggregate, not a collect); the
    score is rounded to 4 dp for cross-engine value equality (sum of
    a few hundred doubles is stable far below 1e-4)."""
    docs = _t(spark, sf, "documents")
    toks = docs.select(
        "doc_id", F.explode(TX.token_array("text")).alias("term")
    ).filter(F.col("term") != "")
    counts = toks.groupBy("term").agg(F.count(F.lit(1)).alias("n"))
    total = float(toks.count())
    return (
        toks.join(counts, "term")
        .groupBy("doc_id")
        .agg(
            F.round(F.avg(F.log(F.col("n") / F.lit(total))), 4).alias("lm_score"),
            F.count(F.lit(1)).cast("long").alias("n_tok"),
        )
    )


def q_stratified_sample(spark, sf):
    """Stratified deterministic sample: up to 5 docs per language,
    chosen by hash order (not file order) — per-stratum window rank, the
    same rows at any parallelism."""
    h = TX.md5_int60(F.col("doc_id").cast("string"))
    w = Window.partitionBy("lang").orderBy(h.asc(), F.col("doc_id").asc())
    return (
        _t(spark, sf, "documents")
        .withColumn("rn", F.row_number().over(w).cast("long"))
        .filter(F.col("rn") <= 5)
        .select("doc_id", "lang", "rn")
    )


_DUP_CC_MEMO: dict[tuple[str, str, str], DataFrame] = {}
# LRU cap (ADVICE r3): each memo entry pins an eagerly localCheckpointed
# O(docs) label table on the executors for the session's lifetime; a
# long-lived session sweeping scale factors would otherwise accumulate
# them without bound.  Two entries cover every real access pattern
# (bench sf + test sf).  Eviction drops the last Python reference:
# DataFrame.unpersist() is best-effort here (a localCheckpoint's RDD
# blocks are not in the SQL cache manager), so actual block release
# happens when the ContextCleaner collects the dereferenced RDD — the
# session config forces a JVM GC every 60 s (session.py
# periodicGC.interval) precisely so that window is bounded.
_DUP_CC_MEMO_MAX = 2


def _dup_cc(spark, sf, pair_kind: str = "exact"):
    """Shared by q_dup_clusters / q_neardup_dedup / q_cluster_canonical
    (mirrors the oracle side's _DUP_CC_CTE): near-dup pairs at
    threshold 0.4 — the constant the oracle CTE hard-codes — resolved
    to components.

    ``pair_kind`` is the wired scale switch (VERDICT r3 item 4):

    - ``"exact"`` (default): ``ngram_jaccard_pairs`` — the oracle-exact
      kernel the DuckDB recursive CTE replays.  Right up to ~10^8 docs.
    - ``"minhash"``: ``minhash_neardup_pairs`` — banded LSH candidates
      + exact verification of candidates only.  The 10^10-doc path: all
      pair-generation shuffles move (int64, int64) rows regardless of
      corpus text size.  Same output contract (a, b at threshold 0.4),
      recall governed by the banding curve; component equality vs the
      exact kernel is pinned on the fixture corpus by
      tests/test_functions.py::test_dup_cc_minhash_matches_exact.

    Engine callers select the kind via ``dup_cc(...)`` below or the
    ``SPARK_GRAFT_CC_PAIRS`` env var; the contract queries stay
    ``"exact"`` so the oracle comparison is bit-faithful.

    Memoized per (session, sf, kind) like _host_pagerank:
    connected_components returns an eager localCheckpoint (materialized
    O(docs) labels), so the three cluster consumers reuse ONE pair
    generation + label propagation instead of recomputing the most
    expensive kernel in the contract three times."""
    from .functions.graph import connected_components

    key = (spark.sparkContext.applicationId, sf, pair_kind)
    hit = _DUP_CC_MEMO.get(key)
    if hit is not None:
        # true LRU: refresh recency so a hot entry is never the one
        # evicted in a cyclic three-key workload
        _DUP_CC_MEMO[key] = _DUP_CC_MEMO.pop(key)
        return hit
    docs = _t(spark, sf, "documents")
    if pair_kind == "minhash":
        pairs = ND.minhash_neardup_pairs(
            docs, threshold=0.4, hash_fn=TX.md5_int60
        ).select("a", "b")
    elif pair_kind == "exact":
        pairs = ND.ngram_jaccard_pairs(docs, threshold=0.4).select("a", "b")
    else:
        raise ValueError(f"pair_kind must be 'exact' or 'minhash', got {pair_kind!r}")
    out = connected_components(
        pairs, nodes=docs.select(F.col("doc_id").alias("node"))
    )
    while len(_DUP_CC_MEMO) >= _DUP_CC_MEMO_MAX:
        oldest = next(iter(_DUP_CC_MEMO))
        evicted = _DUP_CC_MEMO.pop(oldest)
        try:
            evicted.unpersist()
        except Exception:
            pass
    _DUP_CC_MEMO[key] = out
    return out


def dup_cc(spark, sf, pair_kind: str | None = None) -> DataFrame:
    """Public component-table entry point with the scale switch
    exposed: ``pair_kind=None`` reads ``SPARK_GRAFT_CC_PAIRS``
    (default ``exact``), so a 10^10-doc deployment flips the whole
    dedup family to the MinHash pair path with one config knob and no
    code change."""
    if pair_kind is None:
        pair_kind = os.environ.get("SPARK_GRAFT_CC_PAIRS", "exact")
    return _dup_cc(spark, sf, pair_kind)


def q_dup_clusters(spark, sf):
    """Pairs → clusters: connected components over the exact n-gram-
    Jaccard near-dup graph (functions.graph.connected_components,
    min-label propagation as pure DataFrame joins).  Every document gets
    a cluster_id = min doc_id of its component (singletons label
    themselves) — the deterministic keeper for dedup at any
    parallelism."""
    return _dup_cc(spark, sf).select(
        F.col("node").alias("doc_id"), F.col("component").alias("cluster_id")
    )


def q_neardup_dedup(spark, sf):
    """END-TO-END corpus dedup: near-dup pairs (exact n-gram Jaccard)
    → connected components → one keeper per cluster (min doc_id) with
    its cluster size — the full pipeline a training-data build runs,
    composed from q_ngram_jaccard's pair kernel and q_dup_clusters'
    resolution, verified as ONE query against a recursive-CTE oracle.
    Swap the pair stage for minhash_neardup_pairs at 10^10 docs (the
    downstream composition is identical); the keeper aggregation adds
    one map-side-combinable count over the component labels."""
    return _dup_cc(spark, sf).groupBy(F.col("component").alias("doc_id")).agg(
        F.count(F.lit(1)).cast("long").alias("n_members")
    )


def q_cluster_canonical(spark, sf):
    """Canonical-document selection per near-dup cluster: instead of
    the min-id keeper (q_neardup_dedup), each cluster keeps its
    HIGHEST-QUALITY member (shared integer quality kernel; min doc_id
    tie-break) — the policy real corpus builds use, since the first-id
    copy of a boilerplate-heavy page is rarely the best one.  The
    keeper choice is a combinable ``max(struct(quality, -id))`` — no
    per-cluster window, so one mega-cluster is a single reduce key."""
    cc = _dup_cc(spark, sf)
    q = _t(spark, sf, "documents").select(
        F.col("doc_id").alias("node"), TX.quality_score("text").alias("quality_bp")
    )
    j = cc.join(q, "node")
    agg = j.groupBy(F.col("component").alias("cluster_id")).agg(
        F.max(F.struct(F.col("quality_bp"), (-F.col("node")).alias("neg_id"))).alias(
            "k"
        ),
        F.count(F.lit(1)).cast("long").alias("n_members"),
    )
    return agg.select(
        "cluster_id",
        (-F.col("k.neg_id")).cast("long").alias("canonical_id"),
        F.col("k.quality_bp").alias("canonical_quality_bp"),
        "n_members",
    )


def q_minhash_neardup(spark, sf):
    """MinHash+LSH near-dup pairs, exact-verified.  Portable md5-int60
    shingle hashes: the DuckDB oracle replays signatures (HUGEINT
    modular arithmetic, same permutation constants), band candidates,
    and exact-Jaccard verification bit-for-bit."""
    return ND.minhash_neardup_pairs(
        _t(spark, sf, "documents"), threshold=0.4, hash_fn=TX.md5_int60
    )


def q_incremental_neardup(spark, sf):
    """Incremental near-dup probe: which docs of a new crawl increment
    (doc_id % 5 = 0) near-duplicate an already-indexed corpus doc
    (doc_id % 5 <> 0) — the per-round dedup shape at 100 TB, where the
    corpus MinHash index persists and only the delta is signatured.
    Cross-set LSH band join (increment side broadcast) + exact-Jaccard
    verification; portable md5-int60 hashes, so the DuckDB oracle
    replays signatures, cross-set band candidates, and verification
    bit-for-bit."""
    docs = _t(spark, sf, "documents")
    return ND.incremental_neardup_pairs(
        docs.filter(F.col("doc_id") % 5 != 0),
        docs.filter(F.col("doc_id") % 5 == 0),
        threshold=0.4,
        hash_fn=TX.md5_int60,
    )


def q_simhash_neardup(spark, sf):
    """SimHash signatures + Hamming≤3 pairs.  Portable md5-int60 token
    hashes; the oracle brute-forces all pairs — valid because banding
    is EXACT (pigeonhole: d≤3 ⇒ one of 4 16-bit bands equal), so the
    banded plan must reproduce the brute-force result."""
    sigs = ND.simhash64(_t(spark, sf, "documents"), hash_fn=TX.md5_int60)
    return ND.simhash_neardup_pairs(sigs, max_hamming=3)


def q_rolling_fingerprint(spark, sf):
    """Winnowing-style min-hash fingerprint (portable md5-int60)."""
    return _t(spark, sf, "documents").select(
        "doc_id", TX.rolling_fingerprint("text", portable=True).alias("rfp")
    )


# =====================================================================
# Training-data ops: embeddings
# =====================================================================
def q_embedding_topk(spark, sf):
    """Brute-force cosine top-10 vs vec_id=0 (exact ANN baseline)."""
    return SIM.topk_bruteforce(_t(spark, sf, "embeddings"), query_vec_id=0, k=10)


def q_knn_per_vec(spark, sf):
    """Exact 3-NN for every vector (per-cell IVF kernel shape)."""
    return SIM.pairwise_topk_bruteforce(_t(spark, sf, "embeddings"), k=3)


def q_embedding_lsh_topk(spark, sf):
    """Multi-table LSH approximate top-10 vs vec_id=0, planes scaled to
    corpus size (rows-only check: approximate by construction; recall
    ≥0.8 vs brute force pinned in tests/test_functions.py)."""
    import pyarrow.parquet as pq

    emb = _t(spark, sf, "embeddings")
    n = pq.read_metadata(f"{sf}/embeddings.parquet").num_rows  # no count job
    return SIM.topk_lsh(emb, query_vec_id=0, dim=64, k=10, n_vectors=n)


def q_embedding_neardup(spark, sf):
    """Embedding-cosine near-dup pairs (exact all-pairs kernel with a
    DuckDB oracle; the at-scale variant is the IVF-bucketed path of the
    same function, recall-pinned in tests)."""
    return SIM.cosine_neardup_pairs(_t(spark, sf, "embeddings"), threshold=0.3)


def q_knn_ivf(spark, sf):
    """IVF-partitioned approximate 3-NN for every vector — the at-scale
    kNN plan (no global crossJoin; ~2√N candidates per vector).
    Rows-only: approximate by construction; recall ≥0.8 pinned in
    tests/test_functions.py."""
    import pyarrow.parquet as pq

    n = pq.read_metadata(f"{sf}/embeddings.parquet").num_rows  # no count job
    return SIM.pairwise_topk_ivf(
        _t(spark, sf, "embeddings"), k=3, n_probe=2, dim=64, n_vectors=n
    )


# =====================================================================
# Training-data ops: multimodal
# =====================================================================
def q_image_decode_meta(spark, sf):
    """Binary-payload decode plumbing over deterministic synthetic
    payloads derived from doc_ids (rows-only: binary codecs are not
    DuckDB-expressible)."""
    docs = _t(spark, sf, "documents").limit(200)
    imgs = attach_synthetic_images(docs, "doc_id")
    return decode_meta(imgs).select("image_id", "dec_w", "dec_h", "dec_phash", "decode_ok")


def _image_sigs(spark, sf, limit: int = 100):
    """Shared by q_image_phash_neardup / q_image_phash_clusters: phash
    signatures of ``limit`` synthetic originals UNION their quality-99
    JPEG recompressions (decode failures dropped).  One derivation so
    the pairs query and the clusters query built on it can never
    desynchronize on limit / transcode quality / decode filter."""
    docs = _t(spark, sf, "documents").limit(limit)
    orig = attach_synthetic_images(docs, "doc_id")
    copies = transcode(orig, "jpg")
    return (
        decode_meta(orig.unionByName(copies))
        .filter(F.col("decode_ok"))
        .select("image_id", F.col("dec_phash").alias("simhash"))
    )


def q_image_phash_neardup(spark, sf):
    """Image near-dup detection: original images vs their lossy-JPEG
    recompressed copies, caught by perceptual-hash Hamming banding —
    the SAME 4×16-bit band self-join as text SimHash (at 100 TB, image
    dedup IS phash banding).  Quality-99 recompression keeps hamming
    ≤ 3, inside the 4-band pigeonhole guarantee — with
    ``max_bucket=None`` (exact banding) recall is exact, not
    probabilistic.  A production corpus would keep the default hot-band
    skew guard and accept losing pairs of degenerate (solid-color)
    images instead.  Rows-only: binary codecs are not
    DuckDB-expressible."""
    return ND.simhash_neardup_pairs(
        _image_sigs(spark, sf), max_hamming=3, id_col="image_id", max_bucket=None
    )


def q_image_phash_clusters(spark, sf):
    """Image dedup END-TO-END on the image axis: phash Hamming pairs
    (q_image_phash_neardup's kernel) → connected components → one
    keeper per visual cluster — what a 100 TB image corpus actually
    ships to training (one representative per recompressed family),
    mirroring q_neardup_dedup's text pipeline.  String image ids are
    hashed to int64 nodes for the min-label propagation (md5-int60,
    collision odds ~n²/2^60) and mapped back to ids by join; keeper =
    the image whose hash is the component label.  Rows-only: binary
    codecs are not DuckDB-expressible; orig∪copy co-clustering is
    test-pinned."""
    from .functions.graph import connected_components

    sigs = _image_sigs(spark, sf).persist()
    ids = sigs.select("image_id", TX.md5_int60(F.col("image_id")).alias("node"))
    pairs = ND.simhash_neardup_pairs(
        sigs, max_hamming=3, id_col="image_id", max_bucket=None
    ).select(
        TX.md5_int60(F.col("a")).alias("a"), TX.md5_int60(F.col("b")).alias("b")
    )
    cc = connected_components(pairs, nodes=ids.select("node"))
    out = (
        cc.join(ids, "node")
        .join(
            ids.select(
                F.col("node").alias("component"),
                F.col("image_id").alias("keeper_image_id"),
            ),
            "component",
        )
        .select("image_id", "keeper_image_id")
        # materialize before releasing the decoded-signature cache (the
        # id joins reference it); ≤2·limit rows
        .localCheckpoint(eager=True)
    )
    sigs.unpersist()
    return out


def q_image_psnr(spark, sf):
    """The input_hint per-row invariant as a first-class query: PSNR of
    every image against its own real-JPEG (quality-99) recompression,
    computed inside one Arrow kernel (multimodal.recompress_psnr) —
    bytes never shuffle.  Rows-only: binary codecs are not
    DuckDB-expressible; the ≥40 dB gate itself is test-pinned."""
    docs = _t(spark, sf, "documents").limit(100)
    return recompress_psnr(attach_synthetic_images(docs, "doc_id"), "jpg")


def q_pair_quality(spark, sf):
    """Joint image+caption quality gate over the input_hint pair shape
    — the multimodal analogue of q_corpus_filter and the filter every
    image-caption training pipeline runs before dedup: decode-check +
    dimension floor + exposure band on the image side, token floor +
    quality floor on the caption side, one machine-readable reason per
    pair.  Project-early/join-late: decode_meta ships only (id, meta)
    out of the Arrow kernel, caption scoring is pure codegen, and the
    two meet in a metadata-only equi join — bytes never shuffle.
    Rows-only: pixel decode is not DuckDB-expressible; the row
    invariants are test-pinned."""
    docs = _t(spark, sf, "documents").limit(200)
    meta = decode_meta(attach_synthetic_images(docs, "doc_id"))
    caps = docs.select(
        F.format_string("img-%012d", "doc_id").alias("image_id"),
        F.col("doc_id"),
        TX.token_count("text").alias("cap_tokens"),
        TX.quality_score("text").alias("cap_quality_bp"),
    )
    paired = meta.join(caps, "image_id")
    reason = (
        F.when(~F.col("decode_ok"), F.lit("image_corrupt"))
        .when((F.col("dec_w") < 16) | (F.col("dec_h") < 16), F.lit("image_too_small"))
        .when(
            (F.col("mean_luma") < 16.0) | (F.col("mean_luma") > 240.0),
            F.lit("bad_exposure"),
        )
        .when(F.col("cap_tokens") < 8, F.lit("caption_short"))
        .when(F.col("cap_quality_bp") < 5500, F.lit("caption_low_quality"))
        .otherwise(F.lit("kept"))
    )
    return paired.select(
        "image_id",
        "doc_id",
        "dec_w",
        "dec_h",
        "mean_luma",
        "cap_tokens",
        "cap_quality_bp",
        reason.alias("reason"),
        (reason == "kept").cast("boolean").alias("kept"),
    )


def q_image_quality_gate(spark, sf):
    """Visual-quality gate — the image-side counterpart of
    q_corpus_filter: entropy / contrast / flat-run / exposure
    statistics from ONE Arrow kernel (multimodal.image_stats, integer
    stats so thresholds are representation-exact), composed into
    machine-readable keep/drop reasons by pure codegen expressions —
    the blank/flat/banner filter an image-caption corpus runs before
    dedup.  Rows-only: pixel decode is not DuckDB-expressible; kernel
    invariants (flat image → low entropy + full flat share, noise →
    high entropy) are test-pinned."""
    from .functions.multimodal import image_stats

    docs = _t(spark, sf, "documents").limit(200)
    imgs = attach_synthetic_images(docs, "doc_id")
    # every 10th payload truncated to its first 8 bytes: bad bytes at
    # 100 TB are data, not exceptions — the gate must ROUTE them
    # (reason='corrupt'), not fail the task
    imgs = imgs.withColumn(
        "bytes",
        F.when(
            F.expr("CAST(substr(image_id, -2, 2) AS INT) % 10 = 0"),
            F.expr("substring(bytes, 1, 8)"),
        ).otherwise(F.col("bytes")),
    )
    stats = image_stats(imgs)
    reason = (
        F.when(~F.col("decode_ok"), F.lit("corrupt"))
        .when(F.col("mean_luma") < 16.0, F.lit("too_dark"))
        .when(F.col("mean_luma") > 240.0, F.lit("too_bright"))
        .when(F.col("flat_share_bp") >= 9000, F.lit("flat"))
        .when(F.col("entropy_cb") < 100, F.lit("low_entropy"))
        .otherwise(F.lit("kept"))
    )
    return stats.select(
        "image_id",
        "mean_luma",
        "entropy_cb",
        "contrast_cb",
        "flat_share_bp",
        reason.alias("reason"),
        (reason == "kept").cast("boolean").alias("kept"),
    )


def q_audio_features(spark, sf):
    """Audio-modality feature extraction over REAL RIFF/WAVE payloads
    (crawler_spark.audio — PCM16 plus IMA ADPCM, neither needing an
    external library, so nothing here is a stand-in; every 4th clip in
    the corpus is a real format-0x11 ADPCM file): duration, RMS level,
    zero-crossing rate, FFT-dominant pitch per clip, one Arrow kernel,
    bytes never shuffle.  Rows-only: PCM/ADPCM decode + FFT are not
    DuckDB-expressible; ground-truth pitch recovery is test-pinned."""
    docs = _t(spark, sf, "documents").limit(200)
    from .functions.multimodal import attach_synthetic_audio, audio_features

    return audio_features(attach_synthetic_audio(docs, "doc_id"))


def q_frame_sample(spark, sf):
    """Video frame sampling over the real MJV1 motion-frame container
    (crawler_spark.video): every 4th frame of 50 deterministic 12-frame
    clips, with per-frame decoded phash (rows-only: binary codecs are
    not DuckDB-expressible)."""
    from .functions.multimodal import attach_synthetic_videos, frame_sample

    docs = _t(spark, sf, "documents").limit(50)
    vids = attach_synthetic_videos(docs, "doc_id")
    return frame_sample(vids, every_n=4).select(
        "image_id", "frame_idx", "frame_phash"
    )


def q_video_demux(spark, sf):
    """Container-uniform video demux over a MIXED corpus (doc_ids
    cycle MJV1 / real ISO-BMFF MP4 / movie-fragmented DASH-style fMP4
    / real Matroska WebM / real RIFF AVI, all carrying the same
    encoded frame payloads): keyframe selection from real sample
    tables (crawler_spark.mp4 — stts/stsc/stsz/stco/stss, plus
    moof/traf/tfhd/trun for the fragmented variant), real EBML
    SimpleBlock flags (crawler_spark.webm) and real idx1 flags
    (crawler_spark.avi), no pixel decode, no payload bytes touched
    for skipped samples.  Rows-only: binary container parsing is not
    DuckDB-expressible; sample-count/dts/sync invariants are pinned
    by pytest (tests/test_mp4.py)."""
    from .functions.multimodal import attach_synthetic_videos, video_demux

    docs = _t(spark, sf, "documents").limit(50)
    vids = attach_synthetic_videos(docs, "doc_id", container="mixed")
    return video_demux(vids, keyframes_only=True).select(
        "image_id", "sample_idx", "dts_ms", "is_sync", "n_bytes"
    )


# =====================================================================
# Training-data ops: corpus curation (span dedup, boilerplate, PII,
# source-quality propagation) + crawl hygiene (traps, recrawl)
# =====================================================================
def q_chunk_dedup(spark, sf):
    """C4-style span-level duplicate removal: every 3-token chunk kept
    only at its first global occurrence, docs re-assembled from the
    surviving spans (functions/curation.chunk_dedup; keeper choice is
    a combinable min(struct), shuffle keys are md5 — never the span
    text on the wide side)."""
    from .functions import curation as CU

    return CU.chunk_dedup(_t(spark, sf, "documents"), n=3)


def q_boilerplate(spark, sf):
    """Per-host boilerplate-line inventory over synthesized pages
    (orders → 40 hosts, 5 lines/page: one global nav line, two
    host-level header/footer lines, two unique body lines).  A line on
    ≥80% of a host's pages is boilerplate — exact-integer threshold,
    per-page duplicates counted once (curation.boilerplate_lines)."""
    from .functions import curation as CU

    o = _t(spark, sf, "orders")
    host = F.concat(F.lit("h"), F.pmod("o_custkey", F.lit(40)).cast("string"))
    cents = F.round(F.col("o_totalprice") * 100).cast("long")
    text = F.concat_ws(
        "\n",
        F.lit("menu home products contact"),
        F.concat(F.lit("welcome to "), host),
        F.concat(
            F.lit("item "),
            F.col("o_orderkey").cast("string"),
            F.lit(" "),
            F.col("o_orderpriority"),
        ),
        F.concat(F.lit("total "), cents.cast("string")),
        F.concat(F.lit("copyright "), host),
    )
    pages = o.select(
        host.alias("host"), F.col("o_orderkey").alias("page_id"), text.alias("text")
    )
    return CU.boilerplate_lines(pages)


def q_pii_scrub(spark, sf):
    """PII redaction (emails + phone numbers) with per-doc removal
    counts over synthesized contact pages (part → every row carries an
    email, every third row a phone).  RE2-safe patterns shared verbatim
    with the oracle (curation.EMAIL_RE / PHONE_RE); one narrow
    projection, zero shuffles."""
    from .functions import curation as CU

    p = _t(spark, sf, "part")
    phone = F.concat(
        F.lit("tel +"),
        (F.pmod("p_partkey", F.lit(90)) + 1).cast("string"),
        F.lit("-"),
        F.lpad(F.pmod("p_partkey", F.lit(1000)).cast("string"), 3, "0"),
        F.lit("-"),
        F.lpad(F.pmod("p_partkey", F.lit(10000)).cast("string"), 4, "0"),
    )
    text = F.concat(
        F.col("p_name"),
        F.lit(" contact user"),
        F.col("p_partkey").cast("string"),
        F.lit("@mail"),
        F.pmod("p_partkey", F.lit(7)).cast("string"),
        F.lit(".com "),
        F.when(F.pmod("p_partkey", F.lit(3)) == 0, phone).otherwise(F.lit("no phone")),
    )
    return CU.pii_scrub(p.select(F.col("p_partkey").alias("doc_id"), text.alias("text")))


def q_source_quality(spark, sf):
    """Source-level quality propagation: exact integer per-source mean
    of the shared quality kernel, broadcast back, keep docs ≥ half
    their source's mean (curation.source_quality — the domain-prior
    step of quality-classified corpora)."""
    from .functions import curation as CU

    return CU.source_quality(_t(spark, sf, "documents"))


def q_trap_detect(spark, sf):
    """Crawler-trap verdict per host over synthesized URL shapes
    (orders → 40 hosts; hosts h0-h9 emit segment-loop paths).  Signals:
    loop share ≥30% (exact integer), depth ≥12, path-space stats — one
    narrow projection + one combiner-backed groupBy
    (operators/traps.py)."""
    from .operators.traps import trap_verdict, url_shape

    o = _t(spark, sf, "orders")
    host_i = F.pmod("o_custkey", F.lit(40))
    reps = F.when(host_i < 10, F.pmod("o_orderkey", F.lit(4)) + 1).otherwise(F.lit(1))
    seg = F.concat(F.lit("s"), F.pmod("o_orderkey", F.lit(5)).cast("string"))
    path = F.concat(
        F.lit("/"), F.array_join(F.array_repeat(seg, reps.cast("int")), "/")
    )
    urls = o.select(
        F.concat(F.lit("h"), host_i.cast("string")).alias("host"), path.alias("path")
    )
    return trap_verdict(url_shape(urls))


def q_mirror_hosts(spark, sf):
    """Mirror/alias-host detection: source pairs sharing ≥20 distinct
    token 7-gram hashes (portable md5-int60), scored with the exact-
    integer overlap coefficient in basis points.  Hot shingles (on >64
    sources) are dropped before the self-join — the boilerplate skew
    guard (operators/mirrors.py).  The reference crawls one curated
    domain and never meets mirrors; at 10^10-URL scale collapsing them
    is a first-class frontier-hygiene stage."""
    from .operators.mirrors import mirror_pairs

    return mirror_pairs(
        _t(spark, sf, "documents"), n=7, min_shared=20, max_gram_sources=64
    )


def q_inverted_index(spark, sf):
    """Inverted-index construction — the artifact a crawl feeds a
    search engine: per term, the document frequency and the posting
    list (capped at the 20 lowest doc_ids, rendered as a string so the
    value-hash compare is representation-stable).  Distinct terms per
    doc via the per-row token array (no corpus-level distinct — the
    dedup happens inside ``array_distinct`` before the explode).  The
    cap is applied by a streaming row_number window BEFORE any
    collect_list, so a stopword-grade term never materializes its full
    posting list in one reducer; the df stays exact over ALL postings
    (combiner-backed count).  The window, the capped collect, and the
    df count all key on ``term``, so the plan reuses one exchange for
    the window+collect side.  Only terms with df ≥ 2 are emitted."""
    docs = _t(spark, sf, "documents")
    terms = docs.select(
        "doc_id",
        F.explode(F.array_distinct(TX.token_array("text"))).alias("term"),
    ).filter(F.col("term") != "")
    counts = terms.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    w = Window.partitionBy("term").orderBy("doc_id")
    postings = (
        terms.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 20)
        .groupBy("term")
        .agg(
            F.array_join(F.array_sort(F.collect_list("doc_id")), ",").alias(
                "postings"
            )
        )
    )
    return (
        counts.filter(F.col("df") >= 2)
        .join(postings, "term")
        .select("term", "df", "postings")
    )


def q_weighted_sample(spark, sf):
    """Deterministic quality-WEIGHTED sampling: per source, keep the 5
    docs with the smallest ``hash(doc_id) div quality`` priority key —
    higher-quality docs get proportionally smaller keys, so the sample
    tilts toward quality while staying a pure function of (doc_id,
    text): reproducible across runs, engines, and cluster sizes (no
    rand(), which is seed-per-partition and reshuffles differently at
    every parallelism).  Integer-exact throughout.  One shuffle by
    source feeding the ranking window."""
    docs = _t(spark, sf, "documents")
    scored = docs.select(
        "doc_id", "source", TX.quality_score("text").alias("quality_bp")
    ).withColumn(
        "samp_key",
        F.expr(
            "div(CAST(conv(substring(md5(CAST(doc_id AS STRING)), 1, 15), 16, 10) AS BIGINT),"
            " greatest(quality_bp, 1L))"
        ),
    )
    w = Window.partitionBy("source").orderBy(
        F.col("samp_key").asc(), F.col("doc_id").asc()
    )
    return scored.withColumn("rank", F.row_number().over(w).cast("long")).filter(
        "rank <= 5"
    )


def q_outlink_extract(spark, sf):
    """Outlink extraction — the operator that FEEDS a general frontier:
    pull every ``<a href>`` from the page HTML (RE2-safe pattern,
    shared verbatim with the oracle), canonicalize (fragment strip +
    ``.html`` cut, crawler_spark.canon — the SAME pipeline the engine's
    URL-seen keys use), split out the host, and dedup per page (one
    page linking twice to one canonical target yields one frontier
    candidate).  Synthesized pages carry absolute links, fragments,
    ``.html`` suffixes, and a duplicate pair so every canon branch and
    the per-page dedup are exercised.  Narrow extract → explode →
    distinct; the only shuffle is the final dedup, keyed on
    (doc_id, canon_url)."""
    p = _t(spark, sf, "part")
    k = F.col("p_partkey")
    html = F.concat(
        F.lit('<html><body><a href="https://h'),
        F.pmod(k, F.lit(30)).cast("string"),
        F.lit(".example/p/"),
        k.cast("string"),
        F.lit('.html#frag">x</a> <a href="https://h'),
        F.pmod(k + 1, F.lit(30)).cast("string"),
        F.lit(".example/q?page="),
        F.pmod(k, F.lit(5)).cast("string"),
        F.lit('">y</a> <a href="https://h'),
        F.pmod(k, F.lit(30)).cast("string"),
        F.lit(".example/p/"),
        k.cast("string"),
        F.lit('.html">dup</a></body></html>'),
    )
    from .canon import canonical_url_col, host_col

    links = p.select(
        k.alias("doc_id"),
        F.explode(
            F.regexp_extract_all(html, F.lit(r'<a href="([^"]+)"'), F.lit(1))
        ).alias("href"),
    )
    return (
        links.select(
            "doc_id",
            canonical_url_col(F.col("href")).alias("canon_url"),
        )
        .withColumn("host", host_col(F.col("canon_url")))
        .distinct()
    )


def q_decontaminate(spark, sf):
    """Benchmark decontamination — docs sharing ≥3 distinct token
    5-grams with the (synthetic) eval split (doc_id % 50 == 0) are
    flagged; every other doc reports its overlap count.  The eval-gram
    table broadcasts (eval sets are small by construction) so the
    corpus side never shuffles before the per-doc count
    (curation.decontaminate)."""
    from .functions import curation as CU

    docs = _t(spark, sf, "documents")
    evalset = docs.filter(F.col("doc_id") % 50 == 0)
    corpus = docs.filter(F.col("doc_id") % 50 != 0)
    return CU.decontaminate(corpus, evalset, n=5, threshold=3)


def q_domain_cap(spark, sf):
    """Domain capping — at most K docs per source, best-quality first
    (deterministic doc_id tie-break): the anti-over-representation
    step every web corpus applies so one mega-domain cannot dominate
    training data.  One shuffle by source + per-source ranking window;
    the cap bounds output at K×|sources|.  (At 10^10 docs with
    mega-sources, the same contract is served by a two-level top-K —
    per-partition head then merge — but the windowed form is the exact
    semantics both paths must match.)"""
    docs = _t(spark, sf, "documents")
    scored = docs.select(
        "doc_id", "source", TX.quality_score("text").alias("quality_bp")
    )
    w = Window.partitionBy("source").orderBy(
        F.col("quality_bp").desc(), F.col("doc_id").asc()
    )
    return scored.withColumn("rank", F.row_number().over(w).cast("long")).filter(
        "rank <= 10"
    )


def q_crawl_budget(spark, sf):
    """Authority-proportional crawl-budget allocation: each host's
    next-round fetch budget is its PageRank share of a global budget
    (100k fetches), clamped to [1, 500] — wiring the authority signal
    into the politeness scheduler's per-host quota instead of a flat
    budget.  All arithmetic is exact integer (micro-unit ranks, div),
    so the allocation hash-matches the oracle's unrolled-CTE replay.
    Plan: the PageRank iterations + ONE single-row global sum broadcast
    back — no extra full-width shuffle, and no recompute of the
    recurrence for the sum side (graph.pagerank returns an eager
    localCheckpoint, so both branches read the materialized rank
    table)."""
    pr = _host_pagerank(spark, sf)
    totals = pr.agg(F.sum("rank_micros").alias("total_micros"))
    alloc = pr.crossJoin(F.broadcast(totals)).withColumn(
        "budget",
        F.least(
            F.greatest(
                F.expr("div(100000 * rank_micros, total_micros)"), F.lit(1).cast("long")
            ),
            F.lit(500).cast("long"),
        ),
    )
    return alloc.select("host_id", "rank_micros", "budget")


def q_recrawl_schedule(spark, sf):
    """Adaptive recrawl scheduling from the events fetch history: a
    change = value differing from the previous fetch (one per-URL lag
    window), interval = span/changes clamped to [1h, 7d], all exact
    integer milliseconds (operators/recrawl.py)."""
    from .operators.recrawl import recrawl_schedule

    e = _t(spark, sf, "events")
    return recrawl_schedule(
        e.select(F.col("user_id").alias("url_id"), "ts", "value", "event_id")
    )


# =====================================================================
# registry + oracles
# =====================================================================
QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    # ------------------------------------------------------------------
    # Registry order is LOAD-BEARING: the round driver oracle-checks the
    # FIRST 50 entries only.  The window below is the round-5 rotation
    # (VERDICT r4 item 1): front-loaded with q_video_demux (the only
    # query with zero driver rows in any round) and the canon queries
    # whose library+oracle were edited in r4 outside the r4 window
    # (q_url_canon_full/q_url_canon/q_surt_index/q_sitemap_extract),
    # then q_frame_sample + q_audio_features (code/corpus edited THIS
    # round: MJV1 dts fix, ADPCM variants), then every remaining entry
    # whose last driver check predates the r4 refactors (the pass-r3
    # block) as regression canaries.  Left below the line, with r3
    # evidence and code verifiably untouched since (git log -L over
    # 087fb30..HEAD is empty for their spans): q_extract_number,
    # q_substring_before, q_json_envelope, q_safe_cast, q_run_stamp.
    # Pinned by tests/test_registry_order.py -- edit both together.
    # ------------------------------------------------------------------
    "q_video_demux": q_video_demux,
    "q_url_canon_full": q_url_canon_full,
    "q_url_canon": q_url_canon,
    "q_surt_index": q_surt_index,
    "q_sitemap_extract": q_sitemap_extract,
    "q_snapshot_diff": q_snapshot_diff,
    "q_frame_sample": q_frame_sample,
    "q_audio_features": q_audio_features,
    "q_extract_office": q_extract_office,
    "q_schema_last": q_schema_last,
    "q_page_url": q_page_url,
    "q_html_strip": q_html_strip,
    "q_robots_gate": q_robots_gate,
    "q_robots_rfc_gate": q_robots_rfc_gate,
    "q_json_decode": q_json_decode,
    "q_partitioned_write": q_partitioned_write,
    "q_frontier_expand": q_frontier_expand,
    "q_max_page": q_max_page,
    "q_equi_join": q_equi_join,
    "q_broadcast_join": q_broadcast_join,
    "q_group_collect": q_group_collect,
    "q_union_all": q_union_all,
    "q_filter_nonempty": q_filter_nonempty,
    "q_crawl_delay_schedule": q_crawl_delay_schedule,
    "q_pacing_schedule": q_pacing_schedule,
    "q_redirect_resolve": q_redirect_resolve,
    "q_pagerank_hosts": q_pagerank_hosts,
    "q_authority_order": q_authority_order,
    "q_anchor_text": q_anchor_text,
    "q_content_sniff": q_content_sniff,
    "q_distinct_urls": q_distinct_urls,
    "q_distinct_urls_approx": q_distinct_urls_approx,
    "q_asof_join": q_asof_join,
    "q_interval_join": q_interval_join,
    "q_shard_pack": q_shard_pack,
    "q_salted_join": q_salted_join,
    "q_window_dedup": q_window_dedup,
    "q_semi_join": q_semi_join,
    "q_lag_delta": q_lag_delta,
    "q_dedup_exact": q_dedup_exact,
    "q_fingerprint": q_fingerprint,
    "q_token_count": q_token_count,
    "q_quality_score": q_quality_score,
    "q_lang_id": q_lang_id,
    "q_shingle_stats": q_shingle_stats,
    "q_knn_per_vec": q_knn_per_vec,
    "q_embedding_lsh_topk": q_embedding_lsh_topk,
    "q_embedding_neardup": q_embedding_neardup,
    "q_knn_ivf": q_knn_ivf,
    "q_image_decode_meta": q_image_decode_meta,
    # --- end of 50-slot driver-check window; every entry below is
    # --- driver-green in r4 (CORRECTNESS_r04.json) or r3 with code
    # --- verifiably untouched since its check (the 5 named above)
    "q_extract_number": q_extract_number,
    "q_json_envelope": q_json_envelope,
    "q_substring_before": q_substring_before,
    "q_safe_cast": q_safe_cast,
    "q_run_stamp": q_run_stamp,
    "q_histogram": q_histogram,
    "q_corpus_filter": q_corpus_filter,
    "q_chunk_dedup": q_chunk_dedup,
    "q_boilerplate": q_boilerplate,
    "q_pii_scrub": q_pii_scrub,
    "q_source_quality": q_source_quality,
    "q_trap_detect": q_trap_detect,
    "q_mirror_hosts": q_mirror_hosts,
    "q_recrawl_schedule": q_recrawl_schedule,
    "q_domain_cap": q_domain_cap,
    "q_crawl_budget": q_crawl_budget,
    "q_decontaminate": q_decontaminate,
    "q_outlink_extract": q_outlink_extract,
    "q_weighted_sample": q_weighted_sample,
    "q_inverted_index": q_inverted_index,
    "q_cluster_canonical": q_cluster_canonical,
    "q_percentiles": q_percentiles,
    "q_heavy_hitters": q_heavy_hitters,
    "q_bigram_topk": q_bigram_topk,
    "q_repetition_ratio": q_repetition_ratio,
    "q_lm_score": q_lm_score,
    "q_substring_dedup": q_substring_dedup,
    "q_tfidf_topk": q_tfidf_topk,
    "q_train_split": q_train_split,
    "q_stratified_sample": q_stratified_sample,
    "q_dup_clusters": q_dup_clusters,
    "q_neardup_dedup": q_neardup_dedup,
    "q_incremental_neardup": q_incremental_neardup,
    "q_minhash_neardup": q_minhash_neardup,
    "q_simhash_neardup": q_simhash_neardup,
    "q_rolling_fingerprint": q_rolling_fingerprint,
    "q_rollup": q_rollup,
    "q_image_psnr": q_image_psnr,
    "q_pair_quality": q_pair_quality,
    "q_image_quality_gate": q_image_quality_gate,
    "q_image_phash_neardup": q_image_phash_neardup,
    "q_image_phash_clusters": q_image_phash_clusters,
    "q_crawl_round": q_crawl_round,
    "q_anti_join_dedup": q_anti_join_dedup,
    "q_cuckoo_dedup": q_cuckoo_dedup,
    "q_order_by": q_order_by,
    "q_host_budget_topk": q_host_budget_topk,
    "q_time_rollup": q_time_rollup,
    "q_metrics_counts": q_metrics_counts,
    "q_ngram_jaccard": q_ngram_jaccard,
    "q_embedding_topk": q_embedding_topk,
    "q_sessionize": q_sessionize,
    "q_pivot": q_pivot,
}

_NORM = r"trim(regexp_replace(lower(text), '\s+', ' ', 'g'))"


def _shingles_sql(n: int) -> str:
    return (
        f"list_distinct(list_transform(generate_series(1, greatest(length(norm)-{n - 1}, 0)),"
        f" i -> substr(norm, i, {n})))"
    )


_SHINGLES = _shingles_sql(5)


def _md5i(expr: str) -> str:
    """DuckDB mirror of text.md5_int60 (first 15 md5 hex digits → int64)."""
    return f"CAST('0x' || substr(md5({expr}),1,15) AS BIGINT)"


# MinHash permutation constants — the SAME (a, b) pairs the Spark UDF
# draws (neardup._perm_params seed 42), embedded as SQL literals so the
# oracle replays the signatures with HUGEINT modular arithmetic.
_MH_A, _MH_B = ND._perm_params(64, seed=42)
_MH_PARAMS = "[" + ",".join(f"[{int(a)},{int(b)}]" for a, b in zip(_MH_A, _MH_B)) + "]"
_MH_MAXSIG = "[" + ",".join(["9223372036854775807"] * 64) + "]"

# shared by q_dup_clusters / q_neardup_dedup: n-gram-Jaccard near-dup
# pairs (same derivation as q_ngram_jaccard) plus the recursive
# transitive closure over the undirected pair graph
_DUP_CC_CTE = f"""WITH RECURSIVE
        docs AS (SELECT doc_id, {_NORM} AS norm FROM documents),
        sh AS (SELECT doc_id, unnest({_SHINGLES}) AS g FROM docs),
        sizes AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id),
        pairs AS (
          SELECT x.doc_id AS a, y.doc_id AS b, count(*) AS inter
          FROM sh x JOIN sh y ON x.g = y.g AND x.doc_id < y.doc_id
          GROUP BY 1, 2),
        e AS (
          SELECT a, b FROM pairs
          JOIN sizes sa ON sa.doc_id = a
          JOIN sizes sb ON sb.doc_id = b
          WHERE round(cast(inter AS DOUBLE)
                      / cast(sa.n_sh + sb.n_sh - inter AS DOUBLE), 4) >= 0.4),
        und AS (SELECT a AS u, b AS v FROM e UNION SELECT b, a FROM e),
        reach(n, m) AS (
          SELECT doc_id, doc_id FROM documents
          UNION
          SELECT r.n, u.v FROM reach r JOIN und u ON u.u = r.m)"""


def _pagerank_ctes(n_iter: int, damping_pct: int = 85) -> str:
    """DuckDB mirror of functions/graph.pagerank as a CTE chain (no
    WITH, no final select — composable): the same integer recurrence
    unrolled one CTE per iteration over q_pagerank_hosts'
    orders-derived host graph; ranks land in ``r{n_iter}``."""
    base = (100 - damping_pct) * 10_000
    ctes = [
        """e AS (
          SELECT DISTINCT o_custkey % 1000 AS src, o_orderkey % 1000 AS dst
          FROM orders WHERE o_custkey % 1000 <> o_orderkey % 1000),
        nodes AS (SELECT src AS node FROM e UNION SELECT dst FROM e),
        deg AS (SELECT src, count(*) AS outdeg FROM e GROUP BY src),
        r0 AS (SELECT node, CAST(1000000 AS BIGINT) AS rank_micros FROM nodes)"""
    ]
    for i in range(1, n_iter + 1):
        ctes.append(f"""r{i} AS (
          SELECT n.node,
                 CAST({base} + ({damping_pct} * COALESCE(c.s, 0)) // 100
                      AS BIGINT) AS rank_micros
          FROM nodes n LEFT JOIN (
            SELECT e.dst AS node, SUM(r.rank_micros // d.outdeg) AS s
            FROM e JOIN r{i - 1} r ON r.node = e.src
                   JOIN deg d ON d.src = e.src
            GROUP BY e.dst) c ON c.node = n.node)""")
    return ",\n        ".join(ctes)


def _pagerank_sql(n_iter: int) -> str:
    return (
        "WITH "
        + _pagerank_ctes(n_iter)
        + f"\n        SELECT node AS host_id, rank_micros FROM r{n_iter}"
    )
_MH_BAND_EQ = " OR ".join(
    f"list_slice(x.sig,{i * 4 + 1},{i * 4 + 4}) = list_slice(y.sig,{i * 4 + 1},{i * 4 + 4})"
    for i in range(16)
)

# SimHash mirror: 64 conditional bit-sums, sign bits reassembled with the
# identical two's-complement bit values the Spark aggregate uses.
_SH_SUMS = ",\n                 ".join(
    f"sum(CASE WHEN ((th >> {j}) & 1) = 1 THEN 1 ELSE -1 END) AS b{j}"
    for j in range(64)
)
_SH_SIG = " + ".join(
    f"CASE WHEN b{j} > 0 THEN CAST({(1 << j) if j < 63 else -(1 << 63)} AS BIGINT)"
    " ELSE 0 END"
    for j in range(64)
)

ORACLES: dict[str, str] = {
    "q_extract_number": (
        "SELECT p_partkey, regexp_replace(p_name, '[^0-9]', '', 'g') AS digits FROM part"
    ),
    "q_extract_office": """
        SELECT p_partkey,
               CASE WHEN p_size % 2 = 0 THEN 'flat' ELSE 'office' END AS schema_name,
               regexp_replace(p_name, '[^0-9]', '', 'g') AS price_digits,
               CASE WHEN p_size % 2 = 0 THEN CAST((p_partkey % 5) + 1 AS VARCHAR)
               END AS rooms,
               CASE WHEN p_size % 2 = 1
                    THEN regexp_replace(p_brand, '[^0-9]', '', 'g')
               END AS total_price_digits
        FROM part
    """,
    "q_json_envelope": (
        "SELECT n_nationkey,"
        " CAST(json_object('n_nationkey', n_nationkey, 'n_name', n_name) AS VARCHAR)"
        " AS envelope FROM nation"
    ),
    "q_schema_last": (
        "SELECT user_id, max_by(event_type, event_id) AS last_type,"
        " max(event_id) AS last_event_id FROM events GROUP BY user_id"
    ),
    "q_substring_before": (
        "SELECT p_partkey, split_part(p_type, ' ', 1) AS head FROM part"
    ),
    "q_page_url": """
        WITH b AS (
          SELECT p_partkey,
                 'https://example.com/p/' || p_partkey ||
                   (CASE WHEN p_size % 2 = 0 THEN '?q=1' ELSE '' END) AS base,
                 (p_partkey % 5) + 1 AS pg
          FROM part)
        SELECT p_partkey,
               base || (CASE WHEN contains(base, '?') THEN '&page=' ELSE '?page=' END)
                    || pg AS page_url
        FROM b
    """,
    "q_safe_cast": (
        "SELECT event_id, try_cast(regexp_extract(props, '[0-9]+') AS BIGINT) AS k_val"
        " FROM events"
    ),
    "q_json_decode": (
        "SELECT event_id, CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_val"
        " FROM events"
    ),
    "q_run_stamp": (
        "SELECT event_id, TIMESTAMP '2026-01-01 00:00:00' AS run_ts FROM events"
    ),
    # q_partitioned_write: rows-only (side-effecting write round-trip)
    "q_frontier_expand": (
        "SELECT p_partkey, cast(unnest(generate_series(1, (p_size % 8) + 2)) AS BIGINT)"
        " AS page FROM part"
    ),
    "q_max_page": (
        "SELECT o_custkey, max(o_orderkey) AS max_order, count(*) AS n_orders"
        " FROM orders GROUP BY o_custkey"
    ),
    "q_equi_join": """
        SELECT o_orderpriority, count(*) AS n_items,
               cast(sum(cast(round(l_extendedprice * (1 - l_discount) * 100) AS BIGINT))
                    AS BIGINT) AS revenue_cents
        FROM orders JOIN lineitem ON o_orderkey = l_orderkey
        GROUP BY o_orderpriority
    """,
    "q_broadcast_join": """
        SELECT r_name, count(*) AS n_customers,
               cast(sum(cast(round(c_acctbal * 100) AS BIGINT)) AS BIGINT) AS acctbal_cents
        FROM customer
        JOIN nation ON c_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
        GROUP BY r_name
    """,
    "q_group_collect": """
        SELECT user_id, count(*) AS n_events,
               array_to_string(list_sort(list(DISTINCT event_type)), ',') AS types
        FROM events GROUP BY user_id
    """,
    "q_metrics_counts": """
        SELECT l_returnflag, l_linestatus, count(*) AS n,
               cast(sum(cast(round(l_quantity) AS BIGINT)) AS BIGINT) AS sum_qty
        FROM lineitem GROUP BY l_returnflag, l_linestatus
    """,
    "q_union_all": (
        "SELECT o_orderkey AS key, 'orders' AS src FROM orders"
        " UNION ALL SELECT l_orderkey AS key, 'lineitem' AS src FROM lineitem"
    ),
    "q_anti_join_dedup": """
        SELECT c_custkey, c_name FROM customer c
        WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    """,
    "q_cuckoo_dedup": """
        SELECT c_custkey, c_name FROM customer c
        WHERE NOT EXISTS (
          SELECT 1 FROM orders o
          WHERE o.o_custkey = c.c_custkey AND o.o_custkey % 10 <> 0
        )
    """,
    "q_filter_nonempty": (
        "SELECT event_id, event_type FROM events WHERE event_type IS NOT NULL"
        " AND event_type <> '' AND props IS NOT NULL"
    ),
    "q_order_by": (
        "SELECT p_partkey, p_size, cast(row_number() OVER (ORDER BY p_size, p_partkey)"
        " AS BIGINT) AS seq FROM part"
    ),
    "q_host_budget_topk": """
        SELECT user_id, event_id, cast(rn AS BIGINT) AS rn FROM (
          SELECT user_id, event_id,
                 row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
          FROM events) WHERE rn <= 3
    """,
    "q_crawl_delay_schedule": """
        WITH fr AS (
          SELECT CAST(p_partkey % 7 AS BIGINT) AS host_id,
                 CAST(p_partkey AS BIGINT) AS url_hash,
                 CAST(p_size % 4 AS BIGINT) AS priority,
                 CAST(p_partkey % 11 AS BIGINT) AS page
          FROM part),
        r AS (
          SELECT CAST(hid AS BIGINT) AS host_id,
                 CAST(hid * 150 AS BIGINT) AS crawl_delay_ms
          FROM (SELECT UNNEST(range(5)) AS hid)),
        j AS (
          SELECT fr.host_id, fr.url_hash, r.crawl_delay_ms,
                 CASE WHEN COALESCE(r.crawl_delay_ms, 0) <= 0 THEN 8
                      ELSE GREATEST(1, LEAST(8,
                        CAST(FLOOR(600.0 / r.crawl_delay_ms) AS BIGINT)))
                 END AS budget,
                 row_number() OVER (PARTITION BY fr.host_id
                                    ORDER BY fr.priority, fr.page, fr.url_hash)
                   AS rn
          FROM fr LEFT JOIN r USING (host_id))
        SELECT host_id, url_hash, CAST(rn AS BIGINT) AS rn,
               CAST((rn - 1) * COALESCE(crawl_delay_ms, 0) AS BIGINT)
                 AS sched_offset_ms,
               CAST(budget AS BIGINT) AS budget
        FROM j WHERE rn <= budget
    """,
    "q_pacing_schedule": """
        WITH e AS (
          SELECT user_id AS host,
                 CAST(epoch_ms(ts) AS BIGINT) AS ts_ms,
                 CAST(event_id AS BIGINT) AS url_hash
          FROM events),
        r AS (
          SELECT host, ts_ms, url_hash,
                 CAST(row_number() OVER (PARTITION BY host
                        ORDER BY ts_ms, url_hash) AS BIGINT) AS rn
          FROM e),
        s AS (
          SELECT *, max(ts_ms - rn * 1000) OVER (
                   PARTITION BY host ORDER BY ts_ms, url_hash
                   ROWS UNBOUNDED PRECEDING) AS mx
          FROM r)
        SELECT host, url_hash, ts_ms,
               CAST(mx + rn * 1000 AS BIGINT) AS sched_ms
        FROM s
    """,
    "q_redirect_resolve": """
        WITH RECURSIVE m AS (
          SELECT CAST(p_partkey AS BIGINT) AS src,
                 CAST(p_partkey - 1 AS BIGINT) AS dst
          FROM part WHERE p_partkey % 5 <> 0),
        r AS (
          SELECT src AS url_id, dst AS cur, CAST(1 AS BIGINT) AS hops FROM m
          UNION ALL
          SELECT r.url_id, m.dst, r.hops + 1
          FROM r JOIN m ON r.cur = m.src)
        SELECT url_id, cur AS final_id, hops FROM (
          SELECT *, row_number() OVER (PARTITION BY url_id
                                       ORDER BY hops DESC) AS rn
          FROM r)
        WHERE rn = 1
    """,
    "q_sessionize": """
        SELECT user_id, event_id,
               cast(sum(CASE WHEN prev IS NULL
                             OR cast(epoch(ts) AS BIGINT) - cast(epoch(prev) AS BIGINT) > 1800
                        THEN 1 ELSE 0 END)
                    OVER (PARTITION BY user_id ORDER BY ts, event_id
                          ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id
        FROM (SELECT user_id, event_id, ts,
                     lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev
              FROM events)
    """,
    "q_time_rollup": """
        SELECT CAST(GROUPING(d, h) AS BIGINT) AS lvl,
               COALESCE(d, TIMESTAMP '1970-01-01 00:00:00') AS d,
               COALESCE(h, -1) AS h,
               COUNT(*) AS n,
               CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS value_cents
        FROM (SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS d,
                     CAST(hour(ts) AS BIGINT) AS h, value
              FROM events)
        GROUP BY ROLLUP(d, h)
    """,
    "q_asof_join": """
        WITH c AS (SELECT event_id, user_id, ts FROM events WHERE event_type = 'click'),
             v AS (SELECT user_id, ts, max(event_id) AS view_event_id
                   FROM events WHERE event_type = 'view' GROUP BY 1, 2)
        SELECT c.event_id, c.user_id, c.ts,
               v.view_event_id IS NOT NULL AS matched,
               COALESCE(v.view_event_id, -1) AS view_event_id,
               COALESCE(v.ts, TIMESTAMP '1970-01-01 00:00:00') AS view_ts
        FROM c ASOF LEFT JOIN v ON c.user_id = v.user_id AND c.ts >= v.ts
    """,
    "q_interval_join": """
        WITH c AS (SELECT event_id, user_id, CAST(epoch(ts) AS BIGINT) AS p
                   FROM events WHERE event_type = 'click'),
             pu AS (SELECT event_id AS purchase_event_id, user_id,
                           CAST(epoch(ts) AS BIGINT) AS lo
                    FROM events WHERE event_type = 'purchase')
        SELECT c.event_id, c.user_id, pu.purchase_event_id
        FROM c JOIN pu ON c.user_id = pu.user_id
                      AND c.p >= pu.lo AND c.p < pu.lo + 1800
    """,
    "q_shard_pack": r"""
        WITH t AS (SELECT doc_id,
                          cast(len(string_split_regex(trim(text), '\s+')) AS BIGINT) AS n_tokens
                   FROM documents)
        SELECT doc_id, n_tokens,
               CAST(COALESCE(SUM(n_tokens) OVER (ORDER BY doc_id
                        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) // 2048
                    AS BIGINT) AS shard_id
        FROM t
    """,
    # the salted join's oracle is the PLAIN join: the salt must not
    # change a single output row
    "q_salted_join": """
        WITH dim AS (
          SELECT DISTINCT event_type,
                 CAST(length(event_type) AS BIGINT) AS type_weight
          FROM events)
        SELECT event_id, e.event_type, type_weight,
               CAST(round(value * 100) AS BIGINT) AS cents
        FROM events e JOIN dim USING (event_type)
    """,
    "q_window_dedup": """
        SELECT user_id, event_id, ts, event_type FROM (
          SELECT user_id, event_id, ts, event_type,
                 row_number() OVER (PARTITION BY user_id
                                    ORDER BY ts DESC, event_id DESC) AS rn
          FROM events)
        WHERE rn = 1
    """,
    "q_pivot": """
        SELECT user_id,
               CAST(coalesce(sum(CASE WHEN event_type = 'click' THEN c END), 0) AS BIGINT) AS click_cents,
               CAST(coalesce(sum(CASE WHEN event_type = 'view' THEN c END), 0) AS BIGINT) AS view_cents,
               CAST(coalesce(sum(CASE WHEN event_type = 'purchase' THEN c END), 0) AS BIGINT) AS purchase_cents,
               CAST(coalesce(sum(CASE WHEN event_type = 'signup' THEN c END), 0) AS BIGINT) AS signup_cents,
               CAST(coalesce(sum(CASE WHEN event_type = 'error' THEN c END), 0) AS BIGINT) AS error_cents
        FROM (SELECT user_id, event_type,
                     CAST(round(value * 100) AS BIGINT) AS c FROM events)
        GROUP BY user_id
    """,
    "q_url_canon": """
        WITH u AS (
          SELECT p_partkey,
                 'https://host' || CAST(p_partkey % 7 AS VARCHAR)
                 || '.example/item/' || CAST(p_partkey AS VARCHAR)
                 || CASE WHEN p_size % 3 = 0 THEN '.html#frag'
                         WHEN p_size % 3 = 1 THEN '.html?page=2'
                         ELSE '' END AS raw_url
          FROM part)
        SELECT p_partkey, raw_url,
               split_part(split_part(raw_url, '#', 1), '.html', 1) AS canon_url,
               regexp_extract(raw_url,
                 '^[a-zA-Z][a-zA-Z0-9+.-]*://([^/?#]+)', 1) AS host,
               regexp_extract(raw_url,
                 '^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*(.*)$', 1) AS path
        FROM u
    """,
    "q_sitemap_extract": """
        WITH s AS (
          SELECT p_partkey,
                 'https://host' || CAST(p_partkey % 7 AS VARCHAR)
                 || '.example/item/' || CAST(p_partkey AS VARCHAR) AS base
          FROM part),
        x AS (
          SELECT p_partkey,
                 '<urlset><url><loc>' || base || '.html</loc></url><url><loc>'
                 || base || '.html?page=2</loc></url><url><loc>'
                 || base || '.html#frag</loc></url></urlset>' AS xml
          FROM s)
        SELECT p_partkey,
               url,
               split_part(split_part(url, '#', 1), '.html', 1) AS canon_url,
               regexp_extract(url,
                 '^[a-zA-Z][a-zA-Z0-9+.-]*://([^/?#]+)', 1) AS host
        FROM (SELECT p_partkey,
                     unnest(regexp_extract_all(xml, '<loc>([^<]*)</loc>', 1))
                       AS url
              FROM x)
    """,
    "q_robots_gate": """
        WITH u AS (
          SELECT p_partkey,
                 p_partkey % 7 AS hid,
                 CASE WHEN p_size % 3 = 0 THEN '/private/'
                      WHEN p_size % 3 = 1 THEN '/listing/'
                      ELSE '/item/' END
                 || CAST(p_partkey AS VARCHAR) || '.html' AS path
          FROM part),
        r AS (
          SELECT hid,
                 CASE WHEN hid % 2 = 0 THEN '/private/'
                      ELSE '/listing/' END AS rule
          FROM (SELECT UNNEST(range(5)) AS hid))
        SELECT p_partkey,
               'https://host' || CAST(u.hid AS VARCHAR) || '.example'
               || u.path AS url,
               'host' || CAST(u.hid AS VARCHAR) || '.example' AS host,
               COALESCE(r.rule, '') <> ''
               AND starts_with(u.path, r.rule) AS blocked
        FROM u LEFT JOIN r ON u.hid = r.hid
    """,
    "q_url_canon_full": r"""
        WITH u AS (
          SELECT p_partkey,
                 CASE WHEN p_size % 5 = 0 THEN 'HTTP://' ELSE 'https://' END
                 || CASE WHEN p_partkey % 2 = 0 THEN 'Host' ELSE 'host' END
                 || CAST(p_partkey % 7 AS VARCHAR) || '.Example'
                 || CASE WHEN p_size % 5 = 0 THEN ':80'
                         WHEN p_size % 5 = 1 THEN ':443'
                         WHEN p_size % 5 = 2 THEN ':8080' ELSE '' END
                 || '/item/' || CAST(p_partkey AS VARCHAR)
                 || CASE WHEN p_size % 5 = 3 THEN '?z=9&a=1'
                         WHEN p_size % 5 = 4 THEN '?a=1&z=9' ELSE '' END
                 || CASE WHEN p_partkey % 3 = 0 THEN '#frag' ELSE '' END AS raw_url
          FROM part),
        p AS (
          SELECT p_partkey, raw_url,
                 lower(regexp_extract(raw_url,
                   '^([a-zA-Z][a-zA-Z0-9+.-]*)://', 1)) AS scheme,
                 lower(regexp_extract(regexp_extract(raw_url,
                   '^[a-zA-Z][a-zA-Z0-9+.-]*://([^/?#]*)', 1),
                   '([^@]*)$', 1)) AS hostport,
                 regexp_extract(raw_url,
                   '^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*([^?#]*)', 1) AS path,
                 regexp_extract(split_part(raw_url, '#', 1), '\?(.*)$', 1) AS query
          FROM u),
        n AS (
          SELECT p_partkey, raw_url, scheme, path,
                 CASE WHEN hostport LIKE '[%'
                      THEN regexp_extract(hostport, '^(\[[^\]]*\])', 1)
                      WHEN contains(hostport, ':')
                      THEN split_part(hostport, ':', 1) ELSE hostport END AS host,
                 -- last-colon extraction, matching the library's
                 -- substring_index(hostport, ':', -1): on a malformed
                 -- multi-colon authority both engines now take the text
                 -- after the FINAL ':' (split_part(..., 2) took the
                 -- second field -- r3 ADVICE divergence)
                 CASE WHEN hostport LIKE '[%'
                      THEN regexp_extract(hostport, '\]:(.*)$', 1)
                      WHEN contains(hostport, ':')
                      THEN regexp_extract(hostport, ':([^:]*)$', 1)
                      ELSE '' END AS port,
                 array_to_string(list_sort(string_split(query, '&')), '&') AS qsorted
          FROM p)
        SELECT p_partkey, raw_url,
               CASE WHEN scheme = '' THEN raw_url ELSE
               scheme || '://' || host
               || CASE WHEN port <> ''
                        AND NOT ((scheme = 'http' AND port = '80')
                                 OR (scheme = 'https' AND port = '443'))
                       THEN ':' || port ELSE '' END
               || path
               || CASE WHEN qsorted <> '' THEN '?' || qsorted ELSE '' END
               END AS canon_url
        FROM n
    """,
    "q_robots_rfc_gate": r"""
        WITH cand AS (
          SELECT p_partkey,
                 'h' || CAST(p_partkey % 4 AS VARCHAR) || '.example' AS host,
                 CASE p_size % 6
                   WHEN 0 THEN '/private/doc' || CAST(p_partkey AS VARCHAR) || '.pdf'
                   WHEN 1 THEN '/private/public/page' || CAST(p_partkey AS VARCHAR)
                   WHEN 2 THEN '/files/a' || CAST(p_partkey % 7 AS VARCHAR) || '/b'
                   WHEN 3 THEN '/item/' || CAST(p_partkey AS VARCHAR) || '.html'
                   WHEN 4 THEN '/public/x' || CAST(p_partkey AS VARCHAR)
                   ELSE '/tie/a' || CAST(p_partkey AS VARCHAR)
                 END AS path
          FROM part),
        rules(host, rule_type, pattern) AS (VALUES
          ('h0.example', 'disallow', '/private/'),
          ('h0.example', 'allow', '/private/public/'),
          ('h0.example', 'disallow', '/*.pdf$'),
          ('h1.example', 'disallow', '/files/*/b$'),
          ('h1.example', 'disallow', '/*.pdf$'),
          ('h1.example', 'disallow', '/item/'),
          ('h2.example', 'allow', '/tie/a'),
          ('h2.example', 'disallow', '/tie/a'),
          ('h2.example', 'disallow', '/public/')),
        rx AS (
          SELECT host,
                 CAST(length(pattern) AS BIGINT) AS mlen,
                 CASE WHEN rule_type = 'allow' THEN 1 ELSE 0 END AS is_allow,
                 '^' || replace(regexp_replace(
                          CASE WHEN pattern LIKE '%$'
                               THEN substr(pattern, 1, length(pattern) - 1)
                               ELSE pattern END,
                          '([^A-Za-z0-9/*])', '\\\1', 'g'), '*', '.*')
                     || CASE WHEN pattern LIKE '%$' THEN '$' ELSE '' END AS rxp
          FROM rules),
        m AS (
          SELECT c.p_partkey,
                 max(struct_pack(mlen := r.mlen, is_allow := r.is_allow)) AS w
          FROM cand c
          JOIN rx r ON c.host = r.host AND regexp_matches(c.path, r.rxp)
          GROUP BY c.p_partkey)
        SELECT c.p_partkey, c.host, c.path,
               COALESCE(m.w.is_allow = 1, TRUE) AS allowed,
               COALESCE(m.w.mlen, 0) AS match_len
        FROM cand c LEFT JOIN m ON c.p_partkey = m.p_partkey
    """,
    "q_rollup": """
        SELECT event_type, user_bucket,
               CAST(GROUPING(event_type) AS INTEGER) AS g_type,
               CAST(GROUPING(user_bucket) AS INTEGER) AS g_bucket,
               CAST(sum(cents) AS BIGINT) AS sum_cents, count(*) AS n
        FROM (SELECT event_type,
                     CAST(user_id % 10 AS BIGINT) AS user_bucket,
                     CAST(round(value * 100) AS BIGINT) AS cents
              FROM events)
        GROUP BY ROLLUP(event_type, user_bucket)
    """,
    "q_semi_join": """
        SELECT c_custkey, c_name, c_nationkey FROM customer c
        WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    """,
    "q_lag_delta": """
        SELECT user_id, event_id,
               CAST(epoch_ms(ts) - lag(epoch_ms(ts)) OVER (
                      PARTITION BY user_id ORDER BY ts, event_id)
                    AS BIGINT) AS gap_ms
        FROM events
    """,
    "q_histogram": """
        SELECT bin, count(*) AS n, CAST(sum(c) AS BIGINT) AS sum_cents,
               CAST(bin * 25 AS DOUBLE) AS lo
        FROM (SELECT CAST(least(floor(value / 25.0), 19) AS BIGINT) AS bin,
                     CAST(round(value * 100) AS BIGINT) AS c
              FROM events)
        GROUP BY bin
    """,
    "q_corpus_filter": r"""
        WITH s AS (
          SELECT doc_id,
                 cast(len(string_split_regex(trim(text), '\s+')) AS BIGINT) AS n_tokens,
                 cast(len(regexp_extract_all(text, '\b(the|and|of|to|in|a)\b'))
                      AS BIGINT) AS n_stopwords,
                 cast(length(regexp_replace(text, '[^.,;:!?]', '', 'g')) AS BIGINT)
                      AS n_punct,
                 greatest(cast(length(text) AS DOUBLE), 1.0) AS chars,
                 cast(len(regexp_extract_all(lower(text), '\b(the|and|of|to|in|a)\b'))
                      AS BIGINT) AS s_en,
                 cast(len(regexp_extract_all(lower(text), '\b(der|die|das|und|ist)\b'))
                      AS BIGINT) AS s_de,
                 cast(len(regexp_extract_all(lower(text), '\b(le|la|les|et|est)\b'))
                      AS BIGINT) AS s_fr,
                 cast(len(regexp_extract_all(lower(text), '\b(el|los|las|y|es)\b'))
                      AS BIGINT) AS s_es
          FROM documents),
        q AS (
          SELECT doc_id, n_tokens,
                 cast(floor(5000 * least(n_tokens, 128) / 128) AS BIGINT)
               + least(cast(floor(24000 * n_stopwords / greatest(n_tokens, 1))
                            AS BIGINT), 3000)
               + 2000 - least(cast(floor(40000 * n_punct / chars) AS BIGINT), 2000)
                 AS quality_bp,
                 CASE WHEN greatest(s_en, s_de, s_fr, s_es) = 0 THEN 'und'
                      WHEN s_en = greatest(s_en, s_de, s_fr, s_es) THEN 'en'
                      WHEN s_de = greatest(s_en, s_de, s_fr, s_es) THEN 'de'
                      WHEN s_fr = greatest(s_en, s_de, s_fr, s_es) THEN 'fr'
                      ELSE 'es' END AS pred_lang
          FROM s),
        r AS (
          SELECT doc_id, n_tokens, quality_bp, pred_lang,
                 CASE WHEN n_tokens < 8 THEN 'too_short'
                      WHEN quality_bp < 5500 THEN 'low_quality'
                      WHEN pred_lang = 'und' THEN 'no_language'
                      ELSE 'kept' END AS reason
          FROM q)
        SELECT doc_id, n_tokens, quality_bp, pred_lang, reason,
               reason = 'kept' AS kept
        FROM r
    """,
    # span dedup: DuckDB keeps first occurrence via a window (oracle
    # need not scale); Spark uses the combinable min(struct) keeper —
    # same first-(doc_id,pos) semantics
    "q_chunk_dedup": r"""
        WITH d AS (
          SELECT doc_id,
                 string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')),
                              ' ') AS toks
          FROM documents),
        u AS (
          SELECT doc_id, i AS pos,
                 array_to_string(toks[(i*3+1):(i*3+3)], ' ') AS chunk
          FROM d, unnest(generate_series(0,
                   CAST(ceil(len(toks) / 3.0) AS BIGINT) - 1)) AS g(i)),
        k AS (
          SELECT doc_id, pos, chunk,
                 row_number() OVER (PARTITION BY chunk
                                    ORDER BY doc_id, pos) = 1 AS is_kept
          FROM u)
        SELECT doc_id,
               CAST(count(*) AS BIGINT) AS n_chunks,
               CAST(sum(CASE WHEN is_kept THEN 0 ELSE 1 END) AS BIGINT)
                 AS n_removed,
               coalesce(array_to_string(list(chunk ORDER BY pos)
                        FILTER (WHERE is_kept), ' '), '') AS text_clean
        FROM k GROUP BY doc_id
    """,
    "q_boilerplate": """
        WITH p AS (
          SELECT 'h' || CAST(o_custkey % 40 AS VARCHAR) AS host,
                 o_orderkey AS page_id,
                 'menu home products contact' || chr(10) ||
                 'welcome to h' || CAST(o_custkey % 40 AS VARCHAR) || chr(10) ||
                 'item ' || CAST(o_orderkey AS VARCHAR) || ' '
                         || o_orderpriority || chr(10) ||
                 'total ' || CAST(CAST(round(o_totalprice * 100) AS BIGINT)
                                  AS VARCHAR) || chr(10) ||
                 'copyright h' || CAST(o_custkey % 40 AS VARCHAR) AS text
          FROM orders),
        l AS (
          SELECT DISTINCT host, page_id, line FROM
            (SELECT host, page_id, unnest(string_split(text, chr(10))) AS line
             FROM p)
          WHERE trim(line) <> ''),
        df AS (SELECT host, line, count(*) AS df FROM l GROUP BY 1, 2),
        np AS (SELECT host, count(DISTINCT page_id) AS n_pages FROM p GROUP BY 1)
        SELECT df.host, df.line, CAST(df.df AS BIGINT) AS df,
               CAST(np.n_pages AS BIGINT) AS n_pages
        FROM df JOIN np ON df.host = np.host
        WHERE df.df * 5 >= np.n_pages * 4
    """,
    "q_pii_scrub": r"""
        WITH d AS (
          SELECT p_partkey AS doc_id,
                 p_name || ' contact user' || CAST(p_partkey AS VARCHAR)
                 || '@mail' || CAST(p_partkey % 7 AS VARCHAR) || '.com '
                 || CASE WHEN p_partkey % 3 = 0 THEN
                      'tel +' || CAST(p_partkey % 90 + 1 AS VARCHAR) || '-'
                      || lpad(CAST(p_partkey % 1000 AS VARCHAR), 3, '0') || '-'
                      || lpad(CAST(p_partkey % 10000 AS VARCHAR), 4, '0')
                    ELSE 'no phone' END AS text
          FROM part)
        SELECT doc_id,
               CAST(len(regexp_extract_all(text,
                 '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}'))
                 AS BIGINT) AS n_emails,
               CAST(len(regexp_extract_all(text,
                 '\+[0-9]{1,2}-[0-9]{3}-[0-9]{4}')) AS BIGINT) AS n_phones,
               regexp_replace(regexp_replace(text,
                 '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}',
                 '<EMAIL>', 'g'),
                 '\+[0-9]{1,2}-[0-9]{3}-[0-9]{4}', '<PHONE>', 'g') AS clean
        FROM d
    """,
    "q_source_quality": r"""
        WITH s AS (
          SELECT doc_id, source,
                 cast(len(string_split_regex(trim(text), '\s+')) AS BIGINT)
                   AS n_tokens,
                 cast(len(regexp_extract_all(text, '\b(the|and|of|to|in|a)\b'))
                      AS BIGINT) AS n_stopwords,
                 cast(length(regexp_replace(text, '[^.,;:!?]', '', 'g'))
                      AS BIGINT) AS n_punct,
                 greatest(cast(length(text) AS DOUBLE), 1.0) AS chars
          FROM documents),
        q AS (
          SELECT doc_id, source,
                 cast(floor(5000 * least(n_tokens, 128) / 128) AS BIGINT)
               + least(cast(floor(24000 * n_stopwords / greatest(n_tokens, 1))
                            AS BIGINT), 3000)
               + 2000 - least(cast(floor(40000 * n_punct / chars) AS BIGINT),
                              2000) AS quality_bp
          FROM s),
        m AS (
          SELECT source,
                 CAST(sum(quality_bp) // count(*) AS BIGINT) AS src_mean_bp
          FROM q GROUP BY source)
        SELECT q.doc_id, q.source, q.quality_bp, m.src_mean_bp,
               q.quality_bp * 2 >= m.src_mean_bp AS kept
        FROM q JOIN m ON q.source = m.source
    """,
    "q_trap_detect": """
        WITH u AS (
          SELECT 'h' || CAST(o_custkey % 40 AS VARCHAR) AS host,
                 '/' || array_to_string(list_transform(
                   generate_series(1, CASE WHEN o_custkey % 40 < 10
                                      THEN CAST(o_orderkey % 4 + 1 AS BIGINT)
                                      ELSE 1 END),
                   x -> 's' || CAST(o_orderkey % 5 AS VARCHAR)), '/') AS path
          FROM orders),
        s AS (
          SELECT host, path,
                 len(list_filter(string_split(path, '/'), x -> x <> ''))
                   AS depth,
                 len(list_filter(
                       list_distinct(list_filter(string_split(path, '/'),
                                                 x -> x <> '')),
                       d -> len(list_filter(
                              list_filter(string_split(path, '/'),
                                          x -> x <> ''),
                              s -> s = d)) >= 3)) > 0 AS is_loop
          FROM u)
        SELECT host, CAST(count(*) AS BIGINT) AS n_urls,
               CAST(sum(CASE WHEN is_loop THEN 1 ELSE 0 END) AS BIGINT)
                 AS n_loop,
               CAST(max(depth) AS BIGINT) AS max_depth,
               CAST(count(DISTINCT path) AS BIGINT) AS n_paths,
               (sum(CASE WHEN is_loop THEN 1 ELSE 0 END) * 10
                  >= count(*) * 3)
                 OR max(depth) >= 12 AS is_trap
        FROM s GROUP BY host
    """,
    "q_mirror_hosts": f"""
        WITH d AS (SELECT source, string_split({_NORM}, ' ') AS t
                   FROM documents),
        g AS (
          SELECT source,
                 unnest(list_distinct(list_transform(
                   generate_series(1, len(t) - 6),
                   i -> array_to_string(t[i:i+6], ' ')))) AS gram
          FROM d),
        gs AS (SELECT DISTINCT source, {_md5i('gram')} AS gh FROM g),
        ok AS (SELECT gh FROM gs GROUP BY gh
               HAVING count(*) BETWEEN 2 AND 64),
        cp AS (SELECT gs.source, gs.gh FROM gs JOIN ok USING (gh)),
        p AS (
          SELECT a.source AS source_a, b.source AS source_b,
                 CAST(count(*) AS BIGINT) AS shared_grams
          FROM cp a JOIN cp b USING (gh)
          WHERE a.source < b.source
          GROUP BY 1, 2 HAVING count(*) >= 20),
        tot AS (SELECT source, count(*) AS n_grams FROM gs GROUP BY source)
        SELECT p.source_a, p.source_b, p.shared_grams,
               CAST(10000 * p.shared_grams // least(ta.n_grams, tb.n_grams)
                    AS BIGINT) AS containment_bp
        FROM p
        JOIN tot ta ON p.source_a = ta.source
        JOIN tot tb ON p.source_b = tb.source
    """,
    "q_inverted_index": f"""
        WITH d AS (
          SELECT doc_id, list_distinct(string_split({_NORM}, ' ')) AS ts
          FROM documents),
        t AS (
          SELECT doc_id, term FROM
            (SELECT doc_id, unnest(ts) AS term FROM d)
          WHERE term <> ''),
        c AS (SELECT term, count(*) AS df FROM t GROUP BY term),
        r AS (
          SELECT term, doc_id,
                 row_number() OVER (PARTITION BY term ORDER BY doc_id) AS rn
          FROM t),
        p AS (
          SELECT term,
                 array_to_string(list(doc_id ORDER BY doc_id), ',') AS postings
          FROM r WHERE rn <= 20 GROUP BY term)
        SELECT c.term, CAST(c.df AS BIGINT) AS df, p.postings
        FROM c JOIN p ON c.term = p.term
        WHERE c.df >= 2
    """,
    "q_weighted_sample": r"""
        WITH s AS (
          SELECT doc_id, source,
                 cast(len(string_split_regex(trim(text), '\s+')) AS BIGINT)
                   AS n_tokens,
                 cast(len(regexp_extract_all(text, '\b(the|and|of|to|in|a)\b'))
                      AS BIGINT) AS n_stopwords,
                 cast(length(regexp_replace(text, '[^.,;:!?]', '', 'g'))
                      AS BIGINT) AS n_punct,
                 greatest(cast(length(text) AS DOUBLE), 1.0) AS chars
          FROM documents),
        q AS (
          SELECT doc_id, source,
                 cast(floor(5000 * least(n_tokens, 128) / 128) AS BIGINT)
               + least(cast(floor(24000 * n_stopwords / greatest(n_tokens, 1))
                            AS BIGINT), 3000)
               + 2000 - least(cast(floor(40000 * n_punct / chars) AS BIGINT),
                              2000) AS quality_bp
          FROM s),
        k AS (
          SELECT doc_id, source, quality_bp,
                 CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15)
                      AS BIGINT) // greatest(quality_bp, 1) AS samp_key
          FROM q),
        r AS (
          SELECT doc_id, source, quality_bp, samp_key,
                 CAST(row_number() OVER (PARTITION BY source
                     ORDER BY samp_key ASC, doc_id ASC) AS BIGINT) AS rank
          FROM k)
        SELECT doc_id, source, quality_bp, samp_key, rank
        FROM r WHERE rank <= 5
    """,
    "q_outlink_extract": """
        WITH h AS (
          SELECT p_partkey AS doc_id,
                 '<html><body><a href="https://h'
                 || CAST(p_partkey % 30 AS VARCHAR) || '.example/p/'
                 || CAST(p_partkey AS VARCHAR)
                 || '.html#frag">x</a> <a href="https://h'
                 || CAST((p_partkey + 1) % 30 AS VARCHAR) || '.example/q?page='
                 || CAST(p_partkey % 5 AS VARCHAR)
                 || '">y</a> <a href="https://h'
                 || CAST(p_partkey % 30 AS VARCHAR) || '.example/p/'
                 || CAST(p_partkey AS VARCHAR)
                 || '.html">dup</a></body></html>' AS html
          FROM part),
        l AS (
          SELECT doc_id,
                 unnest(regexp_extract_all(html, '<a href="([^"]+)"', 1)) AS href
          FROM h),
        c AS (
          SELECT DISTINCT doc_id,
                 split_part(split_part(href, '#', 1), '.html', 1) AS canon_url
          FROM l)
        SELECT doc_id, canon_url,
               regexp_extract(canon_url,
                 '^[a-zA-Z][a-zA-Z0-9+.-]*://([^/?#]+)', 1) AS host
        FROM c
    """,
    "q_decontaminate": f"""
        WITH d AS (SELECT doc_id, string_split({_NORM}, ' ') AS t
                   FROM documents),
        g AS (
          SELECT doc_id,
                 list_distinct(list_transform(
                   generate_series(1, len(t) - 4),
                   i -> array_to_string(t[i:i+4], ' '))) AS grams
          FROM d),
        e AS (SELECT DISTINCT {_md5i("unnest(grams)")} AS gh
              FROM g WHERE doc_id % 50 = 0),
        c AS (SELECT doc_id, {_md5i("unnest(grams)")} AS gh
              FROM g WHERE doc_id % 50 <> 0),
        h AS (SELECT c.doc_id, count(*) AS n_overlap
              FROM c JOIN e USING (gh) GROUP BY c.doc_id)
        SELECT corp.doc_id,
               CAST(coalesce(h.n_overlap, 0) AS BIGINT) AS n_overlap,
               coalesce(h.n_overlap, 0) >= 3 AS contaminated
        FROM (SELECT doc_id FROM documents WHERE doc_id % 50 <> 0) corp
        LEFT JOIN h ON corp.doc_id = h.doc_id
    """,
    "q_domain_cap": r"""
        WITH s AS (
          SELECT doc_id, source,
                 cast(len(string_split_regex(trim(text), '\s+')) AS BIGINT)
                   AS n_tokens,
                 cast(len(regexp_extract_all(text, '\b(the|and|of|to|in|a)\b'))
                      AS BIGINT) AS n_stopwords,
                 cast(length(regexp_replace(text, '[^.,;:!?]', '', 'g'))
                      AS BIGINT) AS n_punct,
                 greatest(cast(length(text) AS DOUBLE), 1.0) AS chars
          FROM documents),
        q AS (
          SELECT doc_id, source,
                 cast(floor(5000 * least(n_tokens, 128) / 128) AS BIGINT)
               + least(cast(floor(24000 * n_stopwords / greatest(n_tokens, 1))
                            AS BIGINT), 3000)
               + 2000 - least(cast(floor(40000 * n_punct / chars) AS BIGINT),
                              2000) AS quality_bp
          FROM s),
        r AS (
          SELECT doc_id, source, quality_bp,
                 CAST(row_number() OVER (PARTITION BY source
                     ORDER BY quality_bp DESC, doc_id ASC) AS BIGINT) AS rank
          FROM q)
        SELECT doc_id, source, quality_bp, rank FROM r WHERE rank <= 10
    """,
    "q_recrawl_schedule": """
        WITH h AS (
          SELECT user_id AS url_id, epoch_ms(ts) AS ms, value AS v,
                 lag(value) OVER (PARTITION BY user_id
                                  ORDER BY ts, event_id) AS prev_v
          FROM events),
        a AS (
          SELECT url_id, count(*) AS n_fetches,
                 sum(CASE WHEN prev_v IS NOT NULL AND v <> prev_v
                     THEN 1 ELSE 0 END) AS n_changes,
                 max(ms) - min(ms) AS span_ms, max(ms) AS last_ms
          FROM h GROUP BY url_id),
        i AS (
          SELECT url_id, n_fetches, n_changes, span_ms, last_ms,
                 least(greatest(span_ms // greatest(n_changes, 1), 3600000),
                       604800000) AS interval_ms
          FROM a)
        SELECT url_id, CAST(n_fetches AS BIGINT) AS n_fetches,
               CAST(n_changes AS BIGINT) AS n_changes,
               CAST(span_ms AS BIGINT) AS span_ms,
               CAST(interval_ms AS BIGINT) AS interval_ms,
               CAST(last_ms + interval_ms AS BIGINT) AS next_fetch_ms
        FROM i
    """,
    "q_crawl_round": """
        WITH ranked AS (
          SELECT o_custkey, o_orderkey,
                 cast(substr(o_orderpriority, 1, 1) AS BIGINT) AS pri,
                 row_number() OVER (PARTITION BY o_custkey
                     ORDER BY cast(substr(o_orderpriority, 1, 1) AS BIGINT),
                              o_orderdate, o_orderkey) AS rn
          FROM orders),
        dispatch AS (SELECT * FROM ranked WHERE rn <= 2),
        fetched AS (
          SELECT d.o_custkey, d.o_orderkey, d.pri, count(l.l_orderkey) AS n_items
          FROM dispatch d LEFT JOIN lineitem l ON l.l_orderkey = d.o_orderkey
          GROUP BY d.o_custkey, d.o_orderkey, d.pri)
        SELECT o_custkey, o_orderkey, pri, n_items,
               cast(row_number() OVER (ORDER BY pri, o_orderkey) AS BIGINT) AS seq
        FROM fetched
    """,
    "q_dedup_exact": f"""
        SELECT md5({_NORM}) AS fp, count(*) AS n_dups, min(doc_id) AS keeper
        FROM documents GROUP BY 1
    """,
    "q_fingerprint": f"SELECT doc_id, md5({_NORM}) AS fp FROM documents",
    "q_token_count": r"""
        SELECT doc_id,
               cast(len(string_split_regex(trim(text), '\s+')) AS BIGINT) AS n_tokens,
               cast(len(regexp_extract_all(text, '[A-Za-z]{1,4}|[0-9]|[^A-Za-z0-9\s]'))
                    AS BIGINT) AS n_bpe_tokens
        FROM documents
    """,
    "q_quality_score": r"""
        WITH s AS (
          SELECT doc_id,
                 cast(len(string_split_regex(trim(text), '\s+')) AS BIGINT) AS n_tokens,
                 cast(len(regexp_extract_all(text, '\b(the|and|of|to|in|a)\b'))
                      AS BIGINT) AS n_stopwords,
                 cast(length(regexp_replace(text, '[^.,;:!?]', '', 'g')) AS BIGINT)
                      AS n_punct,
                 greatest(cast(length(text) AS DOUBLE), 1.0) AS chars
          FROM documents)
        SELECT doc_id, n_tokens, n_stopwords, n_punct,
               cast(floor(5000 * least(n_tokens, 128) / 128) AS BIGINT)
             + least(cast(floor(24000 * n_stopwords / greatest(n_tokens, 1)) AS BIGINT),
                     3000)
             + 2000 - least(cast(floor(40000 * n_punct / chars) AS BIGINT), 2000)
               AS quality_bp
        FROM s
    """,
    "q_lang_id": r"""
        WITH s AS (
          SELECT doc_id,
                 cast(len(regexp_extract_all(lower(text), '\b(the|and|of|to|in|a)\b'))
                      AS BIGINT) AS s_en,
                 cast(len(regexp_extract_all(lower(text), '\b(der|die|das|und|ist)\b'))
                      AS BIGINT) AS s_de,
                 cast(len(regexp_extract_all(lower(text), '\b(le|la|les|et|est)\b'))
                      AS BIGINT) AS s_fr,
                 cast(len(regexp_extract_all(lower(text), '\b(el|los|las|y|es)\b'))
                      AS BIGINT) AS s_es
          FROM documents)
        SELECT doc_id, s_en, s_de, s_fr, s_es,
               CASE WHEN greatest(s_en, s_de, s_fr, s_es) = 0 THEN 'und'
                    WHEN s_en = greatest(s_en, s_de, s_fr, s_es) THEN 'en'
                    WHEN s_de = greatest(s_en, s_de, s_fr, s_es) THEN 'de'
                    WHEN s_fr = greatest(s_en, s_de, s_fr, s_es) THEN 'fr'
                    ELSE 'es' END AS pred_lang
        FROM s
    """,
    "q_shingle_stats": f"""
        SELECT doc_id, cast(len({_SHINGLES}) AS BIGINT) AS n_shingles
        FROM (SELECT doc_id, {_NORM} AS norm FROM documents)
    """,
    "q_ngram_jaccard": f"""
        WITH docs AS (SELECT doc_id, {_NORM} AS norm FROM documents),
        sh AS (SELECT doc_id, unnest({_SHINGLES}) AS g FROM docs),
        sizes AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id),
        pairs AS (
          SELECT x.doc_id AS a, y.doc_id AS b, count(*) AS inter
          FROM sh x JOIN sh y ON x.g = y.g AND x.doc_id < y.doc_id
          GROUP BY 1, 2),
        j AS (
          SELECT a, b,
                 round(cast(inter AS DOUBLE)
                       / cast(sa.n_sh + sb.n_sh - inter AS DOUBLE), 4) AS jaccard
          FROM pairs
          JOIN sizes sa ON sa.doc_id = a
          JOIN sizes sb ON sb.doc_id = b)
        SELECT a, b, jaccard FROM j WHERE jaccard >= 0.4
    """,
    "q_percentiles": """
        SELECT event_type,
               round(quantile_cont(c, 0.5), 4) AS p50,
               round(quantile_cont(c, 0.95), 4) AS p95,
               count(*) AS n
        FROM (SELECT event_type, CAST(round(value * 100) AS BIGINT) AS c
              FROM events)
        GROUP BY 1
    """,
    "q_heavy_hitters": f"""
        SELECT term, n, rn FROM (
          SELECT term, count(*) AS n,
                 CAST(row_number() OVER (ORDER BY count(*) DESC, term)
                      AS BIGINT) AS rn
          FROM (SELECT unnest(string_split({_NORM}, ' ')) AS term FROM documents)
          WHERE term <> '' GROUP BY term)
        WHERE rn <= 20
    """,
    "q_bigram_topk": f"""
        WITH t AS (SELECT string_split({_NORM}, ' ') AS l FROM documents),
        b AS (SELECT unnest(list_transform(
                generate_series(1, greatest(len(l) - 1, 0)),
                i -> l[i] || ' ' || l[i + 1])) AS bigram FROM t)
        SELECT bigram, n, rn FROM (
          SELECT bigram, count(*) AS n,
                 CAST(row_number() OVER (ORDER BY count(*) DESC, bigram)
                      AS BIGINT) AS rn
          FROM b GROUP BY bigram)
        WHERE rn <= 20
    """,
    "q_repetition_ratio": f"""
        WITH t AS (SELECT doc_id, string_split({_NORM}, ' ') AS l FROM documents),
        s AS (SELECT doc_id,
                     CAST(len(l) AS BIGINT) AS n_tokens,
                     CAST((1000 * (len(l) - len(list_distinct(l)))) // len(l)
                          AS BIGINT) AS dup_token_per_mille
              FROM t),
        b AS (SELECT doc_id, unnest(list_transform(
                generate_series(1, greatest(len(l) - 1, 0)),
                i -> l[i] || ' ' || l[i + 1])) AS bigram FROM t),
        c AS (SELECT doc_id, bigram, count(*) AS n FROM b GROUP BY 1, 2),
        a AS (SELECT doc_id, max(n) AS top_bigram_n, sum(n) AS n_bigrams
              FROM c GROUP BY doc_id)
        SELECT s.doc_id, s.n_tokens, s.dup_token_per_mille,
               CAST(coalesce(a.top_bigram_n, 0) AS BIGINT) AS top_bigram_n,
               CAST(coalesce((1000 * a.top_bigram_n) // a.n_bigrams, 0)
                    AS BIGINT) AS top_bigram_per_mille
        FROM s LEFT JOIN a USING (doc_id)
    """,
    "q_lm_score": f"""
        WITH t2 AS (
          SELECT doc_id, term FROM (
            SELECT doc_id, unnest(string_split({_NORM}, ' ')) AS term
            FROM documents)
          WHERE term <> ''),
        c AS (SELECT term, count(*) AS n FROM t2 GROUP BY term),
        tot AS (SELECT count(*) AS total FROM t2)
        SELECT doc_id,
               round(avg(ln(n / (SELECT CAST(total AS DOUBLE) FROM tot))), 4)
                 AS lm_score,
               CAST(count(*) AS BIGINT) AS n_tok
        FROM t2 JOIN c USING (term)
        GROUP BY doc_id
    """,
    "q_substring_dedup": f"""
        WITH d AS (SELECT doc_id, string_split({_NORM}, ' ') AS t
                   FROM documents),
        g AS (SELECT doc_id, i AS pos,
                     {_md5i("array_to_string(t[i:i+9], ' ')")} AS gh
              FROM d, LATERAL unnest(generate_series(1, len(t) - 9)) AS u(i)),
        c AS (SELECT gh FROM g GROUP BY gh HAVING count(*) >= 2),
        o AS (SELECT g.doc_id, g.pos FROM g JOIN c USING (gh)),
        cov AS (
          SELECT doc_id,
                 count(DISTINCT pos) AS n_dup_grams,
                 count(DISTINCT ti) AS dup_cover_tokens
          FROM (SELECT doc_id, pos,
                       unnest(generate_series(pos, pos + 9)) AS ti
                FROM o)
          GROUP BY doc_id)
        SELECT d.doc_id,
               CAST(len(d.t) AS BIGINT) AS n_tokens,
               CAST(coalesce(cov.n_dup_grams, 0) AS BIGINT) AS n_dup_grams,
               CAST(coalesce(cov.dup_cover_tokens, 0) AS BIGINT)
                 AS dup_cover_tokens,
               CAST(1000 * coalesce(cov.dup_cover_tokens, 0)
                    // greatest(len(d.t), 1) AS BIGINT) AS dup_permille
        FROM d LEFT JOIN cov USING (doc_id)
    """,
    "q_tfidf_topk": f"""
        WITH tok AS (
          SELECT doc_id, unnest(string_split({_NORM}, ' ')) AS term FROM documents),
        t2 AS (SELECT doc_id, term FROM tok WHERE term <> ''),
        tf AS (SELECT doc_id, term, count(*) AS tf FROM t2 GROUP BY 1, 2),
        dfreq AS (SELECT term, count(DISTINCT doc_id) AS dfr FROM t2 GROUP BY 1),
        n AS (SELECT count(*) AS n_docs FROM documents),
        scored AS (
          SELECT doc_id, term,
                 round(tf * (ln((n_docs + 1.0) / (dfr + 1.0)) + 1.0), 4) AS score
          FROM tf JOIN dfreq USING (term) CROSS JOIN n)
        SELECT doc_id, term, score, rn FROM (
          SELECT doc_id, term, score,
                 CAST(row_number() OVER (
                     PARTITION BY doc_id ORDER BY score DESC, term
                 ) AS BIGINT) AS rn
          FROM scored)
        WHERE rn <= 3
    """,
    "q_train_split": f"""
        SELECT doc_id,
               {_md5i("CAST(doc_id AS VARCHAR)")} % 100 AS bucket,
               CASE WHEN {_md5i("CAST(doc_id AS VARCHAR)")} % 100 < 90
                    THEN 'train' ELSE 'holdout' END AS split
        FROM documents
    """,
    "q_stratified_sample": f"""
        SELECT doc_id, lang, rn FROM (
          SELECT doc_id, lang,
                 CAST(row_number() OVER (
                     PARTITION BY lang
                     ORDER BY {_md5i("CAST(doc_id AS VARCHAR)")}, doc_id
                 ) AS BIGINT) AS rn
          FROM documents)
        WHERE rn <= 5
    """,
    # same pair derivation as q_ngram_jaccard, then transitive closure
    # (UNION-deduped recursive CTE) and min-reachable-id per node — the
    # declarative mirror of the Spark side's min-label propagation
    "q_dup_clusters": f"""
        {_DUP_CC_CTE}
        SELECT n AS doc_id, min(m) AS cluster_id FROM reach GROUP BY n
    """,
    # the e2e composition: same closure, then one keeper per component
    # (min doc_id = component label) with its member count
    "q_neardup_dedup": f"""
        {_DUP_CC_CTE}
        SELECT doc_id, CAST(count(*) AS BIGINT) AS n_members
        FROM (SELECT n, min(m) AS doc_id FROM reach GROUP BY n)
        GROUP BY doc_id
    """,
    # same closure, quality-based canonical per cluster: max quality,
    # min doc_id tie-break (the quality CTE mirrors q_corpus_filter's)
    "q_cluster_canonical": f"""
        {_DUP_CC_CTE},
        comp AS (SELECT n AS node, min(m) AS cluster_id FROM reach GROUP BY n),
        s AS (
          SELECT doc_id,
                 cast(len(string_split_regex(trim(text), '\\s+')) AS BIGINT)
                   AS n_tokens,
                 cast(len(regexp_extract_all(text, '\\b(the|and|of|to|in|a)\\b'))
                      AS BIGINT) AS n_stopwords,
                 cast(length(regexp_replace(text, '[^.,;:!?]', '', 'g'))
                      AS BIGINT) AS n_punct,
                 greatest(cast(length(text) AS DOUBLE), 1.0) AS chars
          FROM documents),
        qual AS (
          SELECT doc_id,
                 cast(floor(5000 * least(n_tokens, 128) / 128) AS BIGINT)
               + least(cast(floor(24000 * n_stopwords / greatest(n_tokens, 1))
                            AS BIGINT), 3000)
               + 2000 - least(cast(floor(40000 * n_punct / chars) AS BIGINT),
                              2000) AS quality_bp
          FROM s),
        ranked AS (
          SELECT comp.cluster_id, comp.node, qual.quality_bp,
                 row_number() OVER (PARTITION BY comp.cluster_id
                     ORDER BY qual.quality_bp DESC, comp.node ASC) AS rn,
                 count(*) OVER (PARTITION BY comp.cluster_id) AS n_members
          FROM comp JOIN qual ON qual.doc_id = comp.node)
        SELECT cluster_id, CAST(node AS BIGINT) AS canonical_id,
               quality_bp AS canonical_quality_bp,
               CAST(n_members AS BIGINT) AS n_members
        FROM ranked WHERE rn = 1
    """,
    "q_pagerank_hosts": _pagerank_sql(n_iter=5),
    # budget allocation: same unrolled PageRank recurrence, then the
    # integer proportional split (100k global budget, clamp [1, 500])
    "q_crawl_budget": (
        "WITH "
        + _pagerank_ctes(5)
        + """,
        pr AS (SELECT node AS host_id, rank_micros FROM r5),
        t AS (SELECT CAST(sum(rank_micros) AS BIGINT) AS total_micros FROM pr)
        SELECT pr.host_id, pr.rank_micros,
               least(greatest(100000 * pr.rank_micros // t.total_micros, 1),
                     500) AS budget
        FROM pr CROSS JOIN t
    """
    ),
    "q_authority_order": f"""
        WITH {_pagerank_ctes(5)},
        pr AS (SELECT node AS host_id, rank_micros FROM r5),
        f AS (SELECT o_custkey % 1000 AS host_id, o_orderkey AS url_id
              FROM orders)
        SELECT f.host_id, f.url_id,
               CAST(row_number() OVER (
                   ORDER BY -COALESCE(pr.rank_micros, 150000),
                            f.host_id, f.url_id
               ) AS BIGINT) AS seq
        FROM f LEFT JOIN pr USING (host_id)
    """,
    "q_distinct_urls": """
        SELECT l_suppkey % 50 AS host_id,
               CAST(COUNT(DISTINCT l_orderkey % 10000) AS BIGINT) AS n_urls
        FROM lineitem GROUP BY 1
    """,
    "q_surt_index": """
        WITH u AS (
          SELECT p_partkey AS url_id,
                 'https://www.sub' || CAST(p_partkey % 5 AS VARCHAR)
                 || '.example' || CAST(p_partkey % 3 AS VARCHAR)
                 || '.com/item/' || CAST(p_partkey AS VARCHAR) AS url
          FROM part),
        hp AS (
          SELECT url_id, url,
                 regexp_extract(url, '^[a-z]+://([^/]+)', 1) AS host,
                 regexp_extract(url, '^[a-z]+://[^/]+(/.*)$', 1) AS path
          FROM u)
        SELECT url_id, url,
               array_to_string(list_reverse(string_split(host, '.')), ',')
               || ')' || path AS surt
        FROM hp
    """,
    "q_snapshot_diff": """
        WITH old AS (
          SELECT p_partkey AS url_id, md5(p_name) AS old_fp
          FROM part WHERE p_partkey % 10 <> 0),
        new AS (
          SELECT p_partkey AS url_id,
                 md5(CASE WHEN p_partkey % 3 = 0 THEN p_name || '!'
                          ELSE p_name END) AS new_fp
          FROM part WHERE p_partkey % 7 <> 0)
        SELECT url_id,
               CASE WHEN old_fp IS NULL THEN 'added'
                    WHEN new_fp IS NULL THEN 'removed'
                    WHEN old_fp <> new_fp THEN 'changed'
                    ELSE 'unchanged' END AS change
        FROM old FULL OUTER JOIN new USING (url_id)
        WHERE (CASE WHEN old_fp IS NULL THEN 'added'
                    WHEN new_fp IS NULL THEN 'removed'
                    WHEN old_fp <> new_fp THEN 'changed'
                    ELSE 'unchanged' END) <> 'unchanged'
    """,
    # Spark regexp_replace is global by default; DuckDB needs the 'g'
    # flag — patterns themselves are backreference-free (RE2-safe)
    "q_html_strip": r"""
        WITH h AS (
          SELECT p_partkey AS doc_id,
                 '<html><head><script>var k=' || CAST(p_partkey AS VARCHAR)
                 || ';</script></head><body><h1>' || p_name
                 || '</h1><p class="c">' || p_type
                 || ' &amp; co &lt;since ' || CAST(p_size AS VARCHAR)
                 || '&gt;</p></body></html>' AS html
          FROM part),
        t AS (
          SELECT doc_id,
                 trim(regexp_replace(
                   replace(replace(replace(
                     regexp_replace(
                       regexp_replace(html,
                         '<script[^>]*>[\s\S]*?</script>', ' ', 'g'),
                       '<[^>]*>', ' ', 'g'),
                     '&lt;', '<'), '&gt;', '>'), '&amp;', '&'),
                   '\s+', ' ', 'g')) AS text
          FROM h)
        SELECT doc_id, text, CAST(length(text) AS BIGINT) AS n_chars FROM t
    """,
    "q_anchor_text": """
        WITH l AS (
          SELECT p_partkey % 500 AS target_id,
                 unnest(string_split(p_name, ' ')) AS term
          FROM part),
        c AS (SELECT target_id, term, count(*) AS cnt FROM l GROUP BY 1, 2)
        SELECT target_id, term, cnt, rank FROM (
          SELECT target_id, term, cnt,
                 CAST(row_number() OVER (
                     PARTITION BY target_id ORDER BY cnt DESC, term
                 ) AS BIGINT) AS rank
          FROM c)
        WHERE rank <= 3
    """,
    # classifies the HEX TEXT by prefix where Spark sniffs the decoded
    # BYTES with binary substring+hex — same value, different
    # representation, must agree
    "q_content_sniff": """
        WITH b AS (
          SELECT p_partkey AS file_id,
                 CASE CAST(p_partkey % 6 AS INTEGER)
                   WHEN 0 THEN '89504E470D0A1A0A'
                   WHEN 1 THEN 'FFD8FFE000104A464946'
                   WHEN 2 THEN '474946383961'
                   WHEN 3 THEN '52494646'
                        || substr(lpad(CAST(p_partkey AS VARCHAR), 16, '0'), 1, 8)
                        || '57415645'
                   WHEN 4 THEN '255044462D312E34'
                   ELSE '4445414442454546'
                 END || lpad(CAST(p_partkey AS VARCHAR), 16, '0') AS hx
          FROM part)
        SELECT file_id,
               CAST(length(hx) // 2 AS BIGINT) AS n_bytes,
               CASE
                 WHEN substr(hx, 1, 16) = '89504E470D0A1A0A' THEN 'image/png'
                 WHEN substr(hx, 1, 6) = 'FFD8FF' THEN 'image/jpeg'
                 WHEN substr(hx, 1, 12) IN ('474946383761', '474946383961')
                      THEN 'image/gif'
                 WHEN substr(hx, 1, 8) = '52494646'
                      AND substr(hx, 17, 8) = '57415645' THEN 'audio/x-wav'
                 WHEN substr(hx, 1, 10) = '255044462D' THEN 'application/pdf'
                 ELSE 'application/octet-stream'
               END AS mime
        FROM b
    """,
    # CAST(... AS DOUBLE[]): duckdb's list_cosine_similarity computes in
    # float32 on FLOAT[] inputs; Spark's aggregate() accumulates in double.
    "q_embedding_topk": """
        SELECT vec_id,
               round(list_cosine_similarity(CAST(embedding AS DOUBLE[]),
                     (SELECT CAST(embedding AS DOUBLE[]) FROM embeddings
                      WHERE vec_id = 0)), 4) AS sim
        FROM embeddings WHERE vec_id <> 0
        ORDER BY sim DESC, vec_id LIMIT 10
    """,
    "q_embedding_neardup": """
        SELECT a.vec_id AS a, b.vec_id AS b,
               round(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                            CAST(b.embedding AS DOUBLE[])), 4) AS sim
        FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
        WHERE round(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                           CAST(b.embedding AS DOUBLE[])), 4) >= 0.3
        ORDER BY a, b
    """,
    "q_knn_per_vec": """
        WITH sims AS (
          SELECT a.vec_id AS vec_id, b.vec_id AS nbr_id,
                 round(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                              CAST(b.embedding AS DOUBLE[])), 4) AS sim
          FROM embeddings a JOIN embeddings b ON a.vec_id <> b.vec_id),
        ranked AS (
          SELECT *, row_number() OVER (PARTITION BY vec_id
                                       ORDER BY sim DESC, nbr_id) AS rn
          FROM sims)
        SELECT vec_id, nbr_id, sim, cast(rn AS BIGINT) AS rank
        FROM ranked WHERE rn <= 3
    """,
    "q_minhash_neardup": f"""
        WITH docs AS (SELECT doc_id, {_NORM} AS norm FROM documents),
        sh AS (SELECT doc_id, {_SHINGLES} AS grams FROM docs),
        shl AS (
          SELECT doc_id, cast(len(grams) AS BIGINT) AS n_sh,
                 list_transform(grams, s -> {_md5i("s")}) AS hs
          FROM sh),
        sigs AS (
          SELECT doc_id,
                 CASE WHEN len(hs) = 0 THEN {_MH_MAXSIG}
                 ELSE list_transform({_MH_PARAMS}, p ->
                   CAST(list_min(list_transform(hs, h ->
                     CAST((CAST(p[1] AS HUGEINT) * h + CAST(p[2] AS HUGEINT))
                          % 2305843009213693951 AS BIGINT))) AS BIGINT))
                 END AS sig
          FROM shl),
        cand AS (
          SELECT x.doc_id AS a, y.doc_id AS b
          FROM sigs x JOIN sigs y ON x.doc_id < y.doc_id
          WHERE {_MH_BAND_EQ}),
        ex AS (SELECT doc_id, unnest(grams) AS g FROM sh),
        inter AS (
          SELECT c.a, c.b, count(*) AS inter
          FROM cand c
          JOIN ex x ON x.doc_id = c.a
          JOIN ex y ON y.doc_id = c.b AND y.g = x.g
          GROUP BY 1, 2),
        j AS (
          SELECT i.a, i.b,
                 round(cast(i.inter AS DOUBLE)
                       / cast(sa.n_sh + sb.n_sh - i.inter AS DOUBLE), 4) AS jaccard
          FROM inter i
          JOIN shl sa ON sa.doc_id = i.a
          JOIN shl sb ON sb.doc_id = i.b)
        SELECT a, b, jaccard FROM j WHERE jaccard >= 0.4
    """,
    "q_incremental_neardup": f"""
        WITH docs AS (SELECT doc_id, {_NORM} AS norm FROM documents),
        sh AS (SELECT doc_id, {_SHINGLES} AS grams FROM docs),
        shl AS (
          SELECT doc_id, cast(len(grams) AS BIGINT) AS n_sh,
                 list_transform(grams, s -> {_md5i("s")}) AS hs
          FROM sh),
        sigs AS (
          SELECT doc_id,
                 CASE WHEN len(hs) = 0 THEN {_MH_MAXSIG}
                 ELSE list_transform({_MH_PARAMS}, p ->
                   CAST(list_min(list_transform(hs, h ->
                     CAST((CAST(p[1] AS HUGEINT) * h + CAST(p[2] AS HUGEINT))
                          % 2305843009213693951 AS BIGINT))) AS BIGINT))
                 END AS sig
          FROM shl),
        cand AS (
          SELECT y.doc_id AS new_id, x.doc_id AS corpus_id
          FROM sigs x JOIN sigs y
            ON x.doc_id % 5 <> 0 AND y.doc_id % 5 = 0
          WHERE {_MH_BAND_EQ}),
        ex AS (SELECT doc_id, unnest(grams) AS g FROM sh),
        inter AS (
          SELECT c.new_id, c.corpus_id, count(*) AS inter
          FROM cand c
          JOIN ex x ON x.doc_id = c.new_id
          JOIN ex y ON y.doc_id = c.corpus_id AND y.g = x.g
          GROUP BY 1, 2),
        j AS (
          SELECT i.new_id, i.corpus_id,
                 round(cast(i.inter AS DOUBLE)
                       / cast(sa.n_sh + sb.n_sh - i.inter AS DOUBLE), 4) AS jaccard
          FROM inter i
          JOIN shl sa ON sa.doc_id = i.new_id
          JOIN shl sb ON sb.doc_id = i.corpus_id)
        SELECT new_id, corpus_id, jaccard FROM j WHERE jaccard >= 0.4
    """,
    # brute-force all-pairs oracle: valid because the Spark plan's
    # banding is EXACT (pigeonhole: hamming≤3 ⇒ one of 4 16-bit bands
    # equal), so the banded equi-join must reproduce the O(n²) result.
    "q_simhash_neardup": f"""
        WITH docs AS (SELECT doc_id, {_NORM} AS norm FROM documents),
        toks AS (
          SELECT doc_id, {_md5i("unnest(string_split(norm, ' '))")} AS th
          FROM docs),
        bits AS (
          SELECT doc_id,
                 {_SH_SUMS}
          FROM toks GROUP BY doc_id),
        sig AS (SELECT doc_id, CAST({_SH_SIG} AS BIGINT) AS simhash FROM bits)
        SELECT x.doc_id AS a, y.doc_id AS b,
               CAST(bit_count(xor(x.simhash, y.simhash)) AS BIGINT) AS hamming
        FROM sig x JOIN sig y ON x.doc_id < y.doc_id
        WHERE bit_count(xor(x.simhash, y.simhash)) <= 3
    """,
    "q_rolling_fingerprint": f"""
        WITH d AS (SELECT doc_id, {_NORM} AS norm FROM documents),
        g AS (SELECT doc_id, norm, {_shingles_sql(8)} AS grams FROM d)
        SELECT doc_id,
               CASE WHEN len(grams) = 0 THEN {_md5i("norm")}
               ELSE list_min(list_transform(grams, s -> {_md5i("s")}))
               END AS rfp
        FROM g
    """,
    # rows-only (no oracle): q_partitioned_write (side-effecting),
    # q_embedding_lsh_topk + q_knn_ivf (approximate by construction;
    # recall pinned vs brute force in tests/test_functions.py),
    # q_image_decode_meta + q_frame_sample (binary codecs)
}
