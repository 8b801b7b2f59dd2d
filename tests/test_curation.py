"""Semantic unit tests for the corpus-curation and crawl-hygiene
operators (functions/curation.py, operators/traps.py,
operators/recrawl.py) on planted inputs — the contract/oracle
equivalence over the fixture tables runs in test_contract.py."""

from __future__ import annotations

import datetime as dt

from crawler_spark.functions import curation as CU
from crawler_spark.operators.recrawl import (
    MAX_INTERVAL_MS,
    MIN_INTERVAL_MS,
    recrawl_schedule,
)
from crawler_spark.operators.traps import trap_verdict, url_shape


def test_chunk_dedup_removes_later_copies(spark):
    docs = spark.createDataFrame(
        [
            (1, "a b c d e f"),  # chunks: "a b c", "d e f"
            (2, "a b c x y z"),  # "a b c" is a copy; "x y z" fresh
            (3, "d e f"),  # whole doc is a copy
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in CU.chunk_dedup(docs, n=3).collect()}
    assert out[1]["n_removed"] == 0 and out[1]["text_clean"] == "a b c d e f"
    assert out[2]["n_removed"] == 1 and out[2]["text_clean"] == "x y z"
    assert out[3]["n_removed"] == 1 and out[3]["text_clean"] == ""
    assert out[3]["n_chunks"] == 1


def test_chunk_dedup_keeper_is_first_global_occurrence(spark):
    # same chunk in both docs: the lower (doc_id, pos) wins
    docs = spark.createDataFrame(
        [(10, "q q q"), (2, "q q q")], "doc_id long, text string"
    )
    out = {r["doc_id"]: r for r in CU.chunk_dedup(docs, n=3).collect()}
    assert out[2]["n_removed"] == 0
    assert out[10]["n_removed"] == 1


def test_boilerplate_threshold_is_exact_integer(spark):
    # host with 5 pages: a line on 4 pages (80%) is boilerplate,
    # a line on 3 (60%) is not; per-page repeats count once
    rows = []
    for p in range(5):
        lines = ["nav nav nav", "nav nav nav"]  # repeated on-page
        if p < 4:
            lines.append("footer-80pct")
        if p < 3:
            lines.append("promo-60pct")
        lines.append(f"body-{p}")
        rows.append(("h1", p, "\n".join(lines)))
    pages = spark.createDataFrame(rows, "host string, page_id long, text string")
    got = {
        (r["line"]): (r["df"], r["n_pages"])
        for r in CU.boilerplate_lines(pages).collect()
    }
    assert got == {"nav nav nav": (5, 5), "footer-80pct": (4, 5)}


def test_pii_scrub_redacts_and_counts(spark):
    docs = spark.createDataFrame(
        [
            (1, "mail a.b+c@ex.org then tel +1-555-0100 end"),
            (2, "no pii here"),
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in CU.pii_scrub(docs).collect()}
    assert out[1]["n_emails"] == 1 and out[1]["n_phones"] == 1
    assert out[1]["clean"] == "mail <EMAIL> then tel <PHONE> end"
    assert out[2]["n_emails"] == 0 and out[2]["clean"] == "no pii here"


def test_source_quality_broadcasts_and_keeps_half_mean(spark):
    docs = spark.createDataFrame(
        [
            (1, "s1", "the and of to in a " * 30),  # high quality
            (2, "s1", ";;;;;;;"),  # punctuation soup
        ],
        "doc_id long, source string, text string",
    )
    out = CU.source_quality(docs)
    rows = {r["doc_id"]: r for r in out.collect()}
    assert rows[1]["kept"] and not rows[2]["kept"]
    assert rows[1]["src_mean_bp"] == rows[2]["src_mean_bp"]
    assert "BroadcastHashJoin" in out._jdf.queryExecution().executedPlan().toString()


def test_url_shape_loop_detection(spark):
    urls = spark.createDataFrame(
        [
            ("h", "/a/b/a/b/a"),  # 'a' ×3 → loop
            ("h", "/a/b/a"),  # 'a' ×2 → not a loop
            ("h", "/x/y/z"),
            ("h", "/g/g/p/p"),  # two DOUBLED segments: excess 2 but no ×3 → not a loop
            ("h", "/g/g/g/p/p"),  # 'g' ×3 among other dups → loop
        ],
        "host string, path string",
    )
    got = {r["path"]: r for r in url_shape(urls).collect()}
    assert got["/a/b/a/b/a"]["is_loop"] and got["/a/b/a/b/a"]["depth"] == 5
    assert not got["/a/b/a"]["is_loop"]
    assert not got["/x/y/z"]["is_loop"]
    assert not got["/g/g/p/p"]["is_loop"]
    assert got["/g/g/g/p/p"]["is_loop"]


def test_trap_verdict_thresholds(spark):
    shapes = spark.createDataFrame(
        # loopy: 1 loop of 3 urls (33% ≥ 30%); deep: depth 12; clean host
        [("loopy", "/a/a/a", 3, True)]
        + [("loopy", f"/p{i}", 1, False) for i in range(2)]
        + [("deep", "/" + "/".join("d" * 1 for _ in range(12)), 12, False)]
        + [("clean", f"/q{i}", 1, False) for i in range(10)],
        "host string, path string, depth long, is_loop boolean",
    )
    got = {r["host"]: r["is_trap"] for r in trap_verdict(shapes).collect()}
    assert got == {"loopy": True, "deep": True, "clean": False}


def test_recrawl_schedule_counts_and_clamps(spark):
    t0 = dt.datetime(2024, 1, 1)
    rows = [
        # url 1: 3 fetches over 10 days, 2 changes → span/2 = 5 d (in range)
        (1, t0, 1.0, 1),
        (1, t0 + dt.timedelta(days=5), 2.0, 2),
        (1, t0 + dt.timedelta(days=10), 3.0, 3),
        # url 2: never changes → span/1 > 7 d → clamped to MAX
        (2, t0, 1.0, 4),
        (2, t0 + dt.timedelta(days=30), 1.0, 5),
        # url 3: single fetch → span 0 → clamped to MIN
        (3, t0, 1.0, 6),
    ]
    fetches = spark.createDataFrame(
        rows, "url_id long, ts timestamp, value double, event_id long"
    )
    out = {r["url_id"]: r for r in recrawl_schedule(fetches).collect()}
    assert out[1]["n_changes"] == 2
    assert out[1]["interval_ms"] == 5 * 86_400_000
    assert out[2]["n_changes"] == 0
    assert out[2]["interval_ms"] == MAX_INTERVAL_MS
    assert out[3]["interval_ms"] == MIN_INTERVAL_MS
    assert out[3]["next_fetch_ms"] == _unix_ms(t0) + MIN_INTERVAL_MS
    assert out[1]["next_fetch_ms"] == _unix_ms(t0) + out[1]["span_ms"] + out[1]["interval_ms"]


def _unix_ms(d: dt.datetime) -> int:
    return int(d.replace(tzinfo=dt.timezone.utc).timestamp() * 1000)


def test_decontaminate_flags_planted_overlap(spark):
    evalset = spark.createDataFrame(
        [(100, "alpha beta gamma delta epsilon zeta eta")],
        "doc_id long, text string",
    )
    corpus = spark.createDataFrame(
        [
            # 3 shared 5-grams (alpha..epsilon, beta..zeta, gamma..eta)
            (1, "alpha beta gamma delta epsilon zeta eta theta"),
            # only 1 shared 5-gram
            (2, "alpha beta gamma delta epsilon XXX YYY"),
            (3, "nothing shared at all here friend"),
            (4, "shrt"),  # < 5 tokens → no grams
        ],
        "doc_id long, text string",
    )
    from crawler_spark.functions.curation import decontaminate

    out = {r["doc_id"]: r for r in decontaminate(corpus, evalset).collect()}
    assert out[1]["contaminated"] and out[1]["n_overlap"] >= 3
    assert not out[2]["contaminated"] and out[2]["n_overlap"] == 1
    assert out[3]["n_overlap"] == 0 and out[4]["n_overlap"] == 0
    assert len(out) == 4  # every corpus doc reported


def test_chunk_dedup_global_conservation(spark, sf_dir):
    """Corpus-wide invariant: total kept spans == number of DISTINCT
    spans in the corpus (each distinct span survives exactly once)."""
    from pyspark.sql import functions as F

    from crawler_spark.functions.curation import chunk_dedup, token_chunks

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    out = chunk_dedup(docs, n=3)
    kept_total = out.agg(
        F.sum(F.col("n_chunks") - F.col("n_removed")).alias("k")
    ).collect()[0]["k"]
    distinct_chunks = (
        docs.select(F.explode(token_chunks("text", 3)).alias("c"))
        .select(F.countDistinct("c").alias("d"))
        .collect()[0]["d"]
    )
    assert kept_total == distinct_chunks


def test_gate_frontier_drops_trap_hosts_broadcast(spark):
    from pyspark.sql import functions as F  # noqa: F401

    from crawler_spark.operators.traps import gate_frontier, trap_verdict, url_shape

    urls = spark.createDataFrame(
        [("bad", "/a/a/a"), ("bad", "/a/a/a/a"), ("ok", "/x"), ("ok", "/y")],
        "host string, path string",
    )
    verdicts = trap_verdict(url_shape(urls))
    frontier = spark.createDataFrame(
        [("bad", "u1"), ("ok", "u2"), ("ok", "u3")], "host string, url string"
    )
    out = gate_frontier(frontier, verdicts)
    assert sorted(r["url"] for r in out.collect()) == ["u2", "u3"]
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan and "LeftAnti" in plan, plan


def test_mirror_pairs_cap_and_containment(spark):
    from crawler_spark.operators.mirrors import mirror_pairs

    # A and B mirror two 3-gram shingles; "bp bp bp" is boilerplate on
    # all three sources and must be DROPPED by the hot-shingle cap (=2)
    docs = spark.createDataFrame(
        [
            (1, "a", "x1 x2 x3 x4"),
            (2, "a", "bp bp bp"),
            (3, "b", "x1 x2 x3 x4 zz"),
            (4, "b", "bp bp bp"),
            (5, "c", "c1 c2 c3 c4"),
            (6, "c", "bp bp bp"),
        ],
        "doc_id long, source string, text string",
    )
    out = mirror_pairs(docs, n=3, min_shared=1, max_gram_sources=2).collect()
    assert [(r["source_a"], r["source_b"], r["shared_grams"]) for r in out] == [
        ("a", "b", 2)
    ]
    # totals are UNCAPPED gram counts: a has 3 (2 content + bp), b has 4
    # -> floor(10000 * 2 / 3) = 6666
    assert out[0]["containment_bp"] == 6666

    # cap raised to 3: the boilerplate shingle now participates and
    # links every pair (BETWEEN bounds are inclusive)
    out3 = mirror_pairs(docs, n=3, min_shared=1, max_gram_sources=3)
    got = {
        (r["source_a"], r["source_b"]): r["shared_grams"] for r in out3.collect()
    }
    assert got == {("a", "b"): 3, ("a", "c"): 1, ("b", "c"): 1}


def test_collapse_mirrors_drops_larger_host_broadcast(spark):
    from pyspark.sql import functions as F  # noqa: F401

    from crawler_spark.operators.mirrors import collapse_mirrors

    pairs = spark.createDataFrame(
        [("a", "b", 50, 9000)],
        "source_a string, source_b string, shared_grams long, containment_bp long",
    )
    frontier = spark.createDataFrame(
        [("a", "u1"), ("b", "u2"), ("c", "u3")], "host string, url string"
    )
    out = collapse_mirrors(frontier, pairs)
    assert sorted(r["url"] for r in out.collect()) == ["u1", "u3"]
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan and "LeftAnti" in plan, plan


def test_substring_dup_stats_span_coverage(spark):
    """ExactSubstr-style pins with n=3 grams: a shared 3-gram covers
    exactly its 3 positions in BOTH docs; overlapping duplicated grams
    merge their covered spans (distinct positions, not 3x occurrences);
    a within-doc repeat counts (corpus-wide >=2 includes same-doc); a
    short doc (<n tokens) reports zeros, not a dropped row."""
    from crawler_spark.functions.curation import substring_dup_stats

    docs = spark.createDataFrame(
        [
            (1, "a b c x y z q"),       # 'a b c' shared with doc 2
            (2, "p q r a b c"),         # -> cover 3 tokens each
            (3, "u v w u v w u v w"),   # within-doc repeats: 'u v w'-family
            (4, "t1 t2"),               # shorter than n: zeros
            (5, "m n o p2 m n o"),      # 'm n o' twice in ONE doc -> covered
        ],
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]: (
            r["n_tokens"], r["n_dup_grams"], r["dup_cover_tokens"], r["dup_permille"]
        )
        for r in substring_dup_stats(docs, n=3).collect()
    }
    assert got[1] == (7, 1, 3, 428)  # 1000*3 div 7
    assert got[2] == (6, 1, 3, 500)
    # doc 3: grams at pos 1..7; 'u v w' x3, 'v w u' x2, 'w u v' x2 ->
    # all 7 gram starts duplicated, covering all 9 positions
    assert got[3] == (9, 7, 9, 1000)
    assert got[4] == (2, 0, 0, 0)
    # doc 5: 'm n o' at pos 1 and 5 -> 6 covered positions of 7
    assert got[5] == (7, 2, 6, 857)
