"""End-to-end corpus-curation pipeline composition: the operators are
not just individually oracle-correct — they CHAIN into the full
training-data build a 100 TB crawl feeds (quality gate → span dedup →
exact dedup → decontamination → domain cap → token-budget sharding),
each stage consuming the previous stage's DataFrame with no
driver-side materialization between them."""

from __future__ import annotations

from pyspark.sql import functions as F

from crawler_spark.functions import curation as CU
from crawler_spark.functions import text as TX


def test_corpus_curation_pipeline_e2e(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    n_raw = docs.count()

    # 1. quality gate (same thresholds as q_corpus_filter)
    gated = docs.withColumn("n_tokens", TX.token_count("text")).withColumn(
        "quality_bp", TX.quality_score("text")
    )
    kept = gated.filter(
        (F.col("n_tokens") >= 8)
        & (F.col("quality_bp") >= 5500)
        & (TX.predicted_lang("text") != "und")
    )
    n_kept = kept.count()
    assert 0 < n_kept <= n_raw

    # 2. span-level dedup over survivors, re-assembled text
    deduped = CU.chunk_dedup(kept.select("doc_id", "text"), n=3)
    assert deduped.count() == n_kept  # per-doc op, no rows lost
    cleaned = deduped.filter(F.col("text_clean") != "").join(
        kept.select("doc_id", "source"), "doc_id"
    )
    n_clean = cleaned.count()
    assert 0 < n_clean <= n_kept

    # 3. exact dedup of the CLEANED text (md5 of canonical form)
    uniq = cleaned.withColumn("fp", TX.fingerprint("text_clean")).dropDuplicates(
        ["fp"]
    )
    n_uniq = uniq.count()
    assert 0 < n_uniq <= n_clean

    # 4. decontaminate vs the synthetic eval split (doc_id % 50 == 0)
    evalset = docs.filter(F.col("doc_id") % 50 == 0)
    corpus = uniq.filter(F.col("doc_id") % 50 != 0)
    flags = CU.decontaminate(
        corpus.select("doc_id", F.col("text_clean").alias("text")), evalset
    )
    final = corpus.join(
        flags.filter(~F.col("contaminated")).select("doc_id"), "doc_id"
    )
    n_final = final.count()
    assert 0 < n_final <= n_uniq

    # 5. domain cap: ≤ 10 per source, best-quality first
    from pyspark.sql import Window

    w = Window.partitionBy("source").orderBy(
        TX.quality_score("text_clean").desc(), F.col("doc_id").asc()
    )
    capped = final.withColumn("rn", F.row_number().over(w)).filter("rn <= 10")
    per_source = capped.groupBy("source").count().agg(F.max("count")).collect()[0][0]
    assert per_source <= 10

    # 6. token-budget sharding of the final corpus
    sharded = TX.pack_shards(
        capped.select(
            "doc_id", TX.token_count("text_clean").alias("n_tokens")
        ),
        "n_tokens",
        budget=512,
        small=True,
    )
    rows = sorted(sharded.collect(), key=lambda r: r["doc_id"])
    assert rows
    # exact semantics: a row belongs to the shard its FIRST token lands
    # in — shard_id == exclusive_prefix(doc order) div budget
    prefix = 0
    for r in rows:
        assert r["shard_id"] == prefix // 512, r
        prefix += r["n_tokens"]
    assert rows[-1]["shard_id"] >= 1  # the corpus spans multiple shards
