"""Corpus-curation operators for training-data pipelines: span-level
(C4-style) duplicate removal, per-host boilerplate detection, PII
scrubbing, and source-level quality propagation.

All four are pure DataFrame compositions over the shared text kernels
(functions/text.py) — whole-stage-codegen expressions plus
combiner-backed aggregations, no Python in the loop — so they survive
a 100 TB corpus scan:

* ``chunk_dedup``'s keeper-choice shuffle carries ONLY (md5 key,
  doc_id, pos) triples — chunk text is projected away before that
  exchange — and the keeper is a map-side-combinable ``min(struct)``
  rather than a window, so one mega-duplicated span (the classic
  empty chunk) is a single reduce key with a tiny record, not a
  skewed window partition.  Only the final per-doc re-assembly
  shuffles text, and it moves each doc's SURVIVING spans exactly once.
* ``boilerplate_lines`` aggregates (host, line) doc frequencies with
  partial aggregation and joins the per-host page counts (one row per
  host — unbounded at web scale, so the join is NOT force-broadcast;
  AQE picks broadcast at runtime when the host list actually is small)
  back onto the frequency table.
* ``pii_scrub`` is a single narrow projection (regexp_extract_all +
  regexp_replace), zero shuffles.
* ``source_quality`` computes per-source means with a combiner-backed
  aggregate and broadcasts them (one row per source) back to the docs.

Grounding: the reference's pipeline stores raw extractions with no
corpus hygiene (otodom/orchestrator/handler.go:63-101 fetch→store);
these are the curation stages the graft brief mandates on top.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from . import text as TX

# RE2-safe (no backreferences / lookaround) so the DuckDB oracle can run
# the byte-identical pattern.
EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PHONE_RE = r"\+[0-9]{1,2}-[0-9]{3}-[0-9]{4}"


def token_chunks(col: Column | str, n: int) -> Column:
    """Non-overlapping ``n``-token spans of the canonical token array —
    the dedup unit for span-level duplicate removal (the C4 paper
    removes repeated three-sentence spans; fixtures have no sentence
    punctuation, so the span is token-windowed instead).  Built on the
    ONE shared tokenization (``text.token_array``) so span keys can
    never desynchronize from the other text operators.  The
    tokenization is bound once per row (``text.bind_once``):
    referencing it from the per-chunk lambda would re-run the
    normalize+split for every chunk."""

    def _chunks(toks: Column) -> Column:
        n_chunks = F.ceil(F.size(toks) / F.lit(n)).cast("int")
        return F.transform(
            F.sequence(F.lit(0), n_chunks - F.lit(1)),
            lambda i: F.array_join(F.slice(toks, i * n + 1, n), " "),
        )

    return TX.bind_once(TX.token_array(col), _chunks)


def chunk_dedup(docs: DataFrame, n: int = 3) -> DataFrame:
    """Corpus-wide span dedup: every ``n``-token chunk is kept only at
    its FIRST occurrence (global (doc_id, pos) order); later copies are
    dropped and each doc is re-assembled from its surviving spans.

    Returns (doc_id, n_chunks, n_removed, text_clean).

    Scale shape: one explode (narrow), one groupBy over md5(chunk)
    with a combinable min(struct(doc_id, pos)) keeper, one equi-join
    back on the 16-byte key, one per-doc aggregate.  The re-assembly
    sorts each doc's spans inside ``array_sort`` (per-row, no global
    sort), so order is deterministic without a window.
    """
    units = docs.select(
        "doc_id", F.posexplode(token_chunks("text", n)).alias("pos", "chunk")
    ).withColumn("ck", F.md5("chunk"))
    keepers = units.groupBy("ck").agg(
        F.min(F.struct("doc_id", "pos")).alias("keep_at")
    )
    flagged = units.join(keepers, "ck").withColumn(
        "is_kept",
        (F.col("doc_id") == F.col("keep_at.doc_id"))
        & (F.col("pos") == F.col("keep_at.pos")),
    )
    per_doc = flagged.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_chunks"),
        F.sum((~F.col("is_kept")).cast("long")).alias("n_removed"),
        F.array_sort(
            F.collect_list(F.when(F.col("is_kept"), F.struct("pos", "chunk")))
        ).alias("kept"),
    )
    return per_doc.select(
        "doc_id",
        "n_chunks",
        "n_removed",
        F.array_join(F.transform("kept", lambda s: s["chunk"]), " ").alias(
            "text_clean"
        ),
    )


def boilerplate_lines(
    pages: DataFrame,
    host_col: str = "host",
    page_col: str = "page_id",
    text_col: str = "text",
    num: int = 4,
    den: int = 5,
) -> DataFrame:
    """Per-host boilerplate inventory: a line (``\\n``-split unit of
    ``text_col``) occurring on at least ``num/den`` of the host's pages
    (default 80%) is boilerplate — the nav/header/footer text a
    training corpus must strip before dedup or quality scoring.

    Returns (host, line, df, n_pages) for boilerplate lines only.

    Threshold arithmetic is exact-integer (``df*den >= n_pages*num``)
    so the cut is bit-identical across engines.  Per-page duplicate
    lines count once (distinct per page) so a page repeating its own
    nav bar cannot promote it alone.
    """
    lines = pages.select(
        F.col(host_col).alias("host"),
        F.col(page_col).alias("page_id"),
        F.explode(F.split(F.col(text_col), "\n")).alias("line"),
    ).filter(F.trim("line") != "")
    # ONE aggregate does both jobs: countDistinct(page_id) makes
    # per-page repeats count once (no separate full-text distinct
    # shuffle), and the group key is the 16-byte line hash — the line
    # text rides along as a combiner-reduced min(), so the shuffle
    # carries each distinct line once per map partition, not per page
    df_counts = (
        lines.withColumn("lh", F.md5("line"))
        .groupBy("host", "lh")
        .agg(
            F.countDistinct("page_id").alias("df"),
            F.min("line").alias("line"),
        )
        .drop("lh")
    )
    page_counts = pages.select(
        F.col(host_col).alias("host"), F.col(page_col).alias("page_id")
    ).groupBy("host").agg(F.countDistinct("page_id").alias("n_pages"))
    # NO forced broadcast: page_counts is one row PER HOST — bounded by
    # nothing on a real crawl (10^8 hosts ≈ GBs), unlike the per-SOURCE
    # means in source_quality (a curated, small list).  AQE still
    # converts this to a broadcast join at runtime whenever the
    # aggregate actually is small; forcing it would OOM the driver at
    # web scale.
    return (
        df_counts.join(page_counts, "host")
        .filter(F.col("df") * den >= F.col("n_pages") * num)
        .select("host", "line", "df", "n_pages")
    )


def pii_scrub(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Redact emails/phones (RE2-safe patterns shared with the oracle)
    and count what was removed — the PII pass every published web
    corpus runs before release.  One narrow projection, no shuffle."""
    c = F.col(text_col)
    return docs.select(
        F.col(id_col).alias("doc_id"),
        F.size(F.regexp_extract_all(c, F.lit(EMAIL_RE), F.lit(0))).cast("long").alias("n_emails"),
        F.size(F.regexp_extract_all(c, F.lit(PHONE_RE), F.lit(0))).cast("long").alias("n_phones"),
        F.regexp_replace(
            F.regexp_replace(c, EMAIL_RE, "<EMAIL>"), PHONE_RE, "<PHONE>"
        ).alias("clean"),
    )


def decontaminate(
    corpus: DataFrame,
    evalset: DataFrame,
    n: int = 5,
    threshold: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Benchmark decontamination: flag corpus docs sharing ≥
    ``threshold`` distinct token ``n``-grams with any eval-set doc —
    the test-set overlap removal every published LLM corpus runs
    before training.

    Returns (doc_id, n_overlap, contaminated) for EVERY corpus doc
    (zero-overlap docs included, n_overlap = 0).

    Scale shape: eval sets are small by construction, so the distinct
    eval-gram table BROADCASTS — the 10^10-doc corpus side never
    shuffles; its grams stream through a map-side hash join into one
    combiner-backed per-doc count.  Grams travel as 60-bit portable
    hashes (md5_int60), never strings.
    """
    gram_h = lambda c: TX.md5_int60(c)  # noqa: E731 — shared portable hash
    eval_grams = (
        evalset.select(F.explode(TX.token_ngrams(text_col, n)).alias("gram"))
        .select(gram_h(F.col("gram")).alias("gh"))
        .distinct()
    )
    corpus_grams = corpus.select(
        F.col(id_col).alias("doc_id"),
        F.explode(TX.token_ngrams(text_col, n)).alias("gram"),
    ).select("doc_id", gram_h(F.col("gram")).alias("gh"))
    hits = corpus_grams.join(F.broadcast(eval_grams), "gh").groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_overlap")
    )
    return (
        corpus.select(F.col(id_col).alias("doc_id"))
        .join(hits, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_overlap", F.lit(0)).cast("long").alias("n_overlap"),
            (F.coalesce("n_overlap", F.lit(0)) >= threshold).alias("contaminated"),
        )
    )


def source_quality(docs: DataFrame) -> DataFrame:
    """Source-level quality propagation: score every doc (integer basis
    points, the shared ``text.quality_score`` kernel), aggregate the
    exact per-source mean (floor of sum/count — no double rounding),
    broadcast it back, and keep docs scoring at least half their
    source's mean.  This is the domain/source prior step (docs from a
    consistently low-quality source need a higher bar) used by
    quality-classified corpora.

    Returns (doc_id, source, quality_bp, src_mean_bp, kept)."""
    scored = docs.select(
        "doc_id", "source", TX.quality_score("text").alias("quality_bp")
    )
    means = scored.groupBy("source").agg(
        F.floor(F.sum("quality_bp") / F.count(F.lit(1))).cast("long").alias("src_mean_bp")
    )
    return scored.join(F.broadcast(means), "source").select(
        "doc_id",
        "source",
        "quality_bp",
        "src_mean_bp",
        (F.col("quality_bp") * 2 >= F.col("src_mean_bp")).alias("kept"),
    )


def substring_dup_stats(
    docs: DataFrame,
    n: int = 10,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Exact substring-level dedup signals (Lee et al. 2022): per doc,
    token positions covered by a token ``n``-gram occurring >=2 times
    anywhere in the corpus (within-doc repeats included, as ExactSubstr
    counts them).  Fixed-N approximation of suffix-array ExactSubstr —
    no global suffix sort; one gram explode, a combiner-backed count on
    the portable int64 gram hash, a same-key join back, a bounded xN
    position explode, one per-doc aggregate.

    Returns (id, n_tokens, n_dup_grams, dup_cover_tokens,
    dup_permille) — integer-exact, oracle-mirrored by
    contract.q_substring_dedup."""
    grams = docs.select(
        F.col(id_col).alias("_id"),
        F.posexplode(TX.token_ngrams_all(text_col, n)).alias("pos0", "gram"),
    ).select(
        "_id",
        (F.col("pos0") + 1).alias("pos"),  # 1-based, mirrors generate_series
        TX.md5_int60(F.col("gram")).alias("gh"),
    )
    dup = grams.groupBy("gh").agg(F.count(F.lit(1)).alias("c")).filter("c >= 2")
    occ = grams.join(dup.select("gh"), "gh")
    stats = (
        occ.select(
            "_id",
            "pos",
            F.explode(F.sequence(F.col("pos"), F.col("pos") + n - 1)).alias("ti"),
        )
        .groupBy("_id")
        .agg(
            F.countDistinct("pos").alias("n_dup_grams"),
            F.countDistinct("ti").alias("dup_cover_tokens"),
        )
    )
    base = docs.select(
        F.col(id_col).alias("_id"),
        F.size(TX.token_array(text_col)).cast("long").alias("n_tokens"),
    )
    return base.join(stats, "_id", "left").select(
        F.col("_id").alias(id_col),
        "n_tokens",
        F.coalesce("n_dup_grams", F.lit(0)).cast("long").alias("n_dup_grams"),
        F.coalesce("dup_cover_tokens", F.lit(0)).cast("long").alias("dup_cover_tokens"),
        F.expr(
            "div(1000 * coalesce(dup_cover_tokens, 0L), greatest(n_tokens, 1L))"
        ).alias("dup_permille"),
    )
