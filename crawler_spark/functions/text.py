"""Text-analysis column expressions (token counting, quality scoring,
language ID, fingerprinting, shingling).

All pure JVM built-in expressions — they compile into whole-stage
codegen and survive 100 TB scans without Python in the loop.  Each has
an exact ANSI-SQL mirror registered in ``__spark_entry__.oracle_sql``
so DuckDB oracle-checks the semantics (driver contract).

Grounding: the reference's only text ops are ExtractNumber /
TakeChractersBefore (otodom/commons/extensions.go:10-22); these extend
that scalar-extraction layer to corpus curation (dedup keys, quality
filters) per the graft brief.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Stopword sets for the n-gram language heuristic.  Deliberately tiny
# and deterministic: the score is what's contract-checked, not real
# linguistic accuracy.
LANG_STOPWORDS = {
    "en": r"\b(the|and|of|to|in|a)\b",
    "de": r"\b(der|die|das|und|ist)\b",
    "fr": r"\b(le|la|les|et|est)\b",
    "es": r"\b(el|los|las|y|es)\b",
}

PUNCT_CLASS = r"[^.,;:!?]"


def norm_text(col: Column | str) -> Column:
    """Canonical text form: lowercase, whitespace collapsed, trimmed."""
    c = F.col(col) if isinstance(col, str) else col
    return F.trim(F.regexp_replace(F.lower(c), r"\s+", " "))


def bind_once(c: Column, f) -> Column:
    """Evaluate ``c`` ONCE per row and apply ``f`` to the bound value.

    Catalyst inlines a computed column expression into every use site —
    including INSIDE ``transform``/``filter`` lambda bodies, where it
    then re-evaluates per ELEMENT.  ``char_shingles`` hit this: the
    ``norm_text`` regex referenced from the per-shingle lambda ran
    ~L times per row (measured 9x slowdown on the shingling scan).
    Wrapping the value as a single-element array and referencing the
    LAMBDA VARIABLE (which Catalyst cannot inline through) forces
    exactly-once evaluation; ``element_at(.., 1)`` unwraps the result.
    """
    return F.element_at(F.transform(F.array(c), f), 1)


def fingerprint(col: Column | str) -> Column:
    """Document fingerprint: md5 over the canonical form (exact-dup key).

    md5 (not xxhash64) so the DuckDB oracle can reproduce it bit-for-bit.
    The engine-internal hot path uses xxhash64 (crawler_spark.canon);
    this is the portable corpus-level key.
    """
    return F.md5(norm_text(col))


def token_array(col: Column | str) -> Column:
    """Whitespace token array over the canonical form — THE shared
    tokenization (simhash64, TF-IDF, heavy hitters all build on it, and
    its DuckDB oracle mirror is ``string_split(<norm>, ' ')``); one
    definition so a tokenization change cannot desynchronize operators
    from each other or from the oracles.  Empty input yields ``['']``;
    filter empties downstream where the semantics need it."""
    return F.split(norm_text(col), " ")


def token_count(col: Column | str) -> Column:
    """Whitespace tokenization count ('' counts as 1, like split())."""
    c = F.col(col) if isinstance(col, str) else col
    return F.size(F.split(F.trim(c), r"\s+")).cast("long")


def bpe_ish_token_count(col: Column | str) -> Column:
    """Sub-word-ish token count: word pieces + digits + punctuation kept
    as separate tokens (a BPE-shaped regex, not a trained BPE)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.size(
        F.regexp_extract_all(c, F.lit(r"[A-Za-z]{1,4}|[0-9]|[^A-Za-z0-9\s]"), F.lit(0))
    ).cast("long")


def punct_count(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.length(F.regexp_replace(c, PUNCT_CLASS, "")).cast("long")


def stopword_count(col: Column | str, lang: str = "en") -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.size(F.regexp_extract_all(c, F.lit(LANG_STOPWORDS[lang]), F.lit(0))).cast("long")


def quality_score(col: Column | str) -> Column:
    """Deterministic quality heuristic in integer BASIS POINTS (0-10000)
    from length / stopword / punctuation ratios (the C4-style
    quality-filter shape):

        5000 * min(n_tokens/128, 1)           (enough content)
      + 3000 * min(stopwords/tokens * 8, 1)   (natural-language-ness)
      + 2000 * (1 - min(punct/chars * 20, 1)) (not punctuation soup)

    All arithmetic is exact integer div — bit-identical across engines
    (double ratios + rounding sit on representation boundaries; ints
    don't).
    """
    c = F.col(col) if isinstance(col, str) else col
    toks = token_count(c)
    stops = stopword_count(c)
    punct = punct_count(c)
    chars = F.greatest(F.length(c).cast("long"), F.lit(1).cast("long"))
    t1 = (F.lit(5000) * F.least(toks, F.lit(128).cast("long"))).cast("long") / F.lit(128)
    t1 = F.floor(t1).cast("long")
    t2 = F.least(
        F.floor(F.lit(24000) * stops / F.greatest(toks, F.lit(1).cast("long"))).cast("long"),
        F.lit(3000).cast("long"),
    )
    t3 = F.lit(2000).cast("long") - F.least(
        F.floor(F.lit(40000) * punct / chars).cast("long"), F.lit(2000).cast("long")
    )
    return (t1 + t2 + t3).alias("quality_bp")


def lang_scores(col: Column | str) -> dict[str, Column]:
    """Per-language stopword-hit counts (the n-gram heuristic's evidence)."""
    c = F.col(col) if isinstance(col, str) else col
    low = F.lower(c)
    return {
        lang: F.size(F.regexp_extract_all(low, F.lit(pat), F.lit(0))).cast("long")
        for lang, pat in LANG_STOPWORDS.items()
    }


def predicted_lang(col: Column | str) -> Column:
    """Argmax language by stopword score; ties broken by fixed lang order;
    'und' (undetermined) when no stopword hits at all."""
    scores = lang_scores(col)
    langs = list(LANG_STOPWORDS)
    best = F.greatest(*[scores[lg] for lg in langs])
    expr = F.lit("und")
    # build right-to-left so earlier langs win ties
    for lg in reversed(langs):
        expr = F.when(scores[lg] == best, F.lit(lg)).otherwise(expr)
    return F.when(best == 0, F.lit("und")).otherwise(expr)


def char_shingles(col: Column | str, n: int = 5) -> Column:
    """Distinct character n-grams of the canonical text (array<string>).

    Pure codegen: transform over an index sequence — no Python, no
    explode until the caller chooses to shuffle.  The normalized text
    is bound once per row (``bind_once``): referencing the norm_text
    expression from the per-shingle lambda would re-run its regex for
    every shingle.
    """

    def _shingles(t: Column) -> Column:
        return F.when(
            F.length(t) >= n,
            F.array_distinct(
                F.transform(
                    F.sequence(F.lit(1), F.length(t) - F.lit(n - 1)),
                    lambda i: F.substring(t, i, n),
                )
            ),
        ).otherwise(F.array().cast("array<string>"))

    return bind_once(norm_text(col), _shingles)


def token_ngrams(col: Column | str, n: int) -> Column:
    """Distinct token ``n``-grams of the canonical text (array<string>,
    sliding window over the ONE shared tokenization).  Pure codegen:
    transform over an index sequence, no explode until the caller
    chooses to shuffle.  Documents shorter than ``n`` tokens yield an
    empty array.  The tokenization is bound once per row (``bind_once``
    — see char_shingles)."""

    def _ngrams(toks: Column) -> Column:
        cnt = F.size(toks) - F.lit(n - 1)
        return F.when(
            cnt >= 1,
            F.array_distinct(
                F.transform(
                    F.sequence(F.lit(1), cnt),
                    lambda i: F.array_join(F.slice(toks, i, n), " "),
                )
            ),
        ).otherwise(F.array().cast("array<string>"))

    return bind_once(token_array(col), _ngrams)


def token_ngrams_all(col: Column | str, n: int) -> Column:
    """ALL token ``n``-grams (duplicates kept, document order) of the
    canonical text — the counting companion of :func:`token_ngrams`
    (which dedups for set-overlap use).  Needed wherever n-gram
    FREQUENCY matters (within-doc repetition ratios); same shared
    tokenization, same bind-once discipline, same empty-array result
    for documents shorter than ``n`` tokens."""

    def _ngrams(toks: Column) -> Column:
        cnt = F.size(toks) - F.lit(n - 1)
        return F.when(
            cnt >= 1,
            F.transform(
                F.sequence(F.lit(1), cnt),
                lambda i: F.array_join(F.slice(toks, i, n), " "),
            ),
        ).otherwise(F.array().cast("array<string>"))

    return bind_once(token_array(col), _ngrams)


def repetition_stats(col: Column | str) -> dict[str, Column]:
    """Within-document repetition signals (the Gopher/MassiveText
    repetition-filter family) as exact-integer columns:

    - ``n_tokens``        — shared-tokenization token count;
    - ``dup_token_per_mille`` — ``1000*(n_tokens - n_distinct) div
      n_tokens``: the fraction of tokens that are repeats of an earlier
      token, in integer per-mille (array-local, zero shuffle);

    Integer ``div`` keeps the scores bit-identical across engines (the
    same discipline as quality_score's basis points).  The top-n-gram
    dominance half of the filter family needs per-doc frequency — that
    is a grouped count over :func:`token_ngrams_all`, left to the
    caller because it (correctly) shuffles.
    """
    toks = token_array(col)
    n = F.size(toks).cast("long")
    d = F.size(F.array_distinct(toks)).cast("long")
    return {
        "n_tokens": n,
        "dup_token_per_mille": F.floor((F.lit(1000) * (n - d)) / n).cast("long"),
    }


def md5_int60(col: Column) -> Column:
    """Portable 60-bit integer hash: the first 15 hex digits of md5 as a
    non-negative int64.  Bit-identical in any engine with md5 + hex
    parsing (DuckDB: ``CAST('0x' || substr(md5(x),1,15) AS BIGINT)``) —
    the cross-engine-checkable counterpart of the JVM-native xxhash64
    used on engine-internal hot paths."""
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")


def html_visible_text(col: Column | str) -> Column:
    """Visible text from an HTML string: drop <script> blocks including
    bodies (lazy ``[\\s\\S]*?`` — script code may contain '<'), strip
    remaining tags, decode the common entities with ``&amp;`` LAST
    (``&amp;lt;`` must yield the literal ``&lt;``, not '<'), collapse
    whitespace.  Pure whole-stage-codegen regexp_replace chain,
    patterns RE2-compatible so a DuckDB oracle can replay them
    (contract.q_html_strip)."""
    no_script = F.regexp_replace(col, r"<script[^>]*>[\s\S]*?</script>", " ")
    no_tags = F.regexp_replace(no_script, r"<[^>]*>", " ")
    decoded = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(no_tags, "&lt;", "<"), "&gt;", ">"
        ),
        "&amp;",
        "&",
    )
    return F.trim(F.regexp_replace(decoded, r"\s+", " "))


def rolling_fingerprint(col: Column | str, n: int = 8, portable: bool = False) -> Column:
    """Winnowing-style document fingerprint: min hash over character
    n-gram windows of the canonical text.  Default hash is xxhash64
    (engine-internal key); ``portable=True`` uses :func:`md5_int60` so
    the DuckDB oracle reproduces it bit-for-bit."""
    hf = md5_int60 if portable else F.xxhash64
    grams = char_shingles(col, n)
    hashes = F.transform(grams, lambda g: hf(g))
    return F.when(F.size(hashes) > 0, F.array_min(hashes)).otherwise(
        hf(norm_text(col))
    ).cast("long")


def pack_shards(
    docs,
    token_col: str,
    budget: int,
    order_keys: tuple[str, ...] = ("doc_id",),
    shard_col: str = "shard_id",
    small: bool = False,
):
    """Token-budget training-shard assignment: documents, taken in the
    deterministic ``order_keys`` order, are packed contiguously into
    shards of ``budget`` tokens — a row belongs to the shard its first
    token lands in (``exclusive_prefix_tokens div budget``), so shards
    fill to >= budget before rolling over and assignment needs no
    sequential scan.

    Built on operators.ranking.running_total (distributed exclusive
    prefix sum, no single-partition window, parallelism-invariant), so
    the same assignment holds at 10^10 documents.  Integer arithmetic
    end-to-end — cross-engine reproducible (DuckDB: ``prefix //
    budget``)."""
    from ..operators.ranking import running_total

    if budget <= 0:
        raise ValueError(f"budget must be positive, got {budget}")
    out = running_total(docs, list(order_keys), token_col, "_pfx", small=small)
    return out.withColumn(
        shard_col, F.expr(f"_pfx div {int(budget)}").cast("long")
    ).drop("_pfx")
