"""robots.txt gating (north_rule: robots-gated scheduling).

Candidate URLs are checked at frontier-insertion time against a small
per-host rule table broadcast to every task.  A row is blocked when its
host has a non-empty ``disallow_prefix`` and the URL path starts with
it.  Blocked rows never enter the frontier (counted for metrics).

The reference has no robots handling — this is a graft axis; semantics
(single prefix per host, path-prefix match) mirror the fixture contract
FIXTURES.md §4 and are mirrored exactly in the golden model.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..canon import path_col


def tag_robots(candidates: DataFrame, robots: DataFrame) -> DataFrame:
    """Add a ``_blocked`` flag; join on host, broadcast the rule table."""
    return (
        candidates.join(F.broadcast(robots.select("host", "disallow_prefix")), "host", "left")
        .withColumn(
            "_blocked",
            (F.coalesce(F.col("disallow_prefix"), F.lit("")) != F.lit(""))
            & path_col(F.col("url")).startswith(F.col("disallow_prefix")),
        )
        .drop("disallow_prefix")
    )


def split_robots(candidates: DataFrame, robots: DataFrame) -> tuple[DataFrame, DataFrame]:
    """→ (allowed, blocked)."""
    tagged = tag_robots(candidates, robots)
    return (
        tagged.filter(~F.col("_blocked")).drop("_blocked"),
        tagged.filter(F.col("_blocked")).drop("_blocked"),
    )


# ------------------------------------------------- RFC 9309 wildcard matching
#
# Real robots.txt files carry MULTIPLE Allow/Disallow rules per host with
# ``*`` wildcards and ``$`` end-anchors; the verdict is decided by the
# LONGEST matching pattern (most octets), with Allow winning length ties
# and "no matching rule" meaning allowed (RFC 9309 §2.2.2).  The
# single-prefix gate above stays the engine/fixture contract; this is
# the full-grammar operator a general crawler runs at frontier insert.
#
# Pattern grammar: literal path octets, ``*`` matching any run of
# characters, optional trailing ``$`` anchoring the match at
# end-of-path.  The translation to a regex is shared verbatim with the
# DuckDB oracle (q_robots_rfc_gate):
#
#   body  = pattern minus one trailing '$' (its presence → anchored)
#   rx    = '^' + escape(body, keep='*').replace('*', '.*') + ('$' if anchored)
#
# escape() backslash-escapes EVERY character outside [A-Za-z0-9/*] —
# real robots.txt paths routinely carry '?', '+', '=', '(' … (e.g. the
# ubiquitous ``Disallow: /*?``), which are live metacharacters if left
# bare.  Escaped punctuation is a literal in BOTH Java regex and RE2
# (escaped alphanumerics are NOT portable, hence the allowlist class),
# and the translated form (literals + ``.*``) is linear-time in either
# engine.


def _rule_regex(pattern):
    body = F.when(pattern.endswith("$"), F.substring(pattern, 1, F.length(pattern) - 1)).otherwise(
        pattern
    )
    escaped = F.regexp_replace(body, r"([^A-Za-z0-9/*])", r"\\$1")
    rx_body = F.replace(escaped, F.lit("*"), F.lit(".*"))
    return F.concat(
        F.lit("^"), rx_body, F.when(pattern.endswith("$"), F.lit("$")).otherwise(F.lit(""))
    )


def rfc_robots_verdict(
    candidates: DataFrame,
    rules: DataFrame,
    key_cols: list[str],
    path: str = "path",
) -> DataFrame:
    """Per-candidate RFC 9309 verdict over a (host, rule_type, pattern)
    rule table; ``rule_type`` ∈ {'allow', 'disallow'}.

    Returns ``candidates`` + ``allowed`` (boolean) + ``match_len`` (octet
    length of the winning pattern; 0 when no rule matched).

    Plan shape: the rule table is per-host-small (robots.txt is a
    bounded file) → broadcast join on host, regex filter, then ONE
    combiner-backed aggregate keyed on the candidate key picking
    ``max(struct(match_len, is_allow))`` — allow wins equal lengths by
    struct ordering, no window.  At 10^10 candidates this shuffles only
    (key, winner-struct) pairs of the matched subset."""
    with_rx = rules.select(
        "host",
        F.length("pattern").cast("int").alias("_mlen"),
        (F.col("rule_type") == "allow").cast("int").alias("_is_allow"),
        _rule_regex(F.col("pattern")).alias("_rx"),
    )
    matched = (
        candidates.select(*key_cols, "host", path)
        .join(F.broadcast(with_rx), "host")
        .filter(F.regexp_like(F.col(path), F.col("_rx")))
        .groupBy(*key_cols)
        .agg(F.max(F.struct(F.col("_mlen"), F.col("_is_allow"))).alias("_w"))
        .select(
            *key_cols,
            (F.col("_w._is_allow") == 1).alias("_m_allowed"),
            F.col("_w._mlen").alias("_m_len"),
        )
    )
    return (
        candidates.join(matched, key_cols, "left")
        .withColumn("allowed", F.coalesce(F.col("_m_allowed"), F.lit(True)))
        .withColumn("match_len", F.coalesce(F.col("_m_len"), F.lit(0)))
        .drop("_m_allowed", "_m_len")
    )
