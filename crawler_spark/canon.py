"""URL canonicalization — Spark column expressions + exact Python mirror.

Semantics (pinned in tests/test_canon.py), derived from the reference:

- cut at the first ``#`` (fragment strip — the reference's test corpus
  strips ``.html#anchor`` suffixes, otodom/commons/extensions_test.go:26-35)
- cut before the first ``.html`` occurrence, i.e. the reference's
  ``TakeChractersBefore(link, ".html")`` (otodom/commons/extensions.go:20-22).
  Where the reference PANICS on an absent predicate we instead keep the
  whole string (``substring_index`` semantics) — deliberate sane pin,
  SURVEY.md §2 P4.

The Spark side is pure built-in expressions (whole-stage codegen, no
Python); the Python side exists only for the golden model + fixtures.
"""

from __future__ import annotations

import re

from pyspark.sql import Column
from pyspark.sql import functions as F

from .hashing import xxhash64_str

HTML_SUFFIX = ".html"


# ---------------------------------------------------------------- Spark side
def canonical_url_col(url: Column) -> Column:
    """Canonical URL as a Spark expression (reference P4 + fragment strip)."""
    no_frag = F.substring_index(url, "#", 1)
    return F.substring_index(no_frag, HTML_SUFFIX, 1)


def url_hash_col(canon_url: Column) -> Column:
    """xxhash64 of the canonical URL (JVM-side, seed 42)."""
    return F.xxhash64(canon_url)


def host_col(url: Column) -> Column:
    """Host component, e.g. ``host0001.example`` — politeness partition key."""
    return F.regexp_extract(url, r"^[a-zA-Z][a-zA-Z0-9+.-]*://([^/?#]+)", 1)


def path_col(url: Column) -> Column:
    """Path+query after the authority — robots prefix matching operand."""
    return F.regexp_extract(url, r"^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*(.*)$", 1)


def with_url_identity(df, url_col_name: str = "url"):
    """Add canonical ``url``, ``url_hash``, ``host`` columns in one select."""
    canon = canonical_url_col(F.col(url_col_name))
    return df.withColumn(url_col_name, canon).withColumn(
        "url_hash", url_hash_col(F.col(url_col_name))
    ).withColumn("host", host_col(F.col(url_col_name)))


# ------------------------------------------- RFC 3986 §6 full normalization
def full_canonical_url_col(url: Column) -> Column:
    """Syntax-based normalization (RFC 3986 §6.2.2-6.2.3) beyond the
    reference's fragment/.html cut — the dedup lever a general crawler
    needs, since ``HTTP://Host.Example:80/a?b=1&a=2#f`` and
    ``http://host.example/a?a=2&b=1`` are the same resource:

    - scheme and host lowercased (case-insensitive by spec)
    - default port stripped (``:80`` for http, ``:443`` for https)
    - fragment dropped
    - query parameters sorted bytewise (``&``-split; key order is not
      semantic for the overwhelming majority of endpoints, and sorting
      is what makes the seen-set key stable across link spellings)
    - empty query string dropped (trailing ``?``)

    Pure built-in expressions (codegen); mirrored verbatim by the
    q_url_canon_full DuckDB oracle.  Percent-encoding normalization is
    deliberately out of scope (needs a char-level decoder; the corpus
    keys it would merge are rare vs case/port/param-order variants)."""
    scheme = F.lower(F.regexp_extract(url, r"^([a-zA-Z][a-zA-Z0-9+.-]*)://", 1))
    authority = F.regexp_extract(url, r"^[a-zA-Z][a-zA-Z0-9+.-]*://([^/?#]*)", 1)
    # drop userinfo ('user:pass@host') BEFORE the host/port split — its
    # ':' is not a port separator, and credentials never belong in a
    # canonical dedup key; substring_index(-1) takes after the LAST '@'
    # (userinfo may not contain a bare '@', so last == the separator)
    hostport = F.lower(F.substring_index(authority, "@", -1))
    # bracketed IPv6 literals ([::1], [2001:db8::2]:8080) carry ':' inside
    # the host — split on ']:' for those, plain ':' otherwise
    is_v6 = hostport.startswith("[")
    host = F.when(is_v6, F.regexp_extract(hostport, r"^(\[[^\]]*\])", 1)).otherwise(
        F.substring_index(hostport, ":", 1)
    )
    port = F.when(is_v6, F.regexp_extract(hostport, r"\]:(.*)$", 1)).otherwise(
        F.when(hostport.contains(":"), F.substring_index(hostport, ":", -1)).otherwise(F.lit(""))
    )
    keep_port = (port != "") & ~(
        ((scheme == "http") & (port == "80")) | ((scheme == "https") & (port == "443"))
    )
    path = F.regexp_extract(url, r"^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*([^?#]*)", 1)
    # query = after the first '?' of the PRE-FRAGMENT part only — a '?'
    # inside the fragment ('/a#f?x') is fragment text, not a query
    query = F.regexp_extract(F.substring_index(url, "#", 1), r"\?(.*)$", 1)
    qsorted = F.array_join(F.array_sort(F.split(query, "&")), "&")
    # schemeless/relative inputs pass through unchanged — without this
    # guard they reassembled to a '://'-prefixed fragment (r3 ADVICE);
    # the q_url_canon_full oracle mirrors the same short-circuit
    return F.when(scheme == "", url).otherwise(
        F.concat(
            scheme,
            F.lit("://"),
            host,
            F.when(keep_port, F.concat(F.lit(":"), port)).otherwise(F.lit("")),
            path,
            F.when(qsorted != "", F.concat(F.lit("?"), qsorted)).otherwise(F.lit("")),
        )
    )


# --------------------------------------------------------------- Python side
def canonical_url(url: str) -> str:
    """Exact Python mirror of :func:`canonical_url_col`."""
    url = url.split("#", 1)[0]
    i = url.find(HTML_SUFFIX)
    return url[:i] if i >= 0 else url


def url_hash(url_canonical: str) -> int:
    return xxhash64_str(url_canonical)


_URL_RE = re.compile(r"^[a-zA-Z][a-zA-Z0-9+.-]*://([^/?#]*)(.*)$", re.S)


def host_of(url: str) -> str:
    m = _URL_RE.match(url)
    return m.group(1) if m else ""


def path_of(url: str) -> str:
    """Everything after the authority (incl. query and any fragment) —
    exact mirror of :func:`path_col`; the engine only ever applies it to
    canonical URLs, whose fragment is already stripped."""
    m = _URL_RE.match(url)
    return m.group(2) if m else ""
