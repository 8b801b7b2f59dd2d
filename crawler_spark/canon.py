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
