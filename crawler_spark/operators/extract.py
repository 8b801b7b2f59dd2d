"""Scalar extraction operators (SURVEY.md §2.2, P3-P6).

All JVM-side built-in expressions (whole-stage codegen) — the reference
implements these as Go string functions:

- P3 ``extract_number``  — otodom/commons/extensions.go:10-17: regex-
  extract every digit run and concatenate ("1 100 zł /mc" → "1100");
  empty string when no digit.  Equivalent to deleting all non-digits.
- P4 ``take_before``     — otodom/commons/extensions.go:20-22: prefix
  before the first occurrence of a literal.  The reference panics when
  the literal is absent; we pin substring_index semantics (whole string).
- P5 ``with_page_param`` — otodom/total_pages/handler.go:54-60: append
  ``?page=i`` or ``&page=i`` depending on whether the URL has a query.
- P6 ``safe_int``        — otodom/total_pages/handler.go:30-43:
  strconv.Atoi with skip-on-error → try_cast + isNotNull filter.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def extract_number(col: Column | str) -> Column:
    """P3: concatenation of all digit runs ('' when no digit)."""
    return F.regexp_replace(col, r"[^0-9]", "")


def take_before(col: Column | str, literal: str) -> Column:
    """P4: prefix before first *literal*; whole string when absent."""
    return F.substring_index(col, literal, 1)


def with_page_param(url: Column | str, page: Column) -> Column:
    """P5: url + ('&' if '?' in url else '?') + 'page=' + page."""
    url = F.col(url) if isinstance(url, str) else url
    sep = F.when(url.contains("?"), F.lit("&page=")).otherwise(F.lit("?page="))
    return F.concat(url, sep, page.cast("string"))


def safe_int(col: Column | str) -> Column:
    """P6: parse int, NULL on failure (caller filters isNotNull to skip)."""
    return (F.col(col) if isinstance(col, str) else col).try_cast("int")
