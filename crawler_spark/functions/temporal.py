"""Temporal joins Spark lacks as built-ins, expressed as compositions
of shuffle-once DataFrame ops (graft brief: custom operators prefer
composition over UDFs).

``asof_join`` — for every left row, the single right row with the
greatest ``ts <= left.ts`` within the same key (pandas
``merge_asof(direction="backward")`` / DuckDB ``ASOF JOIN`` semantics,
ties inclusive).  The naive formulations both die at scale: an
inequality join explodes to O(|L|·|R|) pairs before the per-key argmax,
and a per-key ``mapPartitions`` merge gives up Catalyst.  This one is a
UNION + one window:

    tag right rows side=0, left rows side=1
    union on (key, ts, side)
    per-key window ordered by (ts, side):
        last(value, ignorenulls=True) over rows unbounded..current
    keep side=1 rows

One shuffle (the window's partitionBy key), value columns carried as
nulls on the left side, right-before-left at equal ts gives the
inclusive ``<=``.  AQE's skew handling applies to the single exchange.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_SIDE = "_asof_side"


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    ts_col: str,
    value_cols: Sequence[str],
) -> DataFrame:
    """Left as-of join: every ``left`` row, plus ``value_cols`` from the
    latest ``right`` row with ``right.ts_col <= left.ts_col`` and equal
    ``on`` keys (NULLs when no such row — left-join semantics).

    ``right`` must be unique per ``(on, ts_col)`` — with duplicates the
    winner would depend on partition order; callers dedup first (e.g.
    ``groupBy(on, ts).agg(max(...))``), which is also what makes a SQL
    oracle well-defined.  ``value_cols`` must not collide with ``left``
    columns (alias on the right beforehand)."""
    on = list(on)
    value_cols = list(value_cols)
    clash = set(value_cols) & set(left.columns)
    if clash:
        raise ValueError(f"value_cols collide with left columns: {sorted(clash)}")

    l_tagged = left.withColumn(_SIDE, F.lit(1))
    r_tagged = right.select(*on, ts_col, *value_cols).withColumn(_SIDE, F.lit(0))
    both = l_tagged.unionByName(r_tagged, allowMissingColumns=True)

    w = (
        Window.partitionBy(*on)
        .orderBy(F.col(ts_col).asc(), F.col(_SIDE).asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = both.select(
        *[c for c in both.columns if c not in value_cols],
        *[F.last(c, ignorenulls=True).over(w).alias(c) for c in value_cols],
    )
    return filled.filter(F.col(_SIDE) == 1).drop(_SIDE)
