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
    columns (alias on the right beforehand).

    Value columns travel as ONE struct through the window: the struct
    is non-null for every right row even when its members are null, so
    (a) a genuinely-NULL right value is carried as NULL instead of
    leaking the previous right row's value past it, and (b) all value
    columns always come from the SAME matched right row."""
    on = list(on)
    value_cols = list(value_cols)
    clash = set(value_cols) & set(left.columns)
    if clash:
        raise ValueError(f"value_cols collide with left columns: {sorted(clash)}")

    vals = "_asof_vals"
    l_tagged = left.withColumn(_SIDE, F.lit(1))
    r_tagged = right.select(
        *on, ts_col, F.struct(*value_cols).alias(vals)
    ).withColumn(_SIDE, F.lit(0))
    both = l_tagged.unionByName(r_tagged, allowMissingColumns=True)

    w = (
        Window.partitionBy(*on)
        .orderBy(F.col(ts_col).asc(), F.col(_SIDE).asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = both.withColumn(vals, F.last(vals, ignorenulls=True).over(w))
    return (
        filled.filter(F.col(_SIDE) == 1)
        .select(
            *left.columns,
            *[F.col(f"{vals}.{c}").alias(c) for c in value_cols],
        )
    )


def interval_join(
    points: DataFrame,
    intervals: DataFrame,
    on: Sequence[str],
    point_col: str,
    lo_col: str,
    hi_col: str,
    cell_width: int,
) -> DataFrame:
    """Point-in-interval (range) join: every (point, interval) pair with
    equal ``on`` keys and ``lo <= point < hi`` — emitted once per pair,
    overlapping intervals give multiple rows.

    The naive ``join(keys) .filter(lo <= p < hi)`` plans as an equi join
    whose per-key output is |points_k| x |intervals_k| BEFORE the range
    filter — quadratic in hot keys.  Grid bucketing makes the join key
    selective: intervals explode to the cells they cover (bounded by
    ceil(len/cell_width)+1 rows each), points hash to their single cell,
    and the equi join runs on (keys..., cell) with the exact range
    predicate applied after.  Each qualifying pair meets in EXACTLY one
    cell (the point's), so no dedup pass is needed.  Pick ``cell_width``
    near the typical interval length: wider cells degrade toward the
    naive join, narrower cells grow the interval explosion.

    Numeric columns only (cast timestamps to epoch seconds first);
    empty/inverted intervals (hi <= lo) match nothing and are dropped
    before the explode."""
    on = list(on)
    iv = intervals.filter(F.col(hi_col) > F.col(lo_col))
    # half-open [lo, hi): the last covered cell is floor((hi-1)/w)
    iv_cells = iv.withColumn(
        "_cell",
        F.explode(
            F.sequence(
                F.floor(F.col(lo_col) / cell_width),
                F.floor((F.col(hi_col) - 1) / cell_width),
            )
        ),
    )
    pt_cells = points.withColumn("_cell", F.floor(F.col(point_col) / cell_width))
    return (
        pt_cells.join(iv_cells, [*on, "_cell"])
        .filter(
            (F.col(point_col) >= F.col(lo_col)) & (F.col(point_col) < F.col(hi_col))
        )
        .drop("_cell")
    )
