"""Oracle dtype-parity audit: for every oracle-backed query, compare the
Spark result schema's type KIND (int/float/bool/other) per column against
the DuckDB oracle result's pandas dtype kind at sf0.001.

The driver's CORRECTNESS hasher distinguishes int64 from float64 even when
values are numerically identical (the r3 ``q_rollup`` failure: DuckDB
``sum(BIGINT)`` -> HUGEINT -> float64 vs Spark int64), so any kind
mismatch here is a latent driver hash failure.  Run ad hoc:

    python scripts/dtype_parity.py [sf_dir]
"""

from __future__ import annotations

import sys

import duckdb

sys.path.insert(0, "/root/repo")

from crawler_spark import contract
from crawler_spark.session import get_spark


def spark_kind(dt: str) -> str:
    d = dt.lower()
    if d in ("tinyint", "smallint", "int", "bigint", "long", "integer", "short", "byte"):
        return "i"
    if d in ("float", "double", "decimal") or d.startswith("decimal"):
        return "f"
    if d == "boolean":
        return "b"
    return "o"


def pandas_kind(dtype, col) -> str:
    k = dtype.kind
    if k in ("i", "u"):
        return "i"
    if k == "f":
        return "f"
    if k == "b":
        return "b"
    return "o"


def main() -> int:
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark("dtype-parity", master="local[8]")
    con = duckdb.connect()
    for t in contract.TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf}/{t}.parquet')"
        )
    bad = []
    for name, sql in contract.ORACLES.items():
        sdf = contract.QUERIES[name](spark, sf)
        skinds = {c: spark_kind(t) for c, t in sdf.dtypes}
        pdf = con.sql(sql).df()
        for c in pdf.columns:
            dk = pandas_kind(pdf[c].dtype, pdf[c])
            sk = skinds.get(c)
            if sk is None:
                bad.append((name, c, "MISSING-ON-SPARK", dk))
                continue
            if sk == dk:
                continue
            # nullable-int upcast: duck emits float64 for an int column that
            # contains NULLs -- only a real mismatch if no nulls present
            if sk == "i" and dk == "f" and pdf[c].isna().any():
                continue
            bad.append((name, c, sk, dk))
    for row in bad:
        print("MISMATCH %-28s col=%-20s spark=%s duck=%s" % row)
    print(f"{len(bad)} mismatches across {len(contract.ORACLES)} oracles")
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
