"""Local replica of the driver's DuckDB-oracle comparison.

Semantics mirrored from the driver contract: run the Spark query and the
oracle SQL on the same parquet tables, then compare row count, column
names, and order-insensitive values (columns sorted by name, rows sorted
by all columns). Values are normalized: timestamps → ISO microsecond
strings, floats kept exact (queries round at the output boundary),
NaN/None unified. Stricter than or equal to the driver's hash check.
"""

from __future__ import annotations

import math
import os
from datetime import date, datetime
from decimal import Decimal

import duckdb

from iceberg_evaluation_spark.sources import TABLES


def duck_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        path = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(path):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{path}'")
    return con


def _norm_cell(v, strict: bool = True):
    """Normalize a cell for comparison.

    strict=True mirrors the driver's hash discipline: DECIMAL results keep
    their type identity (a Spark DECIMAL never matches a DuckDB DOUBLE even
    when numerically equal — exactly the q64/q67 class of bug the round-1
    driver caught and the old round-to-9/int-float forgiveness masked), and
    floats compare at full repr precision. strict=False is the old loose
    behavior, retained only for intra-engine comparisons where decimal-vs-
    double drift is representational (sql/*.sql text vs DataFrame twin).
    """
    if v is None:
        return "<null>"
    if isinstance(v, Decimal):
        if strict:
            return "dec:" + format(v.normalize(), "f")
        v = float(v)
    if isinstance(v, float):
        if math.isnan(v):
            return "<nan>"
        if not strict:
            if v == int(v) and abs(v) < 2**53:
                return str(int(v))  # unify 3.0 (double) vs 3 (int) drift
            return repr(round(v, 9))
        return repr(v)
    if isinstance(v, datetime):
        return v.replace(tzinfo=None).isoformat(timespec="microseconds")
    if isinstance(v, date):
        return v.isoformat()
    if isinstance(v, bool):
        return str(int(v))
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(_norm_cell(x, strict) for x in v) + "]"
    return str(v)


def normalize_rows(
    columns: list[str], rows: list[tuple], strict: bool = True
) -> list[tuple]:
    order = sorted(range(len(columns)), key=lambda i: columns[i])
    out = [tuple(_norm_cell(r[i], strict) for i in order) for r in rows]
    out.sort()
    return out


def compare_query(spark, name: str, spark_fn, oracle: str, sf_dir: str) -> list[str]:
    """Return a list of human-readable mismatch descriptions (empty = pass)."""
    problems: list[str] = []
    sdf = spark_fn(spark, sf_dir)
    s_cols = list(sdf.columns)
    s_rows = [tuple(r) for r in sdf.collect()]

    con = duck_connection(sf_dir)
    try:
        res = con.execute(oracle)
        d_cols = [d[0] for d in res.description]
        d_rows = [tuple(r) for r in res.fetchall()]
    finally:
        con.close()

    if sorted(s_cols) != sorted(d_cols):
        problems.append(f"{name}: columns differ spark={sorted(s_cols)} duck={sorted(d_cols)}")
        return problems
    if len(s_rows) != len(d_rows):
        problems.append(f"{name}: rowcount spark={len(s_rows)} duck={len(d_rows)}")
    sn = normalize_rows(s_cols, s_rows)
    dn = normalize_rows(d_cols, d_rows)
    if sn != dn:
        diff_s = [r for r in sn if r not in set(dn)][:3]
        diff_d = [r for r in dn if r not in set(sn)][:3]
        problems.append(
            f"{name}: values differ; spark-only={diff_s} duck-only={diff_d}"
        )
    return problems
