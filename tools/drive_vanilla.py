#!/usr/bin/env python
"""Replicate the external driver end-to-end: import __spark_entry__ under
a VANILLA SparkSession (none of session.get_spark's tuned configs, cwd
outside the repo) and hash-compare every queries() entry against its
oracle_sql() twin in DuckDB at sf0.01.

This catches the class of bug tests/ cannot: config-dependent results
(timezone, ANSI, AQE), and Python-stage closures that unpickle under
pytest's cwd but not under a foreign driver.

    python tools/drive_vanilla.py [--names q93,q94] [--sf /root/testdata/sf0.01]
"""

from __future__ import annotations

import argparse
import math
import os
import sys
from collections import Counter
from datetime import date, datetime
from decimal import Decimal

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def _norm(v):
    if v is None:
        return "<null>"
    if isinstance(v, Decimal):
        return "dec:" + format(v.normalize(), "f")
    if isinstance(v, float):
        return "<nan>" if math.isnan(v) else repr(v)
    if isinstance(v, datetime):
        return v.replace(tzinfo=None).isoformat(timespec="microseconds")
    if isinstance(v, date):
        return v.isoformat()
    return str(v)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--names", default=None, help="comma-separated subset")
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    args = ap.parse_args()

    os.chdir("/tmp")  # a foreign driver does not run from the repo root
    import duckdb
    from pyspark.sql import SparkSession

    spark = SparkSession.builder.master("local[16]").getOrCreate()  # VANILLA
    spark.sparkContext.setLogLevel("ERROR")
    import __spark_entry__ as e

    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(args.sf, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")

    qs, oracles = e.queries(), e.oracle_sql()
    names = args.names.split(",") if args.names else list(qs)
    print(f"entry rows: {len(e.entry(spark).collect())}; driving {len(names)} queries")

    n_fail = 0
    for name in names:
        try:
            sdf = qs[name](spark, args.sf)
            scols = sorted(sdf.columns)
            srows = Counter(
                tuple(_norm(r[c]) for c in scols) for r in sdf.collect()
            )
            if name not in oracles:
                print(f"{name}: rows-only ({sum(srows.values())} rows)")
                continue
            # fetchall, not .df(): pandas would coerce DATE → Timestamp and
            # BIGINT-with-NULLs → float, poisoning the normalized compare
            res = con.execute(oracles[name])
            d_cols = [d[0] for d in res.description]
            ocols = sorted(d_cols)
            order = sorted(range(len(d_cols)), key=lambda i: d_cols[i])
            orows = Counter(
                tuple(_norm(r[i]) for i in order) for r in res.fetchall()
            )
            if scols != ocols:
                n_fail += 1
                print(f"{name}: SCHEMA_FAIL {scols} vs {ocols}")
            elif srows != orows:
                n_fail += 1
                print(f"{name}: HASH_FAIL ({sum(srows.values())} vs {sum(orows.values())} rows)")
                for k in list((srows - orows) + (orows - srows))[:2]:
                    print(f"  diff: {k}")
            else:
                print(f"{name}: OK ({sum(srows.values())} rows)")
        except Exception as ex:  # noqa: BLE001 — report and keep driving
            n_fail += 1
            print(f"{name}: ERR {type(ex).__name__}: {str(ex)[:160]}")
    print(f"\n{len(names) - n_fail}/{len(names)} green")
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
