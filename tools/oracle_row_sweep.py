#!/usr/bin/env python
"""De-vacuization sweep (r9 verdict #5): run every registered oracle in
DuckDB and list queries whose verified result is EMPTY or near-empty —
a rows+schema+hash match on a 0-row result barely verifies anything, so
every registered query must verify a non-trivial result at the driver's
checked sf.

    python tools/oracle_row_sweep.py [--sf /root/testdata/sf0.01] [--max-rows 2]

Exit code 1 if any oracle returns 0 rows (the hard failure class);
near-empty (1..max_rows) results are listed for judgment but don't fail
— some receipts are legitimately single-row scalars only when the query
registers per-group rows elsewhere.
"""

from __future__ import annotations

import argparse
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    ap.add_argument("--max-rows", type=int, default=2)
    ap.add_argument("--names", default=None, help="comma-separated subset")
    args = ap.parse_args()

    import duckdb

    from iceberg_evaluation_spark.plans import all_oracles

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"'{os.path.join(args.sf, t + '.parquet')}'"
        )
    oracles = all_oracles()
    if args.names:
        want = set(args.names.split(","))
        oracles = {k: v for k, v in oracles.items() if k in want}
    empty, thin = [], []
    for name, sql in oracles.items():
        try:
            n = con.execute(
                f"SELECT count(*) FROM ({sql}) _q"
            ).fetchone()[0]
        except Exception as e:  # noqa: BLE001 — report, keep sweeping
            print(f"{name}: ERR {type(e).__name__}: {e}")
            empty.append(name)
            continue
        if n == 0:
            empty.append(name)
            print(f"{name}: EMPTY")
        elif n <= args.max_rows:
            thin.append((name, n))
            print(f"{name}: thin ({n} rows)")
    print(
        f"\n{len(oracles)} oracles swept at {args.sf}: "
        f"{len(empty)} empty, {len(thin)} thin (<= {args.max_rows} rows)"
    )
    return 1 if empty else 0


if __name__ == "__main__":
    sys.exit(main())
