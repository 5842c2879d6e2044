"""Every sql/*.sql file must produce the SAME multiset of rows as the
DataFrame-API query registered under the same name — the two front
doors of the engine stay in lockstep (and the threaded harness works).
"""

from __future__ import annotations

import os

import pytest

from iceberg_evaluation_spark.plans import REGISTRY
from iceberg_evaluation_spark.plans.sql_corpus import list_sql_files, run_sql_corpus
from iceberg_evaluation_spark.sources import register_star_schema

SQL_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "sql")
NAMES = [os.path.basename(p)[:-4] for p in list_sql_files(SQL_DIR)]


def _norm(columns, rows):
    # Decimal-vs-double and timestamp formatting are representation, not
    # semantics (SQL's `x / 100.0` is DECIMAL, the DataFrame path DOUBLE)
    from tests.oracle_compare import _norm_cell

    order = sorted(range(len(columns)), key=lambda i: columns[i])
    return sorted(tuple(_norm_cell(r[i], strict=False) for i in order) for r in rows)


@pytest.mark.parametrize("name", NAMES)
def test_sql_file_matches_dataframe_query(spark, sf_smoke, name):
    assert name in REGISTRY, f"sql/{name}.sql has no registered DataFrame twin"
    register_star_schema(spark, sf_smoke)
    sql_df = spark.sql(open(os.path.join(SQL_DIR, f"{name}.sql")).read())
    api_df = REGISTRY[name].spark(spark, sf_smoke)
    assert sorted(sql_df.columns) == sorted(api_df.columns)
    assert _norm(sql_df.columns, sql_df.collect()) == _norm(
        api_df.columns, api_df.collect()
    )


def test_threaded_harness_runs_corpus(spark, sf_smoke):
    stats = run_sql_corpus(spark, sf_smoke, SQL_DIR, iterations=1, max_threads=8)
    assert len(stats) == len(NAMES)
    failed = {n: s.error for n, s in stats.items() if s.error}
    assert not failed, failed
