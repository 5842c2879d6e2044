"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` smoke-runs the flagship query at sf0.001;
``queries()`` / ``oracle_sql()`` expose the full registry from
``iceberg_evaluation_spark.plans`` (one entry per implemented operator
from SURVEY.md §2 plus the training-data pipeline surface). Oracle SQL
is DuckDB dialect, column-name-aligned with the Spark results.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from iceberg_evaluation_spark.plans import all_oracles, all_queries  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    from iceberg_evaluation_spark.plans import REGISTRY

    return REGISTRY["q01_pricing_summary"].spark(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator query from SURVEY.md §2."""
    return all_queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-dialect oracle SQL for every SQL-expressible query."""
    return all_oracles()
