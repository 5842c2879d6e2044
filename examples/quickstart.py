#!/usr/bin/env python
"""Quickstart: the engine's main surfaces in one runnable script.

    python examples/quickstart.py [SF_DIR]

Covers: session bootstrap, star-schema scan, a SQL and a DataFrame
query, the SCD2 curation pipeline on the snapshot table layer (bulk
insert → merge → late arrival → time travel → compaction), and a
training-data op (exact dedup).
"""

from __future__ import annotations

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from iceberg_evaluation_spark.operators.dedup import exact_dedup
from iceberg_evaluation_spark.operators.scd2 import bulk_insert, scd2_complex
from iceberg_evaluation_spark.session import get_spark
from iceberg_evaluation_spark.sources import load_table, register_star_schema
from iceberg_evaluation_spark.tables.snapshot_table import SnapshotTable


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark(app_name="quickstart")

    # --- query surface: SQL and DataFrame front doors share one optimizer
    register_star_schema(spark, sf_dir)
    print("== top nations by customers (SQL) ==")
    spark.sql(
        """
        SELECT n_name, count(*) AS n FROM customer
        JOIN nation ON c_nationkey = n_nationkey
        GROUP BY n_name ORDER BY n DESC, n_name LIMIT 5
        """
    ).show()

    print("== revenue by return flag (DataFrame) ==")
    li = load_table(spark, sf_dir, "lineitem")
    li.groupBy("l_returnflag").agg(
        F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
            "revenue"
        )
    ).orderBy("l_returnflag").show()

    # --- curation surface: SCD2 over the snapshot table layer
    print("== SCD2 pipeline ==")
    orders = load_table(spark, sf_dir, "orders")
    feed = orders.select(
        F.col("o_orderkey").alias("pk"),
        F.col("o_orderdate").alias("extraction_timestamp"),
        F.col("o_totalprice").alias("price"),
    )
    table = SnapshotTable(spark, tempfile.mkdtemp(prefix="quickstart_scd2_"))
    bulk_insert(table, feed)
    updates = feed.filter(F.col("pk") % 50 == 0).withColumn(
        "extraction_timestamp", F.col("extraction_timestamp") + F.expr("INTERVAL 60 DAYS")
    )
    scd2_complex(table, updates)
    late = feed.filter(F.col("pk") % 100 == 0).withColumn(
        "extraction_timestamp", F.col("extraction_timestamp") + F.expr("INTERVAL 30 DAYS")
    )
    scd2_complex(table, late)  # late arrival splices between versions
    print("history:")
    table.history().show(truncate=False)
    v1_rows = table.read(version=1).count()
    now_rows = table.read().count()
    print(f"rows at v1={v1_rows}, now={now_rows}")
    table.compact()
    print(f"rows after compaction={table.read().count()} (unchanged)")

    # --- training-data surface: exact dedup over documents
    print("== exact dedup survivors ==")
    docs = load_table(spark, sf_dir, "documents")
    exact_dedup(docs, "text", "doc_id").orderBy("doc_id").show(5)

    spark.stop()


if __name__ == "__main__":
    main()
