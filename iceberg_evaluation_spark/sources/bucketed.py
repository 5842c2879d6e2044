"""Bucketed table sink — pre-shuffled storage for co-located joins.

At 100 TB the dominant recurring cost of fact-fact joins (lineitem ⋈
orders every day) is re-shuffling both sides on the join key. Bucketing
pays that shuffle ONCE at write time: ``bucketBy(n, key)`` hash-
partitions rows into n files per partition, records the layout in the
catalog, and every later equi-join/aggregation on the key reads the
bucket layout as a valid hash distribution — the plan shows NO Exchange
(pinned by tests/test_bucketed.py).

Bucket count sizing: target ≈ table_size / (executor-digestible
128–512 MB) and keep both join sides at the SAME count (or integer
multiples, with ``spark.sql.bucketing.coalesceBucketsInJoin.enabled``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

__all__ = ["write_bucketed", "read_bucketed"]


def write_bucketed(
    df: DataFrame,
    table_name: str,
    path: str,
    bucket_cols: list[str],
    n_buckets: int = 16,
    sort_cols: list[str] | None = None,
) -> None:
    """Materialize ``df`` as a bucketed (optionally sort-within-bucket)
    parquet table registered in the session catalog at ``path``.

    Sorting by the join key lets SortMergeJoin skip its sort stage too —
    the join becomes a pure zip of pre-sorted buckets.
    """
    writer = (
        df.write.mode("overwrite")
        .format("parquet")
        .option("path", path)
        .bucketBy(n_buckets, *bucket_cols)
    )
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    writer.saveAsTable(table_name)


def read_bucketed(spark: SparkSession, table_name: str) -> DataFrame:
    """Catalog scan of a bucketed table (S2) — the bucket layout rides
    along and satisfies downstream hash requirements."""
    return spark.table(table_name)
