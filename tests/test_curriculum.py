"""Curriculum export (operators/curriculum) — r5 verdict #6: adversarial
score distributions and the broken-partitioner mutation."""

from __future__ import annotations

from pyspark.sql import functions as F

from iceberg_evaluation_spark.operators.curriculum import (
    curriculum_invariants,
    curriculum_shards,
)


def _invariants(spark, rows, n_shards):
    docs = spark.createDataFrame(rows, "doc_id bigint, score bigint")
    sharded = curriculum_shards(docs, "score", "doc_id", n_shards)
    return curriculum_invariants(sharded, "score", "doc_id", n_shards).collect()[0]


def test_empty_input_is_well_defined(spark):
    """ADVICE r5: aggregates over zero shards must yield 0/0/true/0,
    not NULLs (a fully filtered corpus is a legitimate input)."""
    docs = spark.createDataFrame([], "doc_id bigint, score bigint")
    sharded = curriculum_shards(docs, "score", "doc_id", 8)
    row = curriculum_invariants(sharded, "score", "doc_id", 8).collect()[0]
    assert row["total_rows"] == 0
    assert row["sum_score"] == 0
    assert row["shards_within_bound"] is True
    assert row["boundary_violations"] == 0


def test_all_equal_scores_collapse_without_violations(spark):
    """Degenerate distribution: every score identical. RangePartitioner
    may collapse to few shards (the id tiebreak still splits); the
    contract — nothing lost, <= n shards, zero overlaps — must hold."""
    rows = [(i, 42) for i in range(500)]
    row = _invariants(spark, rows, 16)
    assert row["total_rows"] == 500
    assert row["sum_score"] == 500 * 42
    assert row["shards_within_bound"] is True
    assert row["boundary_violations"] == 0


def test_planted_skew_holds_invariants(spark):
    """90% of rows share one hot score; the rest spread. Skewed range
    boundaries must still lose nothing and keep intervals disjoint."""
    rows = [(i, 7) for i in range(900)] + [
        (900 + i, int(i * 13 + 1000)) for i in range(100)
    ]
    row = _invariants(spark, rows, 16)
    assert row["total_rows"] == 1000
    assert row["sum_score"] == 900 * 7 + sum(i * 13 + 1000 for i in range(100))
    assert row["shards_within_bound"] is True
    assert row["boundary_violations"] == 0


def test_single_row_and_fewer_rows_than_shards(spark):
    row = _invariants(spark, [(1, 5)], 16)
    assert row["total_rows"] == 1 and row["boundary_violations"] == 0
    row = _invariants(spark, [(i, i * 3) for i in range(5)], 16)
    assert row["total_rows"] == 5 and row["boundary_violations"] == 0
    assert row["shards_within_bound"] is True


def test_broken_partitioner_mutation_is_caught(spark):
    """The invariants must be LOAD-BEARING: a hash-style (non-range)
    shard assignment of the same rows has overlapping shard intervals
    and must fail the boundary check."""
    docs = spark.createDataFrame(
        [(i, int(i * 11 % 97)) for i in range(300)], "doc_id bigint, score bigint"
    )
    broken = docs.withColumn("shard", (F.col("doc_id") % 8).cast("int"))
    row = curriculum_invariants(broken, "score", "doc_id", 8).collect()[0]
    assert row["total_rows"] == 300  # conservation still holds...
    assert row["boundary_violations"] > 0  # ...but the ordering is caught


def test_dropped_rows_mutation_is_caught(spark):
    """A lossy shuffle (simulated row drop) must fail conservation."""
    docs = spark.createDataFrame(
        [(i, i) for i in range(100)], "doc_id bigint, score bigint"
    )
    sharded = curriculum_shards(docs, "score", "doc_id", 8).filter("doc_id <> 50")
    row = curriculum_invariants(sharded, "score", "doc_id", 8).collect()[0]
    assert row["total_rows"] == 99 != 100
    assert row["sum_score"] == sum(range(100)) - 50


def test_export_plan_has_exactly_one_exchange(spark, sf_correct):
    """r5 verdict #6: the EXPORT itself (shard + within-shard sort) is
    ONE wide range shuffle — the sort rides the shuffle read; a second
    exchange or a global single-partition sort is a scale regression."""
    import re

    from iceberg_evaluation_spark.sources import load_table

    docs = load_table(spark, sf_correct, "documents").select(
        "doc_id", F.length("text").cast("bigint").alias("difficulty")
    )
    df = curriculum_shards(docs, "difficulty", "doc_id", 16)
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "formatted"
    )
    plan = df._jdf.queryExecution().explainString(mode)
    n_exchanges = len(re.findall(r"^\(\d+\) Exchange", plan, re.M))
    assert n_exchanges == 1, f"expected 1 shuffle, plan has {n_exchanges}"
    assert "rangepartitioning" in plan
    assert plan.count("Sort") >= 2  # within-shard sort present (tree+detail)
