"""Physical-plan quality gates — the 100 TB design assertions.

A query that is correct but scans all columns, skips pushdown, or
sort-merge-joins a broadcastable dimension is a regression even when the
answer matches; these tests pin the plan shapes that matter at scale
(SURVEY §4: pushdown/pruning built-in, broadcast dims, top-k via
TakeOrderedAndProject)."""

from __future__ import annotations

from iceberg_evaluation_spark.plans import REGISTRY


def _formatted_plan(spark, name: str, sf_dir: str) -> str:
    df = REGISTRY[name].spark(spark, sf_dir)
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    return df._jdf.queryExecution().explainString(mode)


def test_filter_pushdown_reaches_parquet(spark, sf_correct):
    plan = _formatted_plan(spark, "q01_pricing_summary", sf_correct)
    assert "LessThanOrEqual(l_shipdate" in plan  # predicate at the scan


def test_column_pruning(spark, sf_correct):
    plan = _formatted_plan(spark, "q01_pricing_summary", sf_correct)
    # lineitem has 11 columns; the scan must read only the 6 used
    read = [l for l in plan.splitlines() if "ReadSchema" in l][0]
    assert "l_orderkey" not in read and "l_partkey" not in read
    assert "l_quantity" in read and "l_shipdate" in read


def test_dimension_joins_broadcast(spark, sf_correct):
    plan = _formatted_plan(spark, "q02_top_brand_revenue", sf_correct)
    assert plan.count("BroadcastHashJoin") >= 2  # part and supplier
    assert "SortMergeJoin" not in plan


def test_topk_is_take_ordered(spark, sf_correct):
    plan = _formatted_plan(spark, "q02_top_brand_revenue", sf_correct)
    assert "TakeOrderedAndProject" in plan  # ORDER BY + LIMIT fused, no global sort


def test_semi_anti_joins_planned(spark, sf_correct):
    semi = _formatted_plan(spark, "q14_exists_semi_join", sf_correct)
    anti = _formatted_plan(spark, "q15_not_exists_anti_join", sf_correct)
    assert "LeftSemi" in semi
    assert "LeftAnti" in anti


def test_pricing_summary_single_scan_partial_agg(spark, sf_correct):
    plan = _formatted_plan(spark, "q01_pricing_summary", sf_correct)
    # map-side partial aggregation before the shuffle (two HashAggregate levels)
    assert plan.count("HashAggregate") >= 2
    # formatted mode prints each node twice (tree + details) → one scan = 2
    assert plan.count("Scan parquet") == 2
