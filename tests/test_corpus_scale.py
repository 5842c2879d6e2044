"""Physical pins for the execution-infrastructure corpus (q75–q78).

Value correctness is covered by test_oracle_parity (and the driver);
these tests pin the claims that make the queries worth registering —
the salt actually spreads the join key, and the bucketed join actually
skips the shuffle.
"""

from __future__ import annotations

import re

from iceberg_evaluation_spark.plans import REGISTRY


def _plan(spark, name: str, sf_dir: str) -> str:
    df = REGISTRY[name].spark(spark, sf_dir)
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "formatted"
    )
    return df._jdf.queryExecution().explainString(mode)


def test_salted_join_key_includes_salt(spark, sf_smoke):
    plan = _plan(spark, "q77_salted_skew_join", sf_smoke)
    assert "__salt" in plan  # join key is (l_suppkey, __salt), not bare key
    assert "Cartesian" not in plan and "BroadcastNestedLoop" not in plan


def test_bucketed_join_has_single_exchange(spark, sf_smoke):
    """The orders⋈lineitem join must ride the bucket layout — the ONLY
    Exchange allowed is the one for the o_orderpriority re-aggregation
    (a different key than the bucketing key, so it must shuffle).

    At test scale AQE correctly prefers broadcasting the tiny orders
    side, which also skips the shuffle; broadcast is disabled here to
    expose the layout claim the query makes at fact-fact scale."""
    thresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        plan = _plan(spark, "q78_bucketed_colocated_join", sf_smoke)
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", thresh)
    exchanges = re.findall(r"^\(\d+\) Exchange", plan, re.M)
    assert len(exchanges) == 1, plan
    assert "SortMergeJoin" in plan


def test_streaming_queries_return_batch_results(spark, sf_smoke):
    """q75/q76 drain a real streaming job at build time and hand back a
    plain memory-sink table — re-reading the returned DataFrame must be
    stable (the sink is fully drained, not still filling)."""
    for name in ("q75_streaming_dedup", "q76_streaming_window_totals"):
        df = REGISTRY[name].spark(spark, sf_smoke)
        assert df.count() == df.count() > 0
