"""functions.scalar: scalar-output actions run AQE-free but leave the
session exactly as found — including on failure — and return the same
results as plain collect."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from iceberg_evaluation_spark.functions.scalar import (
    scalar_collect,
    scalar_count,
    scalar_first,
)

_KEY = "spark.sql.adaptive.enabled"


def test_results_match_plain_collect_and_conf_restored(spark):
    df = spark.range(1000).withColumn("g", F.col("id") % 7)
    agg = df.groupBy("g").agg(F.count(F.lit(1)).alias("n"), F.sum("id").alias("s"))
    assert spark.conf.get(_KEY) == "true"
    got = {(r["g"], r["n"], r["s"]) for r in scalar_collect(agg)}
    want = {(r["g"], r["n"], r["s"]) for r in agg.collect()}
    assert got == want
    assert spark.conf.get(_KEY) == "true"
    assert scalar_count(df.filter("id % 2 = 0")) == 500
    assert scalar_first(df.agg(F.max("id")))[0] == 999
    assert spark.conf.get(_KEY) == "true"


def test_conf_restored_when_the_action_raises(spark):
    bad = spark.range(10).select(
        F.assert_true(F.col("id") < 5, F.lit("boom")).alias("x")
    )
    with pytest.raises(Exception):
        scalar_collect(bad.agg(F.count("x")))
    assert spark.conf.get(_KEY) == "true"


def test_noop_when_aqe_already_off(spark):
    spark.conf.set(_KEY, "false")
    try:
        df = spark.range(100)
        assert scalar_count(df) == 100
        assert spark.conf.get(_KEY) == "false"
    finally:
        spark.conf.set(_KEY, "true")


def test_scoped_plan_is_single_job_and_non_adaptive(spark):
    """The receipt the helper exists for: the scalar agg's executed plan
    has no AdaptiveSparkPlan wrapper inside the scope (one job, no AQE
    stage materializations) while a plain collect keeps it."""
    df = spark.range(10000).withColumn("g", F.col("id") % 3)
    agg = df.groupBy("g").agg(F.count(F.lit(1)).alias("n"))
    # plain path: adaptive
    assert "AdaptiveSparkPlan" in agg._jdf.queryExecution().executedPlan().toString()
    spark.conf.set(_KEY, "false")
    try:
        agg2 = df.groupBy("g").agg(F.count(F.lit(1)).alias("n"))
        plan = agg2._jdf.queryExecution().executedPlan().toString()
        assert "AdaptiveSparkPlan" not in plan
    finally:
        spark.conf.set(_KEY, "true")
