"""Sketch accuracy: HLL++ distinct within its configured rsd of the exact
count; percentile sketch near-exact at accuracy 10000. q54 itself now
emits oracle-checkable tolerance flags; this test pins the TIGHTER
measured bounds on the raw sketch values."""

from __future__ import annotations

from pyspark.sql import functions as F

from iceberg_evaluation_spark.plans import REGISTRY
from iceberg_evaluation_spark.sources import load_table


def test_sketch_error_bounds(spark, sf_correct):
    ev = load_table(spark, sf_correct, "events")
    rows = (
        ev.groupBy("event_type")
        .agg(
            F.countDistinct("user_id").alias("users"),
            F.approx_count_distinct("user_id", rsd=0.02).alias("approx_users"),
            F.expr("percentile(value, array(0.5, 0.9, 0.99))").alias("pe"),
            F.expr("approx_percentile(value, array(0.5, 0.9, 0.99), 10000)").alias("pa"),
        )
        .collect()
    )
    assert rows
    for r in rows:
        # HLL++ rsd=0.02 → allow 5 sigma
        assert abs(r["approx_users"] - r["users"]) <= max(2, 0.10 * r["users"])
        for pa, pe in zip(r["pa"], r["pe"]):
            # accuracy 10000 → near-exact on 10k rows; 2% of the exact value
            assert abs(pa - pe) <= max(0.5, 0.02 * abs(pe))


def test_q54_contract_flags_all_true(spark, sf_correct):
    for r in REGISTRY["q54_sketch_stats"].spark(spark, sf_correct).collect():
        assert r["hll_within_3rsd"] and r["pctl_within_tol"], r
