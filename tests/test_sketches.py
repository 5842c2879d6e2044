"""q54 sketch accuracy: HLL++ distinct within its configured rsd of the
exact count; percentile sketch within one value-step of exact."""

from __future__ import annotations

from pyspark.sql import functions as F

from iceberg_evaluation_spark.plans import REGISTRY
from iceberg_evaluation_spark.sources import load_table


def test_sketch_error_bounds(spark, sf_correct):
    got = {
        r["event_type"]: r
        for r in REGISTRY["q54_sketch_stats"].spark(spark, sf_correct).collect()
    }
    ev = load_table(spark, sf_correct, "events")
    exact = {
        r["event_type"]: r
        for r in ev.groupBy("event_type")
        .agg(
            F.countDistinct("user_id").alias("users"),
            F.expr("percentile(value, array(0.5, 0.9, 0.99))").alias("p"),
        )
        .collect()
    }
    assert set(got) == set(exact)
    for et, g in got.items():
        e = exact[et]
        # HLL++ rsd=0.02 → allow 5 sigma
        assert abs(g["approx_users"] - e["users"]) <= max(2, 0.10 * e["users"])
        for i, col in enumerate(["p50", "p90", "p99"]):
            # accuracy 10000 → near-exact on 10k rows; 2% of the exact value
            assert abs(g[col] - e["p"][i]) <= max(0.5, 0.02 * abs(e["p"][i]))
