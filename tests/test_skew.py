"""salted_join must be a drop-in replacement for the plain equi-join."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from iceberg_evaluation_spark.operators.skew import salted_join
from iceberg_evaluation_spark.sources import load_table


def _norm(df):
    return sorted(tuple(r) for r in df.collect())


@pytest.mark.parametrize("how", ["inner", "left"])
def test_salted_join_matches_plain_join(spark, sf_smoke, how):
    li = load_table(spark, sf_smoke, "lineitem").select("l_orderkey", "l_quantity")
    orders = load_table(spark, sf_smoke, "orders").select(
        F.col("o_orderkey").alias("l_orderkey"), "o_totalprice"
    )
    plain = li.join(orders, ["l_orderkey"], how)
    salted = salted_join(li, orders, ["l_orderkey"], how, salt_buckets=8)
    assert sorted(plain.columns) == sorted(salted.columns)
    assert _norm(plain) == _norm(salted.select(*plain.columns))


def test_salted_join_handles_duplicate_skewed_rows(spark):
    # identical skewed rows share a salt — multiplicity must be preserved
    left = spark.createDataFrame([(1, "x")] * 5 + [(2, "y")], "k INT, v STRING")
    right = spark.createDataFrame([(1, 10.0), (1, 20.0), (3, 30.0)], "k INT, w DOUBLE")
    plain = left.join(right, ["k"], "inner")
    salted = salted_join(left, right, ["k"], "inner", salt_buckets=4)
    assert _norm(plain) == _norm(salted.select(*plain.columns))


def test_salted_join_rejects_full_outer(spark):
    df = spark.range(3)
    with pytest.raises(ValueError):
        salted_join(df, df, ["id"], "full")
