"""Bucketed co-located join: the write-once shuffle must make the join
plan Exchange-free, with results identical to the plain join."""

from __future__ import annotations

import re

from pyspark.sql import functions as F

from iceberg_evaluation_spark.sources import load_table
from iceberg_evaluation_spark.sources.bucketed import read_bucketed, write_bucketed


def _plan(df):
    mode = df.sparkSession._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "formatted"
    )
    return df._jdf.queryExecution().explainString(mode)


def test_bucketed_join_is_exchange_free(spark, sf_smoke, tmp_path):
    li = load_table(spark, sf_smoke, "lineitem").select(
        "l_orderkey", "l_quantity", "l_extendedprice"
    )
    orders = load_table(spark, sf_smoke, "orders").select(
        "o_orderkey", "o_totalprice"
    )
    write_bucketed(li, "li_b", str(tmp_path / "li"), ["l_orderkey"], 8,
                   sort_cols=["l_orderkey"])
    write_bucketed(orders, "orders_b", str(tmp_path / "ord"), ["o_orderkey"], 8,
                   sort_cols=["o_orderkey"])
    try:
        a = read_bucketed(spark, "li_b")
        b = read_bucketed(spark, "orders_b")
        # force SMJ so the broadcast path can't mask the bucket layout
        joined = a.hint("merge").join(b, a.l_orderkey == b.o_orderkey)
        plan = _plan(joined)
        assert "SortMergeJoin" in plan
        assert not re.search(r"^\(\d+\) Exchange", plan, re.M), (
            "bucketed join must not shuffle:\n" + plan
        )

        plain = li.join(orders, li.l_orderkey == orders.o_orderkey)
        assert sorted(map(tuple, joined.collect())) == sorted(
            map(tuple, plain.collect())
        )
    finally:
        spark.sql("DROP TABLE IF EXISTS li_b")
        spark.sql("DROP TABLE IF EXISTS orders_b")


def test_bucketed_aggregation_reuses_layout(spark, sf_smoke, tmp_path):
    li = load_table(spark, sf_smoke, "lineitem").select("l_orderkey", "l_quantity")
    write_bucketed(li, "li_agg_b", str(tmp_path / "li_agg"), ["l_orderkey"], 8)
    try:
        agg = read_bucketed(spark, "li_agg_b").groupBy("l_orderkey").agg(
            F.sum("l_quantity").alias("qty")
        )
        assert not re.search(r"^\(\d+\) Exchange", _plan(agg), re.M), (
            "groupBy on the bucket key must not shuffle"
        )
        expect = {
            (r["l_orderkey"], float(r["qty"]))
            for r in li.groupBy("l_orderkey").agg(F.sum("l_quantity").alias("qty")).collect()
        }
        got = {(r["l_orderkey"], float(r["qty"])) for r in agg.collect()}
        assert got == expect
    finally:
        spark.sql("DROP TABLE IF EXISTS li_agg_b")
