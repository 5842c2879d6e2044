"""Core relational corpus: scans, projections, filters, joins, set ops,
basic and grouped aggregation (SURVEY.md §2.1-2.3, §2.5, §2.7-2.9).

Each query is written twice: idiomatic DataFrame API for the engine (so
Catalyst gets a declarative plan — pushdown, broadcast, AQE) and ANSI SQL
for the DuckDB oracle. Shapes are modeled on the reference TPC-DS corpus
(``src/data_derivation/query_performance/sql/q*.sql``) re-expressed over
the driver's TPC-H-ish star schema.

Determinism rules used throughout:
- every LIMIT has a total-order ORDER BY (unique tiebreak column);
- doubles are rounded at the output boundary only;
- no raw ``events.ts`` in outputs (parquet is ns; Spark truncates to µs).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources import load_table
from ._exact import exact_avg, exact_sum, sql_avg, sql_sum
from .registry import register


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


# ---------------------------------------------------------------------------
# q01: TPC-H Q1 shape — filtered scan + hash agg (A1, A9, P3, O1)
#      ref shape: sql/q1.sql / classic pricing summary
# ---------------------------------------------------------------------------
@register(
    "q01_pricing_summary",
    covers="S1 P1 P3 A1 O1",
    oracle=f"""
SELECT l_returnflag, l_linestatus,
       {sql_sum('l_quantity')}                                   AS sum_qty,
       {sql_sum('l_extendedprice')}                              AS sum_base_price,
       {sql_sum('l_extendedprice * (1 - l_discount)', 10000)}    AS sum_disc_price,
       {sql_avg('l_quantity')}                                   AS avg_qty,
       {sql_avg('l_discount', 100, 4)}                           AS avg_disc,
       count(*)                                                  AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1997-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
""",
)
def q01_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1997-09-02 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            exact_sum(F.col("l_quantity")).alias("sum_qty"),
            exact_sum(F.col("l_extendedprice")).alias("sum_base_price"),
            exact_sum(
                F.col("l_extendedprice") * (1 - F.col("l_discount")), 10000
            ).alias("sum_disc_price"),
            exact_avg(F.col("l_quantity")).alias("avg_qty"),
            exact_avg(F.col("l_discount"), 100, 4).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


# ---------------------------------------------------------------------------
# q02: 3-way join + top-k (J1 broadcast dims, O1, O2) — ref shape: sql/q67
# ---------------------------------------------------------------------------
@register(
    "q02_top_brand_revenue",
    covers="J1 A1 O1 O2",
    oracle=f"""
SELECT p_brand,
       {sql_sum('l_extendedprice * (1 - l_discount)', 10000)} AS revenue,
       count(*) AS n_items
FROM lineitem
JOIN part ON l_partkey = p_partkey
JOIN supplier ON l_suppkey = s_suppkey
WHERE p_size >= 10
GROUP BY p_brand
ORDER BY revenue DESC, p_brand
LIMIT 10
""",
)
def q02_top_brand_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part").filter(F.col("p_size") >= 10)
    supp = _t(spark, sf_dir, "supplier")
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .groupBy("p_brand")
        .agg(
            exact_sum(
                F.col("l_extendedprice") * (1 - F.col("l_discount")), 10000
            ).alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
        .orderBy(F.col("revenue").desc(), F.col("p_brand"))
        .limit(10)
    )


# ---------------------------------------------------------------------------
# q03: correlated scalar subquery (decorrelates to agg+join) — ref: sql/q1.sql:11-14
# ---------------------------------------------------------------------------
@register(
    "q03_above_nation_avg_balance",
    covers="J1 J7 A2 O1",
    oracle="""
SELECT c_custkey, c_name, n_name, round(c_acctbal, 2) AS acctbal
FROM customer c
JOIN nation n ON c.c_nationkey = n.n_nationkey
WHERE c_acctbal > 1.2 * (
    SELECT avg(c2.c_acctbal) FROM customer c2
    WHERE c2.c_nationkey = c.c_nationkey)
""",
)
def q03_above_nation_avg_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = _t(spark, sf_dir, "customer")
    nation = _t(spark, sf_dir, "nation")
    # decorrelated form: per-nation avg computed once, then joined
    nat_avg = cust.groupBy("c_nationkey").agg(F.avg("c_acctbal").alias("nation_avg"))
    return (
        cust.join(F.broadcast(nat_avg), "c_nationkey")
        .filter(F.col("c_acctbal") > 1.2 * F.col("nation_avg"))
        .join(F.broadcast(nation), F.col("c_nationkey") == nation.n_nationkey)
        .select(
            "c_custkey", "c_name", "n_name", F.round("c_acctbal", 2).alias("acctbal")
        )
    )


# ---------------------------------------------------------------------------
# q09: count(DISTINCT) — exact, per reference semantics (A3; ref sql/q95)
# ---------------------------------------------------------------------------
@register(
    "q09_count_distinct_customers",
    covers="A1 A3",
    oracle=f"""
SELECT o_orderstatus,
       count(DISTINCT o_custkey) AS n_customers,
       count(*) AS n_orders,
       {sql_sum('o_totalprice')} AS total_price
FROM orders
GROUP BY o_orderstatus
""",
)
def q09_count_distinct_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    return orders.groupBy("o_orderstatus").agg(
        F.countDistinct("o_custkey").alias("n_customers"),
        F.count(F.lit(1)).alias("n_orders"),
        exact_sum(F.col("o_totalprice")).alias("total_price"),
    )


# ---------------------------------------------------------------------------
# q10: multi-column DISTINCT pre-agg (A4; ref sql/q87, q38)
# ---------------------------------------------------------------------------
@register(
    "q10_distinct_triple_counts",
    covers="A4 A1",
    oracle="""
SELECT o_orderpriority, count(*) AS n_distinct_pairs
FROM (SELECT DISTINCT o_custkey, o_orderstatus, o_orderpriority FROM orders) t
GROUP BY o_orderpriority
""",
)
def q10_distinct_triple_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    return (
        orders.select("o_custkey", "o_orderstatus", "o_orderpriority")
        .distinct()
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n_distinct_pairs"))
    )


# ---------------------------------------------------------------------------
# q11/q12: INTERSECT / EXCEPT with distinct semantics (U2, U3; ref q8/q87)
# ---------------------------------------------------------------------------
@register(
    "q11_intersect_customers",
    covers="U2 A4",
    oracle="""
SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'O'
INTERSECT
SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'F'
""",
)
def q11_intersect_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    o_keys = orders.filter(F.col("o_orderstatus") == "O").select(
        F.col("o_custkey").alias("custkey")
    )
    f_keys = orders.filter(F.col("o_orderstatus") == "F").select(
        F.col("o_custkey").alias("custkey")
    )
    return o_keys.intersect(f_keys)


@register(
    "q12_except_customers",
    covers="U3",
    # customers with no urgent/high-priority order: the bare
    # customers-minus-all-orders form verified a 0-row result at sf0.01
    # (r9 verdict #5 — a hash match on an empty set is near-vacuous);
    # the priority filter keeps U3 semantics and yields a non-trivial
    # result at every checked sf (28 rows at sf0.01, 292 at sf0.1)
    oracle="""
SELECT c_custkey AS custkey FROM customer
EXCEPT
SELECT o_custkey AS custkey FROM orders
WHERE o_orderpriority IN ('1-URGENT', '2-HIGH')
""",
)
def q12_except_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = _t(spark, sf_dir, "customer").select(F.col("c_custkey").alias("custkey"))
    ordered = (
        _t(spark, sf_dir, "orders")
        .filter(F.col("o_orderpriority").isin("1-URGENT", "2-HIGH"))
        .select(F.col("o_custkey").alias("custkey"))
    )
    # TPC-DS EXCEPT is set (distinct) semantics → subtract, not exceptAll
    return cust.subtract(ordered)


# ---------------------------------------------------------------------------
# q13: UNION ALL of channels then aggregate (U1, A10; ref sql/q5, q76)
# ---------------------------------------------------------------------------
@register(
    "q13_union_channels",
    covers="U1 A10 P2 P5",
    oracle=f"""
SELECT channel, count(*) AS n, {sql_sum('o_totalprice')} AS total
FROM (
  SELECT 'urgent' AS channel, o_totalprice FROM orders
  WHERE o_orderpriority IN ('1-URGENT', '2-HIGH')
  UNION ALL
  SELECT 'normal' AS channel, o_totalprice FROM orders
  WHERE o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
) t
GROUP BY channel
""",
)
def q13_union_channels(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    urgent = orders.filter(
        F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    ).select(F.lit("urgent").alias("channel"), "o_totalprice")
    normal = orders.filter(
        ~F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    ).select(F.lit("normal").alias("channel"), "o_totalprice")
    return (
        urgent.unionByName(normal)
        .groupBy("channel")
        .agg(
            F.count(F.lit(1)).alias("n"),
            exact_sum(F.col("o_totalprice")).alias("total"),
        )
    )


# ---------------------------------------------------------------------------
# q14/q15: EXISTS → left semi, NOT EXISTS → left anti (J5, J6; ref q10/q35/q69)
# ---------------------------------------------------------------------------
@register(
    "q14_exists_semi_join",
    covers="J5 A1",
    oracle="""
SELECT c_mktsegment, count(*) AS n_customers
FROM customer c
WHERE EXISTS (SELECT 1 FROM orders o
              WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 100000)
GROUP BY c_mktsegment
""",
)
def q14_exists_semi_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = _t(spark, sf_dir, "customer")
    big = _t(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 100000)
    return (
        cust.join(big, cust.c_custkey == big.o_custkey, "left_semi")
        .groupBy("c_mktsegment")
        .agg(F.count(F.lit(1)).alias("n_customers"))
    )


@register(
    "q15_not_exists_anti_join",
    covers="J6 J1 A1",
    # customers with no urgent/high-priority order, per nation: the
    # every-customer-has-orders testdata made the unfiltered form verify
    # an EMPTY result at sf0.01 (r9 verdict #5 — vacuous hash match);
    # the predicate keeps the NOT-EXISTS-with-condition shape (the
    # TPC-DS correlated form) and yields 20 groups at sf0.01
    oracle="""
SELECT n_name, count(*) AS n_customers
FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey
                  AND o.o_orderpriority IN ('1-URGENT', '2-HIGH'))
GROUP BY n_name
""",
)
def q15_not_exists_anti_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    )
    nation = _t(spark, sf_dir, "nation")
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left_anti")
        .join(F.broadcast(nation), F.col("c_nationkey") == nation.n_nationkey)
        .groupBy("n_name")
        .agg(F.count(F.lit(1)).alias("n_customers"))
    )


# ---------------------------------------------------------------------------
# q16: FULL OUTER join + coalesce (J4; ref sql/q97, q51)
# ---------------------------------------------------------------------------
@register(
    "q16_full_outer_totals",
    covers="J4 A1 P5",
    oracle=f"""
WITH tot AS (
  SELECT o_custkey, {sql_sum('o_totalprice')} AS order_total
  FROM orders GROUP BY o_custkey
), rich AS (
  SELECT c_custkey, round(c_acctbal, 2) AS acctbal
  FROM customer WHERE c_acctbal > 5000
)
SELECT coalesce(t.o_custkey, r.c_custkey) AS custkey,
       coalesce(t.order_total, 0.0) AS order_total,
       coalesce(r.acctbal, 0.0) AS acctbal
FROM tot t FULL OUTER JOIN rich r ON t.o_custkey = r.c_custkey
""",
)
def q16_full_outer_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer")
    tot = orders.groupBy("o_custkey").agg(
        exact_sum(F.col("o_totalprice")).alias("order_total")
    )
    rich = cust.filter(F.col("c_acctbal") > 5000).select(
        "c_custkey", F.round("c_acctbal", 2).alias("acctbal")
    )
    return tot.join(rich, tot.o_custkey == rich.c_custkey, "full").select(
        F.coalesce(tot.o_custkey, rich.c_custkey).alias("custkey"),
        F.coalesce(F.col("order_total"), F.lit(0.0)).alias("order_total"),
        F.coalesce(F.col("acctbal"), F.lit(0.0)).alias("acctbal"),
    )


# ---------------------------------------------------------------------------
# q17: LEFT join + coalesce(count) (J3; ref sql/q80, q93)
# ---------------------------------------------------------------------------
@register(
    "q17_left_join_nation_counts",
    covers="J3 A1 P5",
    oracle="""
SELECT n_name, coalesce(cnt, 0) AS n_rich
FROM nation n
LEFT JOIN (
  SELECT c_nationkey, count(*) AS cnt FROM customer
  WHERE c_acctbal > 8000 GROUP BY c_nationkey
) c ON n.n_nationkey = c.c_nationkey
""",
)
def q17_left_join_nation_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    nation = _t(spark, sf_dir, "nation")
    cust = _t(spark, sf_dir, "customer")
    cnt = (
        cust.filter(F.col("c_acctbal") > 8000)
        .groupBy("c_nationkey")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    return nation.join(cnt, nation.n_nationkey == cnt.c_nationkey, "left").select(
        "n_name", F.coalesce(F.col("cnt"), F.lit(0)).alias("n_rich")
    )


# ---------------------------------------------------------------------------
# q18: cross join of single-row aggregates (J9, A2; ref sql/q88, q90)
# ---------------------------------------------------------------------------
@register(
    "q18_cross_scalar_ratio",
    covers="J9 A2",
    oracle="""
SELECT round(r.avg_r, 2) AS avg_return_price,
       round(n.avg_n, 2) AS avg_noreturn_price,
       round(r.avg_r / n.avg_n, 4) AS price_ratio
FROM (SELECT sum(CAST(round(l_extendedprice * 100, 0) AS BIGINT)) / 100.0 / count(*) AS avg_r
      FROM lineitem WHERE l_returnflag = 'R') r
CROSS JOIN
     (SELECT sum(CAST(round(l_extendedprice * 100, 0) AS BIGINT)) / 100.0 / count(*) AS avg_n
      FROM lineitem WHERE l_returnflag = 'N') n
""",
)
def q18_cross_scalar_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ._exact import cents

    li = _t(spark, sf_dir, "lineitem")
    exact_mean = (F.sum(cents(F.col("l_extendedprice"))) / 100.0 / F.count(F.lit(1)))
    avg_r = li.filter(F.col("l_returnflag") == "R").agg(exact_mean.alias("avg_r"))
    avg_n = li.filter(F.col("l_returnflag") == "N").agg(exact_mean.alias("avg_n"))
    return avg_r.crossJoin(avg_n).select(
        F.round("avg_r", 2).alias("avg_return_price"),
        F.round("avg_n", 2).alias("avg_noreturn_price"),
        F.round(F.col("avg_r") / F.col("avg_n"), 4).alias("price_ratio"),
    )


# ---------------------------------------------------------------------------
# q19: date + INTERVAL range predicate inside a join (J10; ref q80:14-15, q82:9)
# ---------------------------------------------------------------------------
@register(
    "q19_interval_range_join",
    covers="J10 J1 A1 P5",
    oracle=f"""
SELECT o_orderpriority,
       count(*) AS n_fast_ships,
       {sql_sum('l_extendedprice * (1 - l_discount)', 10000)} AS revenue
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
WHERE l_shipdate BETWEEN o_orderdate AND o_orderdate + INTERVAL 30 DAY
GROUP BY o_orderpriority
""",
)
def q19_interval_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .filter(
            F.col("l_shipdate").between(
                F.col("o_orderdate"), F.col("o_orderdate") + F.expr("INTERVAL 30 DAYS")
            )
        )
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_fast_ships"),
            exact_sum(
                F.col("l_extendedprice") * (1 - F.col("l_discount")), 10000
            ).alias("revenue"),
        )
    )


# ---------------------------------------------------------------------------
# q20: HAVING with multiple thresholds (A8; ref sql/q6:19, q44:17)
# ---------------------------------------------------------------------------
@register(
    "q20_having_thresholds",
    covers="A8 A1",
    oracle=f"""
SELECT o_custkey, count(*) AS n_orders, {sql_sum('o_totalprice')} AS total
FROM orders
GROUP BY o_custkey
HAVING count(*) >= 3
   AND sum(CAST(round(o_totalprice * 100, 0) AS BIGINT)) / 100.0 > 300000
""",
)
def q20_having_thresholds(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    from ._exact import cents

    return (
        orders.groupBy("o_custkey")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            (F.sum(cents(F.col("o_totalprice"))) / 100.0).alias("_total"),
        )
        .filter((F.col("n_orders") >= 3) & (F.col("_total") > 300000))
        .select("o_custkey", "n_orders", F.round("_total", 2).alias("total"))
    )


# ---------------------------------------------------------------------------
# q23: scalar-function census — substr/upper/concat/like/in/between/case/abs
#      (P3, P5, §2.9; ref q15:7, q24a:20, q91:20, q80:71)
# ---------------------------------------------------------------------------
@register(
    "q23_scalar_function_census",
    covers="P1 P3 P5 scalar-census",
    oracle="""
SELECT c_custkey,
       substr(c_name, 1, 10) AS name_prefix,
       upper(c_mktsegment) AS seg,
       concat(n_name, '-', c_name) AS tagged,
       CASE WHEN c_acctbal < 0 THEN 'neg'
            WHEN c_acctbal < 5000 THEN 'mid'
            ELSE 'high' END AS bal_band,
       round(abs(c_acctbal), 2) AS abs_bal,
       CAST(trunc(c_acctbal) AS BIGINT) AS bal_int
FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
WHERE c_mktsegment IN ('BUILDING', 'AUTOMOBILE', 'MACHINERY')
  AND c_name LIKE '%1%'
  AND c_acctbal BETWEEN -500 AND 9500
  AND c_name IS NOT NULL
""",
)
def q23_scalar_function_census(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = _t(spark, sf_dir, "customer")
    nation = _t(spark, sf_dir, "nation")
    return (
        cust.join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .filter(
            F.col("c_mktsegment").isin("BUILDING", "AUTOMOBILE", "MACHINERY")
            & F.col("c_name").like("%1%")
            & F.col("c_acctbal").between(-500, 9500)
            & F.col("c_name").isNotNull()
        )
        .select(
            "c_custkey",
            F.substring("c_name", 1, 10).alias("name_prefix"),
            F.upper("c_mktsegment").alias("seg"),
            F.concat(F.col("n_name"), F.lit("-"), F.col("c_name")).alias("tagged"),
            F.when(F.col("c_acctbal") < 0, "neg")
            .when(F.col("c_acctbal") < 5000, "mid")
            .otherwise("high")
            .alias("bal_band"),
            F.round(F.abs("c_acctbal"), 2).alias("abs_bal"),
            F.col("c_acctbal").cast("bigint").alias("bal_int"),
        )
    )


# ---------------------------------------------------------------------------
# q26: OR-of-ANDs multi-bucket conditional counts in one scan (P3, A9; ref q88)
# ---------------------------------------------------------------------------
@register(
    "q26_or_of_ands_buckets",
    covers="P3 A9 A2",
    oracle="""
SELECT count(CASE WHEN l_quantity BETWEEN 1 AND 10 AND l_discount < 0.05 THEN 1 END)  AS bucket_lo,
       count(CASE WHEN l_quantity BETWEEN 11 AND 30 AND l_discount BETWEEN 0.03 AND 0.07 THEN 1 END) AS bucket_mid,
       count(CASE WHEN l_quantity > 30 OR (l_discount > 0.08 AND l_tax > 0.04) THEN 1 END) AS bucket_hi
FROM lineitem
WHERE (l_returnflag = 'N' AND l_linestatus = 'O')
   OR (l_returnflag = 'R' AND l_quantity > 5)
""",
)
def q26_or_of_ands_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    q, d, t = F.col("l_quantity"), F.col("l_discount"), F.col("l_tax")
    return li.filter(
        ((F.col("l_returnflag") == "N") & (F.col("l_linestatus") == "O"))
        | ((F.col("l_returnflag") == "R") & (q > 5))
    ).agg(
        F.count(F.when(q.between(1, 10) & (d < 0.05), 1)).alias("bucket_lo"),
        F.count(F.when(q.between(11, 30) & d.between(0.03, 0.07), 1)).alias(
            "bucket_mid"
        ),
        F.count(F.when((q > 30) | ((d > 0.08) & (t > 0.04)), 1)).alias("bucket_hi"),
    )


# ---------------------------------------------------------------------------
# q51: the SQL path — register the star schema as temp views (S2/S8:
#      catalog scan + DDL analog) and run the query through spark.sql.
#      Same Catalyst plan as the DataFrame path (SURVEY §3.1 step 4:
#      createOrReplaceTempView + spark.sql is exactly how the reference
#      drives its MERGE sources, pyspark_functions.py:50,137); proves the
#      engine's two front doors resolve to one optimizer.
# ---------------------------------------------------------------------------
@register(
    "q51_sql_path_view_scan",
    covers="S2 S8 J1 J2 A1 O1 O2",
    oracle="""
SELECT n_name,
       count(*) AS n_customers,
       CAST(sum(c_custkey) AS BIGINT) AS key_sum
FROM customer JOIN nation ON c_nationkey = n_nationkey
GROUP BY n_name
ORDER BY n_customers DESC, n_name
LIMIT 10
""",
)
def q51_sql_path_view_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..sources import register_star_schema

    register_star_schema(spark, sf_dir)
    return spark.sql(
        """
        SELECT n_name,
               count(*) AS n_customers,
               CAST(sum(c_custkey) AS BIGINT) AS key_sum
        FROM customer JOIN nation ON c_nationkey = n_nationkey
        GROUP BY n_name
        ORDER BY n_customers DESC, n_name
        LIMIT 10
        """
    )


# ---------------------------------------------------------------------------
# q52: flagship composite — the reference's hardest TPC-DS shapes in ONE
#      plan (ref sql/q5.sql / q77.sql: channel UNION ALL feeding ROLLUP;
#      q67.sql: rank over grouped revenue; q27.sql: grouping()): channel
#      union → broadcast dim joins → 3-level ROLLUP + GROUPING() → rank
#      window → HAVING → ordered top-k. Exercises the optimizer's
#      composability: one shuffle for the rollup agg, one for the rank
#      window, TakeOrderedAndProject for the limit, dims broadcast.
# ---------------------------------------------------------------------------
@register(
    "q52_flagship_composite",
    covers="U1 A5 A6 A8 A10 W1 W6 J1 O1 O2 P3",
    oracle=f"""
WITH channels AS (
  SELECT l_suppkey, l_partkey, l_extendedprice, l_discount, 'returned' AS channel
  FROM lineitem WHERE l_returnflag = 'R'
  UNION ALL
  SELECT l_suppkey, l_partkey, l_extendedprice, l_discount, 'kept' AS channel
  FROM lineitem WHERE l_returnflag <> 'R'
), agg AS (
  SELECT channel, n_name, p_brand,
         CAST(grouping(channel) AS INT)  AS g_channel,
         CAST(grouping(n_name) AS INT)   AS g_nation,
         CAST(grouping(p_brand) AS INT)  AS g_brand,
         {sql_sum('l_extendedprice * (1 - l_discount)', 10000)} AS revenue,
         count(*) AS n_items
  FROM channels
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation   ON s_nationkey = n_nationkey
  JOIN part     ON l_partkey = p_partkey
  GROUP BY ROLLUP(channel, n_name, p_brand)
  HAVING count(*) >= 5
)
SELECT channel, n_name, p_brand, g_channel, g_nation, g_brand,
       revenue, n_items,
       rank() OVER (PARTITION BY channel, n_name, g_brand
                    ORDER BY revenue DESC, p_brand) AS rk
FROM agg
ORDER BY g_channel DESC, g_nation DESC, g_brand DESC,
         channel NULLS FIRST, n_name NULLS FIRST, revenue DESC, p_brand NULLS FIRST
LIMIT 100
""",
)
def q52_flagship_composite(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    supplier = _t(spark, sf_dir, "supplier")
    nation = _t(spark, sf_dir, "nation")
    part = _t(spark, sf_dir, "part")

    base = li.select("l_suppkey", "l_partkey", "l_extendedprice", "l_discount",
                     "l_returnflag")
    channels = (
        base.filter(F.col("l_returnflag") == "R").withColumn("channel", F.lit("returned"))
        .unionByName(
            base.filter(F.col("l_returnflag") != "R").withColumn("channel", F.lit("kept"))
        )
        .drop("l_returnflag")
    )
    joined = (
        channels.join(F.broadcast(supplier), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
    )
    agg = (
        joined.rollup("channel", "n_name", "p_brand")
        .agg(
            F.grouping("channel").cast("int").alias("g_channel"),
            F.grouping("n_name").cast("int").alias("g_nation"),
            F.grouping("p_brand").cast("int").alias("g_brand"),
            exact_sum(
                F.col("l_extendedprice") * (1 - F.col("l_discount")), 10000
            ).alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
        .filter(F.col("n_items") >= 5)
    )
    from pyspark.sql import Window as W

    w = W.partitionBy("channel", "n_name", "g_brand").orderBy(
        F.col("revenue").desc(), F.col("p_brand")
    )
    return (
        agg.withColumn("rk", F.rank().over(w))
        .orderBy(
            F.col("g_channel").desc(),
            F.col("g_nation").desc(),
            F.col("g_brand").desc(),
            F.col("channel").asc_nulls_first(),
            F.col("n_name").asc_nulls_first(),
            F.col("revenue").desc(),
            F.col("p_brand").asc_nulls_first(),
        )
        .limit(100)
    )


def _halfup2(col: str):
    t = F.col(col) + 50
    return ((t - t % 100) / 100) / 100.0


# ---------------------------------------------------------------------------
# q61: cumulative channel crossover — the TPC-DS q51 composite: two
#      channels' daily revenue, running totals per channel, FULL OUTER
#      join on day, filter where one channel's running MAX overtakes the
#      other's running total. Stresses window-on-aggregate + full-outer
#      + windows-after-join in one plan (ref sql/q51.sql:5-51).
#      The global (unpartitioned) windows are scale-safe BY CONSTRUCTION:
#      they run over the daily pre-aggregate — one row per date — so the
#      single-partition frame is calendar-bounded (~thousands of rows)
#      no matter how large the raw fact table grows.
# ---------------------------------------------------------------------------
@register(
    "q61_cumulative_crossover",
    covers="W3 W4 J4 U1 A1 O1 O2",
    oracle="""
WITH o_daily AS (
  SELECT CAST(l_shipdate AS DATE) AS d,
         sum(CAST(round(l_extendedprice * (1 - l_discount) * 10000, 0) AS BIGINT)) AS rev
  FROM lineitem WHERE l_linestatus = 'O' GROUP BY 1
), f_daily AS (
  SELECT CAST(l_shipdate AS DATE) AS d,
         sum(CAST(round(l_extendedprice * (1 - l_discount) * 10000, 0) AS BIGINT)) AS rev
  FROM lineitem WHERE l_linestatus = 'F' GROUP BY 1
), o_cum AS (
  SELECT d, sum(rev) OVER (ORDER BY d ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
  FROM o_daily
), f_cum AS (
  SELECT d, sum(rev) OVER (ORDER BY d ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
  FROM f_daily
), joined AS (
  SELECT coalesce(o.d, f.d) AS d, o.cum AS o_cum, f.cum AS f_cum
  FROM o_cum o FULL OUTER JOIN f_cum f ON o.d = f.d
), maxed AS (
  SELECT d,
         max(o_cum) OVER w AS o_run, max(f_cum) OVER w AS f_run
  FROM joined
  WINDOW w AS (ORDER BY d ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
)
-- integer half-up: o_run is exact 4dp-cents, /10000 lands on .xx5
-- midpoints where Spark (HALF_UP) and DuckDB (binary) disagree
SELECT d,
       (((o_run + 50) - (o_run + 50) % 100) / 100) / 100.0 AS open_cum,
       (((f_run + 50) - (f_run + 50) % 100) / 100) / 100.0 AS filled_cum
FROM maxed
WHERE o_run > f_run
ORDER BY d
LIMIT 100
""",
)
def q61_cumulative_crossover(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    li = _t(spark, sf_dir, "lineitem")
    cents = F.round(
        F.col("l_extendedprice") * (1 - F.col("l_discount")) * 10000, 0
    ).cast("bigint")

    def cum(status: str, out: str) -> DataFrame:
        daily = (
            li.filter(F.col("l_linestatus") == status)
            .groupBy(F.to_date("l_shipdate").alias("d"))
            .agg(F.sum(cents).alias("rev"))
        )
        w = W.orderBy("d").rowsBetween(W.unboundedPreceding, W.currentRow)
        return daily.select("d", F.sum("rev").over(w).alias(out))

    o, f = cum("O", "o_cum"), cum("F", "f_cum")
    joined = o.join(f, "d", "full_outer").select(
        F.col("d"), "o_cum", "f_cum"
    )
    w = W.orderBy("d").rowsBetween(W.unboundedPreceding, W.currentRow)
    maxed = joined.select(
        "d",
        F.max("o_cum").over(w).alias("o_run"),
        F.max("f_cum").over(w).alias("f_run"),
    )
    return (
        maxed.filter(F.col("o_run") > F.col("f_run"))
        .select(
            "d",
            _halfup2("o_run").alias("open_cum"),
            _halfup2("f_run").alias("filled_cum"),
        )
        .orderBy("d")
        .limit(100)
    )


# ---------------------------------------------------------------------------
# q64: CASE over scalar subqueries in SELECT (ref sql/q9.sql:2-14): each
#      output column picks between two scalar aggregates depending on a
#      third — Catalyst plans each as an independent subquery, executes
#      them in parallel, and injects the results as literals. All sums
#      ride the exact-cents path so the engines agree bit-for-bit.
# ---------------------------------------------------------------------------
_Q64_SQL = """
SELECT r_name,
       (SELECT count(*) FROM orders) AS n_orders_total,
       CASE WHEN (SELECT count(*) FROM lineitem WHERE l_quantity <= 25) >
                 (SELECT count(*) FROM lineitem WHERE l_quantity > 25)
            THEN CAST((SELECT sum(CAST(round(l_extendedprice * 100, 0) AS BIGINT))
                  FROM lineitem WHERE l_quantity <= 25) AS DOUBLE) / 100.0
            ELSE CAST((SELECT sum(CAST(round(l_extendedprice * 100, 0) AS BIGINT))
                  FROM lineitem WHERE l_quantity > 25) AS DOUBLE) / 100.0
       END AS majority_bucket_revenue,
       CASE WHEN (SELECT count(*) FROM lineitem WHERE l_returnflag = 'R') * 2 >
                 (SELECT count(*) FROM lineitem)
            THEN 'mostly_returned' ELSE 'mostly_kept'
       END AS return_profile
FROM region
ORDER BY r_name
"""


@register(
    "q64_case_scalar_subqueries",
    covers="A2 J9 P5 scalar-census O1",
    oracle=_Q64_SQL,
)
def q64_case_scalar_subqueries(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..sources import register_star_schema

    register_star_schema(spark, sf_dir)
    return spark.sql(_Q64_SQL)


# ---------------------------------------------------------------------------
# q70: extended string-function census — lower/trim/length/replace/
#      lpad/split/strpos over customer names (the reference corpus uses
#      only substr/upper/concat/LIKE, §2.9; the engine exposes the full
#      portable set). Narrow projection + one aggregate.
# ---------------------------------------------------------------------------
@register(
    "q70_string_census",
    covers="P1 P5 scalar-census A1",
    oracle="""
SELECT c_mktsegment,
       count(*) AS n,
       CAST(sum(length(trim(c_name))) AS BIGINT) AS total_name_len,
       CAST(sum(length(replace(lower(c_name), 'customer', ''))) AS BIGINT)
         AS len_sans_word,
       CAST(sum(CASE WHEN strpos(c_name, '#') > 0 THEN 1 ELSE 0 END) AS BIGINT)
         AS with_hash,
       min(lpad(CAST(c_custkey AS VARCHAR), 10, '0')) AS first_key_padded,
       CAST(sum(len(string_split(c_name, '#'))) AS BIGINT) AS total_parts
FROM customer
GROUP BY c_mktsegment
""",
)
def q70_string_census(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer")
    return c.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.length(F.trim("c_name"))).alias("total_name_len"),
        F.sum(
            F.length(F.regexp_replace(F.lower("c_name"), "customer", ""))
        ).alias("len_sans_word"),
        F.sum(
            F.when(F.instr("c_name", "#") > 0, 1).otherwise(0)
        ).alias("with_hash"),
        F.min(F.lpad(F.col("c_custkey").cast("string"), 10, "0")).alias(
            "first_key_padded"
        ),
        F.sum(F.size(F.split("c_name", "#"))).alias("total_parts"),
    )
