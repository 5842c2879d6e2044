"""Analytic corpus: window functions, ROLLUP/GROUPING, stddev, conditional
pivots, top-k per group, event-time bucketing (SURVEY.md §2.5 A5-A9,
§2.6 W1-W6, §2.7).

Shapes modeled on the reference TPC-DS files cited per query; all doubles
rounded at the output boundary, all window ORDER BYs totally ordered.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from ..sources import load_table
from ._exact import cents, exact_sum, sql_sum
from .registry import register


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


# ---------------------------------------------------------------------------
# q04: running total + running max over ordered window (W3, W4; ref sql/q51)
# ---------------------------------------------------------------------------
@register(
    "q04_running_revenue",
    covers="W3 W4 A1",
    oracle=f"""
WITH daily AS (
  SELECT CAST(l_shipdate AS DATE) AS ship_date, l_returnflag,
         {sql_sum('l_extendedprice * (1 - l_discount)', 10000)} AS day_rev
  FROM lineitem GROUP BY 1, 2
)
-- running sum accumulates exact integer cents: engines may order window
-- aggregation differently (segment tree vs sequential) and double drift
-- at 1e9 magnitude flips rounded cents
SELECT ship_date, l_returnflag, day_rev,
       round(sum(CAST(round(day_rev * 100, 0) AS BIGINT)) OVER w / 100.0, 2) AS cume_rev,
       round(max(day_rev) OVER w, 2) AS max_day_rev
FROM daily
WINDOW w AS (PARTITION BY l_returnflag ORDER BY ship_date
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
""",
)
def q04_running_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    daily = (
        li.groupBy(
            F.to_date("l_shipdate").alias("ship_date"), F.col("l_returnflag")
        ).agg(
            exact_sum(
                F.col("l_extendedprice") * (1 - F.col("l_discount")), 10000
            ).alias("day_rev")
        )
    )
    w = (
        W.partitionBy("l_returnflag")
        .orderBy("ship_date")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    cents = F.round(F.col("day_rev") * 100, 0).cast("bigint")
    return daily.select(
        "ship_date",
        "l_returnflag",
        "day_rev",
        F.round(F.sum(cents).over(w) / 100.0, 2).alias("cume_rev"),
        F.round(F.max("day_rev").over(w), 2).alias("max_day_rev"),
    )


# ---------------------------------------------------------------------------
# q05: rank() within partition + top-k filter (W1; ref sql/q67:13-15)
# ---------------------------------------------------------------------------
@register(
    "q05_rank_parts_in_brand",
    covers="W1 W6 J1 A1",
    oracle=f"""
WITH rev AS (
  SELECT p_brand, p_partkey,
         {sql_sum('l_extendedprice * (1 - l_discount)', 10000)} AS revenue
  FROM lineitem JOIN part ON l_partkey = p_partkey
  GROUP BY p_brand, p_partkey
)
SELECT p_brand, p_partkey, revenue, rk
FROM (SELECT *, rank() OVER (PARTITION BY p_brand
                             ORDER BY revenue DESC, p_partkey) AS rk
      FROM rev) t
WHERE rk <= 3
""",
)
def q05_rank_parts_in_brand(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part")
    rev = (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .groupBy("p_brand", "p_partkey")
        .agg(
            exact_sum(
                F.col("l_extendedprice") * (1 - F.col("l_discount")), 10000
            ).alias("revenue")
        )
    )
    w = W.partitionBy("p_brand").orderBy(F.col("revenue").desc(), F.col("p_partkey"))
    return rev.withColumn("rk", F.rank().over(w)).filter(F.col("rk") <= 3)


# ---------------------------------------------------------------------------
# q06: windowed aggregate over group aggregate + abs deviation filter
#      (W2, W6; ref sql/q53:5-7, q57:53)
# ---------------------------------------------------------------------------
@register(
    "q06_monthly_vs_flag_avg",
    covers="W2 W6 A1 scalar-census",
    oracle=f"""
WITH monthly AS (
  SELECT l_returnflag,
         CAST(date_part('year', l_shipdate) AS INT) AS ship_year,
         CAST(date_part('month', l_shipdate) AS INT) AS ship_month,
         sum(CAST(round(l_extendedprice * (1 - l_discount) * 10000, 0) AS BIGINT)) / 10000.0 AS rev_raw,
         {sql_sum('l_extendedprice * (1 - l_discount)', 10000)} AS rev
  FROM lineitem GROUP BY 1, 2, 3
)
SELECT l_returnflag, ship_year, ship_month,
       rev,
       round(avg_rev, 2) AS avg_rev
FROM (SELECT *, avg(rev_raw) OVER (PARTITION BY l_returnflag) AS avg_rev FROM monthly) t
WHERE avg_rev > 0 AND abs(rev_raw - avg_rev) / avg_rev > 0.1
""",
)
def q06_monthly_vs_flag_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    monthly = li.groupBy(
        "l_returnflag",
        F.year("l_shipdate").alias("ship_year"),
        F.month("l_shipdate").alias("ship_month"),
    ).agg(
        (
            F.sum(cents(F.col("l_extendedprice") * (1 - F.col("l_discount")), 10000))
            / 10000.0
        ).alias("rev_raw"),
        exact_sum(
            F.col("l_extendedprice") * (1 - F.col("l_discount")), 10000
        ).alias("rev"),
    )
    w = W.partitionBy("l_returnflag")
    return (
        monthly.withColumn("avg_rev", F.avg("rev_raw").over(w))
        .filter(
            (F.col("avg_rev") > 0)
            & (F.abs(F.col("rev_raw") - F.col("avg_rev")) / F.col("avg_rev") > 0.1)
        )
        .select(
            "l_returnflag",
            "ship_year",
            "ship_month",
            "rev",
            F.round("avg_rev", 2).alias("avg_rev"),
        )
    )


# ---------------------------------------------------------------------------
# q07: lag/lead neighbors (W5; idiomatic form of the reference's rank
#      self-join emulation, sql/q47:53-54 / q57 — J8 re-expressed)
# ---------------------------------------------------------------------------
@register(
    "q07_monthly_lag_lead",
    covers="W5 J8 A1",
    oracle=f"""
WITH monthly AS (
  SELECT l_returnflag,
         CAST(date_part('year', l_shipdate) AS INT) AS ship_year,
         CAST(date_part('month', l_shipdate) AS INT) AS ship_month,
         {sql_sum('l_quantity')} AS qty
  FROM lineitem GROUP BY 1, 2, 3
)
SELECT l_returnflag, ship_year, ship_month, qty,
       lag(qty, 1)  OVER w AS prev_qty,
       lead(qty, 1) OVER w AS next_qty,
       round(qty - coalesce(lag(qty, 1) OVER w, qty), 2) AS qty_delta
FROM monthly
WINDOW w AS (PARTITION BY l_returnflag ORDER BY ship_year, ship_month)
""",
)
def q07_monthly_lag_lead(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    monthly = li.groupBy(
        "l_returnflag",
        F.year("l_shipdate").alias("ship_year"),
        F.month("l_shipdate").alias("ship_month"),
    ).agg(exact_sum(F.col("l_quantity")).alias("qty"))
    w = W.partitionBy("l_returnflag").orderBy("ship_year", "ship_month")
    return monthly.select(
        "l_returnflag",
        "ship_year",
        "ship_month",
        "qty",
        F.lag("qty", 1).over(w).alias("prev_qty"),
        F.lead("qty", 1).over(w).alias("next_qty"),
        F.round(
            F.col("qty") - F.coalesce(F.lag("qty", 1).over(w), F.col("qty")), 2
        ).alias("qty_delta"),
    )


# ---------------------------------------------------------------------------
# q08: ROLLUP + GROUPING() indicator (A5, A6; ref sql/q27:4, q5:129)
# ---------------------------------------------------------------------------
@register(
    "q08_rollup_grouping",
    covers="A5 A6 A1",
    oracle=f"""
SELECT l_returnflag, l_linestatus,
       grouping(l_returnflag) AS g_flag,
       grouping(l_linestatus) AS g_status,
       {sql_sum('l_quantity')} AS sum_qty,
       count(*) AS n
FROM lineitem
GROUP BY ROLLUP (l_returnflag, l_linestatus)
""",
)
def q08_rollup_grouping(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    return li.rollup("l_returnflag", "l_linestatus").agg(
        F.grouping("l_returnflag").cast("bigint").alias("g_flag"),
        F.grouping("l_linestatus").cast("bigint").alias("g_status"),
        exact_sum(F.col("l_quantity")).alias("sum_qty"),
        F.count(F.lit(1)).alias("n"),
    )


# ---------------------------------------------------------------------------
# q21: stddev_samp (A7; ref sql/q17:7, q39a:18)
# ---------------------------------------------------------------------------
@register(
    "q21_stddev_quantity",
    covers="A7 A1",
    oracle="""
SELECT l_returnflag,
       round(stddev_samp(l_quantity), 4) AS std_qty,
       round(avg(l_quantity), 4) AS avg_qty,
       round(stddev_samp(l_quantity) / avg(l_quantity), 4) AS cov
FROM lineitem
GROUP BY l_returnflag
""",
)
def q21_stddev_quantity(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(F.stddev_samp("l_quantity"), 4).alias("std_qty"),
        F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
        F.round(F.stddev_samp("l_quantity") / F.avg("l_quantity"), 4).alias("cov"),
    )


# ---------------------------------------------------------------------------
# q22: conditional-sum pivot into quarter buckets (A9; ref sql/q66:56-64)
# ---------------------------------------------------------------------------
@register(
    "q22_quarter_pivot",
    covers="A9 A1 P3",
    oracle=f"""
SELECT event_type,
       {sql_sum("CASE WHEN date_part('month', ts) IN (1, 2, 3) THEN value ELSE 0 END")} AS q1_val,
       {sql_sum("CASE WHEN date_part('month', ts) IN (4, 5, 6) THEN value ELSE 0 END")} AS q2_val,
       {sql_sum("CASE WHEN date_part('month', ts) IN (7, 8, 9) THEN value ELSE 0 END")} AS q3_val,
       {sql_sum("CASE WHEN date_part('month', ts) IN (10, 11, 12) THEN value ELSE 0 END")} AS q4_val,
       count(*) AS n
FROM events
GROUP BY event_type
""",
)
def q22_quarter_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    m = F.month("ts")

    def bucket(months, name):
        return exact_sum(
            F.when(m.isin(*months), F.col("value")).otherwise(0.0)
        ).alias(name)

    return ev.groupBy("event_type").agg(
        bucket([1, 2, 3], "q1_val"),
        bucket([4, 5, 6], "q2_val"),
        bucket([7, 8, 9], "q3_val"),
        bucket([10, 11, 12], "q4_val"),
        F.count(F.lit(1)).alias("n"),
    )


# ---------------------------------------------------------------------------
# q24: top-1 per group via row_number (M4 latest-record idiom on real data;
#      ref updating_db_with_deltas_iceberg.ipynb cell 26)
# ---------------------------------------------------------------------------
@register(
    "q24_latest_order_per_customer",
    covers="W1 M4 O1",
    oracle="""
SELECT o_custkey, o_orderkey AS latest_orderkey,
       CAST(o_orderdate AS DATE) AS latest_orderdate,
       round(o_totalprice, 2) AS totalprice
FROM (
  SELECT *, row_number() OVER (PARTITION BY o_custkey
                               ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
  FROM orders
) t WHERE rn = 1
""",
)
def q24_latest_order_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    w = W.partitionBy("o_custkey").orderBy(
        F.col("o_orderdate").desc(), F.col("o_orderkey").desc()
    )
    return (
        orders.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "o_custkey",
            F.col("o_orderkey").alias("latest_orderkey"),
            F.to_date("o_orderdate").alias("latest_orderdate"),
            F.round("o_totalprice", 2).alias("totalprice"),
        )
    )


# ---------------------------------------------------------------------------
# q25: event-time tumbling window aggregation (batch form of the streaming
#      surface §2.10; window start emitted, never raw ns timestamps)
# ---------------------------------------------------------------------------
@register(
    "q25_event_hourly_windows",
    covers="A1 streaming-shape",
    oracle=f"""
SELECT time_bucket(INTERVAL 1 HOUR, ts) AS window_start,
       event_type,
       count(*) AS n,
       {sql_sum('value')} AS total_value
FROM events
GROUP BY 1, 2
HAVING count(*) >= 2
""",
)
def q25_event_hourly_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "1 hour").alias("w"), F.col("event_type"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            exact_sum(F.col("value")).alias("total_value"),
        )
        .filter(F.col("n") >= 2)
        .select(
            F.col("w.start").alias("window_start"), "event_type", "n", "total_value"
        )
    )


# ---------------------------------------------------------------------------
# q27: event sessionization (gaps-and-islands): a session breaks after a
#      >30 min silence per user. The canonical training-pipeline log
#      transform — lag + running sum of break flags + per-session agg,
#      all shuffling once on user_id (the window and the groupBy share
#      the hash partitioning, so Catalyst reuses the exchange).
# ---------------------------------------------------------------------------
@register(
    "q27_event_sessions",
    covers="W3 W5 A1 streaming-shape",
    oracle=f"""
WITH flagged AS (
  SELECT user_id, event_id, ts, value,
         CASE WHEN lag(ts) OVER w IS NULL
                OR date_diff('second', lag(ts) OVER w, ts) > 1800
              THEN 1 ELSE 0 END AS brk
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), numbered AS (
  SELECT *, CAST(sum(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
            AS session_idx
  FROM flagged
)
SELECT user_id, session_idx,
       count(*) AS n_events,
       -- second-truncate: the testdata carries ns timestamps; Spark
       -- ROUNDS ns→µs at parquet read while DuckDB truncates, so any
       -- finer quantization flips on values within 1µs of a boundary
       date_trunc('second', min(ts)) AS session_start,
       date_trunc('second', max(ts)) AS session_end,
       date_diff('second', min(ts), max(ts)) AS duration_s,
       {sql_sum('value')} AS total_value
FROM numbered
GROUP BY user_id, session_idx
""",
)
def q27_event_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    prev_ts = F.lag("ts").over(w)
    brk = F.when(
        prev_ts.isNull()
        | (F.unix_timestamp("ts") - F.unix_timestamp(prev_ts) > 1800),
        1,
    ).otherwise(0)
    numbered = ev.withColumn(
        "session_idx",
        F.sum(brk).over(w.rowsBetween(W.unboundedPreceding, W.currentRow)),
    )
    return numbered.groupBy("user_id", "session_idx").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.date_trunc("second", F.min("ts")).alias("session_start"),
        F.date_trunc("second", F.max("ts")).alias("session_end"),
        (F.unix_timestamp(F.max("ts")) - F.unix_timestamp(F.min("ts"))).alias(
            "duration_s"
        ),
        exact_sum(F.col("value")).alias("total_value"),
    )


# ---------------------------------------------------------------------------
# q53: as-of (point-in-time) join — for every 'click' event, the latest
#      'purchase' by the same user at or before it (the CDC/SCD2
#      consumption pattern: "which version was current at event time").
#      Engine side is operators.asof.asof_join (union + ordered window:
#      ONE shuffle on the key, no |probes|×|versions| blowup); the
#      oracle uses DuckDB's native ASOF LEFT JOIN.
# ---------------------------------------------------------------------------
@register(
    "q53_asof_join",
    covers="J7 J10 W5 streaming-shape",
    oracle=f"""
WITH versions AS (
  SELECT user_id, ts, value FROM (
    SELECT user_id, ts, value,
           row_number() OVER (PARTITION BY user_id, ts ORDER BY event_id DESC) AS rn
    FROM events WHERE event_type = 'purchase'
  ) WHERE rn = 1
), probes AS (
  SELECT event_id, user_id, ts FROM events WHERE event_type = 'click'
)
SELECT p.event_id, p.user_id,
       date_trunc('second', p.ts) AS click_time,
       date_trunc('second', v.ts) AS purchase_time,
       round(v.value, 2) AS purchase_value
FROM probes p ASOF LEFT JOIN versions v
  ON p.user_id = v.user_id AND p.ts >= v.ts
""",
)
def q53_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.asof import asof_join
    from ..operators.scd2 import dedup_latest

    ev = _t(spark, sf_dir, "events")
    versions = dedup_latest(
        ev.filter(F.col("event_type") == "purchase").select(
            "user_id", "ts", F.col("value").alias("purchase_value"), "event_id"
        ),
        keys=["user_id", "ts"],
        order_col="event_id",
    ).select("user_id", "ts", "purchase_value")
    probes = ev.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts"
    )
    joined = asof_join(
        probes,
        versions,
        on=["user_id"],
        probe_ts="ts",
        version_ts="ts",
        value_cols=["purchase_value"],
    )
    return joined.select(
        "event_id",
        "user_id",
        F.date_trunc("second", "ts").alias("click_time"),
        F.date_trunc("second", "matched_ts").alias("purchase_time"),
        F.round("purchase_value", 2).alias("purchase_value"),
    )


# ---------------------------------------------------------------------------
# q54: sketch statistics — HyperLogLog++ distinct counts and quantile
#      sketches per event_type. At 100 TB exact distinct/percentile over
#      high-cardinality keys is a full-shuffle sort; the sketches are
#      mergeable map-side partials with bounded memory. Sketch values are
#      engine-hash-specific, so what the oracle checks is the CONTRACT:
#      the exact counts (oracle-computable) plus in-query tolerance flags
#      — HLL within 3×rsd of the exact distinct, approx percentiles
#      within 5% + 0.5 of the exact ones (measured headroom: HLL is
#      within 0.4%, percentiles within 1.6 abs on testdata). A broken
#      sketch shows up as a FALSE flag mismatching the oracle's TRUE.
#      tests/test_sketches.py pins the tighter measured bounds.
# ---------------------------------------------------------------------------
_Q54_ORACLE = """
SELECT event_type,
       count(*) AS n_events,
       count(DISTINCT user_id) AS exact_users,
       TRUE AS hll_within_3rsd,
       TRUE AS pctl_within_tol
FROM events
GROUP BY event_type
"""


# Operator-only variant (bench `run_s`): the sketches a production job
# runs — HLL + quantile sketch — without the exact countDistinct/
# percentile twins the registered query adds to prove tolerance.
def _q54_bare(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.approx_count_distinct("user_id", rsd=0.02).alias("hll_users"),
        F.expr("approx_percentile(value, array(0.5,0.9,0.99), 10000)").alias(
            "pctl_sketch"
        ),
    )


@register(
    "q54_sketch_stats",
    covers="A3 A1 A2 streaming-shape",
    oracle=_Q54_ORACLE,
    bare=_q54_bare,
)
def q54_sketch_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    probes = [0.5, 0.9, 0.99]
    agg = ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.countDistinct("user_id").alias("exact_users"),
        F.approx_count_distinct("user_id", rsd=0.02).alias("_hll"),
        F.expr(f"percentile(value, array({','.join(map(str, probes))}))").alias("_pe"),
        F.expr(
            f"approx_percentile(value, array({','.join(map(str, probes))}), 10000)"
        ).alias("_pa"),
    )
    p_ok = F.lit(True)
    for i in range(len(probes)):
        pe = F.element_at("_pe", i + 1)
        pa = F.element_at("_pa", i + 1)
        p_ok = p_ok & (F.abs(pa - pe) <= 0.05 * F.abs(pe) + 0.5)
    return agg.select(
        "event_type",
        "n_events",
        "exact_users",
        (
            F.abs(F.col("_hll") - F.col("exact_users"))
            <= 0.06 * F.col("exact_users")
        ).alias("hll_within_3rsd"),
        p_ok.alias("pctl_within_tol"),
    )


# ---------------------------------------------------------------------------
# q55: exact interpolated percentiles per group (the exact twin of q54's
#      sketches; Spark `percentile` and DuckDB `quantile_cont` share the
#      index = p*(n-1) linear-interpolation definition over sorted
#      doubles, so values agree bit-for-bit before output rounding)
# ---------------------------------------------------------------------------
@register(
    "q55_exact_percentiles",
    covers="A1 A2 scalar-census",
    oracle="""
SELECT event_type,
       count(*) AS n,
       round(quantile_cont(value, 0.5), 4) AS p50,
       round(quantile_cont(value, 0.9), 4) AS p90,
       round(quantile_cont(value, 0.99), 4) AS p99
FROM events
GROUP BY event_type
""",
)
def q55_exact_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.expr("percentile(value, 0.5)"), 4).alias("p50"),
        F.round(F.expr("percentile(value, 0.9)"), 4).alias("p90"),
        F.round(F.expr("percentile(value, 0.99)"), 4).alias("p99"),
    )


# ---------------------------------------------------------------------------
# q56: moving 7-day revenue via a RANGE window frame (value-based frame
#      over day numbers — includes empty days in the horizon, unlike a
#      ROWS frame; the time-series rollup idiom). Day number = epoch days
#      so the frame bound is a plain numeric range on both engines.
# ---------------------------------------------------------------------------
@register(
    "q56_moving_week_revenue",
    covers="W2 W3 A1 streaming-shape",
    oracle=f"""
WITH daily AS (
  SELECT l_returnflag,
         CAST(date_diff('day', DATE '1970-01-01', CAST(l_shipdate AS DATE)) AS BIGINT)
           AS day_no,
         CAST(l_shipdate AS DATE) AS ship_date,
         {sql_sum('l_extendedprice * (1 - l_discount)', 10000)} AS day_rev
  FROM lineitem GROUP BY 1, 2, 3
)
SELECT l_returnflag, ship_date, day_rev,
       round(sum(CAST(round(day_rev * 100, 0) AS BIGINT))
             OVER (PARTITION BY l_returnflag ORDER BY day_no
                   RANGE BETWEEN 6 PRECEDING AND CURRENT ROW) / 100.0, 2)
         AS week_rev
FROM daily
""",
)
def q56_moving_week_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    daily = li.groupBy(
        F.col("l_returnflag"),
        F.datediff(F.to_date("l_shipdate"), F.lit("1970-01-01").cast("date")).cast(
            "bigint"
        ).alias("day_no"),
        F.to_date("l_shipdate").alias("ship_date"),
    ).agg(
        exact_sum(
            F.col("l_extendedprice") * (1 - F.col("l_discount")), 10000
        ).alias("day_rev")
    )
    w = (
        W.partitionBy("l_returnflag")
        .orderBy("day_no")
        .rangeBetween(-6, W.currentRow)
    )
    day_cents = F.round(F.col("day_rev") * 100, 0).cast("bigint")
    return daily.select(
        "l_returnflag",
        "ship_date",
        "day_rev",
        F.round(F.sum(day_cents).over(w) / 100.0, 2).alias("week_rev"),
    )


# ---------------------------------------------------------------------------
# q62: JSON property extraction + semi-structured aggregation — the
#      engine's path for the `props` payload column: parse once with an
#      explicit schema (from_json, JVM-side — never a Python json loop),
#      then aggregate on the extracted field. Narrow parse + one shuffle.
# ---------------------------------------------------------------------------
@register(
    "q62_json_props",
    covers="P2 P5 A1 scalar-census",
    oracle="""
SELECT event_type,
       CAST(json_extract(props, '$.k') AS INT) % 10 AS k_bucket,
       count(*) AS n,
       CAST(min(CAST(json_extract(props, '$.k') AS INT)) AS INT) AS k_min,
       CAST(max(CAST(json_extract(props, '$.k') AS INT)) AS INT) AS k_max
FROM events
WHERE json_extract(props, '$.k') IS NOT NULL
GROUP BY 1, 2
""",
)
def q62_json_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    parsed = ev.withColumn(
        "k", F.from_json("props", "k INT")["k"]
    ).filter(F.col("k").isNotNull())
    return parsed.groupBy(
        "event_type", (F.col("k") % 10).alias("k_bucket")
    ).agg(
        F.count(F.lit(1)).alias("n"),
        F.min("k").alias("k_min"),
        F.max("k").alias("k_max"),
    )


# ---------------------------------------------------------------------------
# q65: native DataFrame pivot — groupBy().pivot() with explicit value
#      list (never the value-discovering form, which adds a full extra
#      scan job at scale). Same semantics as the A9 manual CASE pivot
#      (q22) through the dedicated API; Catalyst compiles both to one
#      aggregate pass.
# ---------------------------------------------------------------------------
@register(
    "q65_native_pivot",
    covers="A9 A1 P1",
    oracle=f"""
SELECT l_returnflag,
       {sql_sum("CASE WHEN l_linestatus = 'O' THEN l_quantity ELSE 0 END")} AS qty_O,
       {sql_sum("CASE WHEN l_linestatus = 'F' THEN l_quantity ELSE 0 END")} AS qty_F
FROM lineitem
GROUP BY l_returnflag
""",
)
def q65_native_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    pivoted = (
        li.groupBy("l_returnflag")
        .pivot("l_linestatus", ["O", "F"])
        .agg(exact_sum(F.col("l_quantity")))
    )
    return pivoted.select(
        "l_returnflag",
        F.coalesce("O", F.lit(0.0)).alias("qty_O"),
        F.coalesce("F", F.lit(0.0)).alias("qty_F"),
    )


# ---------------------------------------------------------------------------
# q66: unpivot/melt — the inverse reshape (wide metrics → long rows),
#      Spark's native `unpivot`; the oracle reconstructs via UNION ALL.
#      Narrow: each input row fans to one row per metric, no shuffle
#      until the final aggregate.
# ---------------------------------------------------------------------------
@register(
    "q66_unpivot_metrics",
    covers="U1 P1 A1",
    oracle=f"""
WITH metrics AS (
  SELECT o_orderstatus, 'totalprice' AS metric,
         CAST(round(o_totalprice * 100, 0) AS BIGINT) AS cents
  FROM orders
  UNION ALL
  SELECT o_orderstatus, 'orderkey_mod', CAST((o_orderkey % 97) * 100 AS BIGINT)
  FROM orders
)
SELECT o_orderstatus, metric,
       count(*) AS n, (sum(cents) / 100.0) AS total
FROM metrics
GROUP BY o_orderstatus, metric
""",
)
def q66_unpivot_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    wide = orders.select(
        "o_orderstatus",
        F.round(F.col("o_totalprice") * 100, 0).cast("bigint").alias("totalprice"),
        ((F.col("o_orderkey") % 97) * 100).cast("bigint").alias("orderkey_mod"),
    )
    long = wide.unpivot(
        ids=["o_orderstatus"],
        values=["totalprice", "orderkey_mod"],
        variableColumnName="metric",
        valueColumnName="cents",
    )
    return long.groupBy("o_orderstatus", "metric").agg(
        F.count(F.lit(1)).alias("n"),
        (F.sum("cents") / 100.0).alias("total"),
    )


# ---------------------------------------------------------------------------
# q67: GROUPING SETS — arbitrary aggregation granularities in one pass
#      (generalizes q08's ROLLUP; one Expand + one shuffle regardless of
#      how many sets). Sets chosen to NOT nest: (flag, status), (flag),
#      (status), () — a shape ROLLUP cannot express.
# ---------------------------------------------------------------------------
_Q67_SQL = """
SELECT l_returnflag, l_linestatus,
       CAST(grouping(l_returnflag) AS INT) AS g_flag,
       CAST(grouping(l_linestatus) AS INT) AS g_status,
       count(*) AS n,
       CAST(sum(CAST(round(l_quantity * 100, 0) AS BIGINT)) AS DOUBLE) / 100.0
           AS total_qty
FROM lineitem
GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag),
                        (l_linestatus), ())
"""


@register(
    "q67_grouping_sets",
    covers="A5 A6 A1",
    oracle=_Q67_SQL,
)
def q67_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..sources import register_star_schema

    register_star_schema(spark, sf_dir)
    return spark.sql(_Q67_SQL)


# ---------------------------------------------------------------------------
# q68: the full ranking-function family — dense_rank, ntile, percent_rank,
#      cume_dist over one totally-ordered window (the reference corpus
#      uses only rank/row_number; the engine exposes the whole family).
# ---------------------------------------------------------------------------
@register(
    "q68_rank_family",
    covers="W1 W2 A1",
    oracle=f"""
WITH nat AS (
  SELECT n_name, count(*) AS n_customers,
         CAST(sum(c_custkey) AS BIGINT) AS key_sum
  FROM customer JOIN nation ON c_nationkey = n_nationkey
  GROUP BY n_name
)
SELECT n_name, n_customers,
       rank()         OVER w AS rk,
       dense_rank()   OVER w AS drk,
       ntile(4)       OVER w AS quartile,
       round(percent_rank() OVER w, 6) AS pct_rank,
       round(cume_dist()    OVER w, 6) AS cume
FROM nat
WINDOW w AS (ORDER BY n_customers DESC, n_name)
""",
)
def q68_rank_family(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..sources import load_table as _lt

    customer = _lt(spark, sf_dir, "customer")
    nation = _lt(spark, sf_dir, "nation")
    nat = (
        customer.join(
            F.broadcast(nation), customer.c_nationkey == nation.n_nationkey
        )
        .groupBy("n_name")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.sum("c_custkey").alias("key_sum"),
        )
    )
    # nation-count cardinality is calendar-of-nations bounded (25) — the
    # unpartitioned window is constant-size at any raw scale
    w = W.orderBy(F.col("n_customers").desc(), F.col("n_name"))
    return nat.select(
        "n_name",
        "n_customers",
        F.rank().over(w).alias("rk"),
        F.dense_rank().over(w).alias("drk"),
        F.ntile(4).over(w).alias("quartile"),
        F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
        F.round(F.cume_dist().over(w), 6).alias("cume"),
    )


# ---------------------------------------------------------------------------
# q71: multi-CTE year-over-year cross-channel growth — the reference
#      corpus's deepest composition shape (ref sql/q4.sql:1-108,
#      q14a.sql:1-100): a 3-channel year_total CTE self-joined six ways,
#      first-year-positive guards, and cross-channel growth-rate
#      comparisons. The DuckDB oracle keeps the literal 6-way self-join
#      CTE form; the Spark plan re-expresses it as ONE conditional-pivot
#      aggregation (sum(CASE channel×year)) — identical semantics, one
#      shuffle on custkey instead of six joins of the same CTE, which is
#      the plan you want at 100 TB. Growth comparisons run as exact
#      BIGINT-cents cross-multiplications (no double division until the
#      output boundary), so engines agree bit-for-bit.
# ---------------------------------------------------------------------------
_Q71_RET = (
    "sum(CAST(round(l_extendedprice*(1-l_discount)*10000,0) AS BIGINT))"
)

_Q71_ORACLE = f"""
WITH year_total AS (
  SELECT o_custkey AS custkey, year(o_orderdate) AS yr, 'pri' AS channel,
         sum(CAST(round(o_totalprice * 100, 0) AS BIGINT)) AS cents
  FROM orders WHERE o_orderpriority IN ('1-URGENT','2-HIGH') GROUP BY 1,2
  UNION ALL
  SELECT o_custkey, year(o_orderdate), 'std',
         sum(CAST(round(o_totalprice * 100, 0) AS BIGINT))
  FROM orders WHERE o_orderpriority NOT IN ('1-URGENT','2-HIGH') GROUP BY 1,2
  UNION ALL
  SELECT o_custkey, year(o_orderdate), 'ret',
         CAST(((({_Q71_RET}+50) - ({_Q71_RET}+50) % 100) / 100) AS BIGINT)
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
  WHERE l_returnflag='R' GROUP BY 1,2
)
SELECT p1.custkey AS custkey, c.c_name AS c_name,
  round(CAST(p2.cents AS DOUBLE)/p1.cents, 6) AS pri_growth,
  round(CAST(s2.cents AS DOUBLE)/s1.cents, 6) AS std_growth,
  round(CAST(r2.cents AS DOUBLE)/r1.cents, 6) AS ret_growth
FROM year_total p1
JOIN year_total p2 ON p1.custkey=p2.custkey AND p2.channel='pri' AND p2.yr=1999
JOIN year_total s1 ON p1.custkey=s1.custkey AND s1.channel='std' AND s1.yr=1998
JOIN year_total s2 ON p1.custkey=s2.custkey AND s2.channel='std' AND s2.yr=1999
JOIN year_total r1 ON p1.custkey=r1.custkey AND r1.channel='ret' AND r1.yr=1998
JOIN year_total r2 ON p1.custkey=r2.custkey AND r2.channel='ret' AND r2.yr=1999
JOIN customer c ON c.c_custkey = p1.custkey
WHERE p1.channel='pri' AND p1.yr=1998
  AND p1.cents > 0 AND s1.cents > 0 AND r1.cents > 0
  AND p2.cents * s1.cents > s2.cents * p1.cents
  AND p2.cents * r1.cents > r2.cents * p1.cents
ORDER BY custkey LIMIT 100
"""


@register(
    "q71_yoy_cross_channel",
    covers="A9 A10 J1 J9 U1 O1 O2 P3 P5",
    oracle=_Q71_ORACLE,
)
def q71_yoy_cross_channel(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    lineitem = _t(spark, sf_dir, "lineitem")
    customer = _t(spark, sf_dir, "customer")

    is_pri = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    ord_tot = orders.select(
        F.col("o_custkey").alias("custkey"),
        F.year("o_orderdate").alias("yr"),
        F.when(is_pri, F.lit("pri")).otherwise(F.lit("std")).alias("channel"),
        cents(F.col("o_totalprice")).alias("_c"),
    )
    ret_raw = (
        lineitem.filter(F.col("l_returnflag") == "R")
        .join(orders, lineitem.l_orderkey == orders.o_orderkey)
        .select(
            F.col("o_custkey").alias("custkey"),
            F.year("o_orderdate").alias("yr"),
            F.lit("ret").alias("channel"),
            cents(F.col("l_extendedprice") * (1 - F.col("l_discount")), 10000).alias("_c"),
        )
    )
    # half-up 1e4→cents happens per (custkey, yr) AFTER the sum, so the
    # 'ret' branch aggregates first, then unions with the order channels
    ret_tot = (
        ret_raw.groupBy("custkey", "yr", "channel")
        .agg(F.sum("_c").alias("_s"))
        .select(
            "custkey",
            "yr",
            "channel",
            (
                ((F.col("_s") + 50) - (F.col("_s") + 50) % 100) / 100
            ).cast("long").alias("cents"),
        )
    )
    ord_tot_agg = ord_tot.groupBy("custkey", "yr", "channel").agg(
        F.sum("_c").alias("cents")
    )
    year_total = ord_tot_agg.unionByName(ret_tot)

    def _cell(ch: str, yr: int):
        return F.sum(
            F.when(
                (F.col("channel") == ch) & (F.col("yr") == yr), F.col("cents")
            )
        )

    pivot = year_total.groupBy("custkey").agg(
        _cell("pri", 1998).alias("p1"),
        _cell("pri", 1999).alias("p2"),
        _cell("std", 1998).alias("s1"),
        _cell("std", 1999).alias("s2"),
        _cell("ret", 1998).alias("r1"),
        _cell("ret", 1999).alias("r2"),
    )
    kept = pivot.filter(
        F.col("p1").isNotNull() & (F.col("p1") > 0)
        & F.col("s1").isNotNull() & (F.col("s1") > 0)
        & F.col("r1").isNotNull() & (F.col("r1") > 0)
        & F.col("p2").isNotNull() & F.col("s2").isNotNull() & F.col("r2").isNotNull()
        & (F.col("p2") * F.col("s1") > F.col("s2") * F.col("p1"))
        & (F.col("p2") * F.col("r1") > F.col("r2") * F.col("p1"))
    )
    return (
        kept.join(F.broadcast(customer), kept.custkey == customer.c_custkey)
        .select(
            "custkey",
            "c_name",
            F.round(F.col("p2").cast("double") / F.col("p1"), 6).alias("pri_growth"),
            F.round(F.col("s2").cast("double") / F.col("s1"), 6).alias("std_growth"),
            F.round(F.col("r2").cast("double") / F.col("r1"), 6).alias("ret_growth"),
        )
        .orderBy("custkey")
        .limit(100)
    )


# ---------------------------------------------------------------------------
# q73: cross-channel INTERSECT composite — the reference's q14a shape
#      (ref sql/q14a.sql:1-100): a per-channel sales CTE, a cross_items
#      set built by INTERSECTing the three channels' item sets, a scalar
#      average-sales threshold, and a ROLLUP over the union-constrained
#      result. The threshold comparison is a BIGINT cross-multiplication
#      (c4·n > Σc4) — no double average crosses the engine boundary, so
#      rows at the threshold cannot flip between Spark and DuckDB.
# ---------------------------------------------------------------------------
_Q73_ORACLE = """
WITH per AS (
  SELECT l_returnflag AS channel, l_partkey,
         sum(CAST(round(l_extendedprice * (1 - l_discount) * 10000, 0) AS BIGINT)) AS c4
  FROM lineitem GROUP BY 1, 2
),
cross_parts AS (
  SELECT l_partkey FROM per WHERE channel = 'A'
  INTERSECT
  SELECT l_partkey FROM per WHERE channel = 'N'
  INTERSECT
  SELECT l_partkey FROM per WHERE channel = 'R'
),
threshold AS (SELECT sum(c4) AS s, count(*) AS n FROM per)
SELECT channel, p_brand,
       CAST(grouping(channel) AS INT) AS g_channel,
       CAST(grouping(p_brand) AS INT) AS g_brand,
       count(*) AS n_parts,
       ((sum(c4) + 50) - (sum(c4) + 50) % 100) / 100 / 100.0 AS revenue
FROM per
JOIN cross_parts USING (l_partkey)
JOIN part ON l_partkey = p_partkey
CROSS JOIN threshold
WHERE per.c4 * threshold.n > threshold.s
GROUP BY ROLLUP(channel, p_brand)
"""


@register(
    "q73_cross_channel_intersect",
    covers="U2 A5 A6 J1 J9 A1 A2 P5",
    oracle=_Q73_ORACLE,
)
def q73_cross_channel_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part")

    per = li.groupBy(
        F.col("l_returnflag").alias("channel"), F.col("l_partkey")
    ).agg(
        F.sum(
            cents(F.col("l_extendedprice") * (1 - F.col("l_discount")), 10000)
        ).alias("c4")
    )

    def chan(c: str) -> DataFrame:
        return per.filter(F.col("channel") == c).select("l_partkey")

    cross_parts = chan("A").intersect(chan("N")).intersect(chan("R"))
    threshold = per.agg(
        F.sum("c4").alias("s"), F.count(F.lit(1)).alias("n")
    )

    joined = (
        per.join(cross_parts, "l_partkey")
        .join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .crossJoin(F.broadcast(threshold))
        .filter(F.col("c4") * F.col("n") > F.col("s"))
    )
    s = F.sum("c4")
    t = s + F.lit(50)
    return joined.rollup("channel", "p_brand").agg(
        F.grouping("channel").cast("int").alias("g_channel"),
        F.grouping("p_brand").cast("int").alias("g_brand"),
        F.count(F.lit(1)).alias("n_parts"),
        (((t - t % 100) / 100) / 100.0).alias("revenue"),
    ).select(
        "channel", "p_brand", "g_channel", "g_brand", "n_parts", "revenue"
    )


# ---------------------------------------------------------------------------
# q74: rank + lag/lead SELF-JOIN chain — the reference's literal q47
#      emulation shape (ref sql/q47.sql:15-54: CTE v1 self-joined as
#      v1_lag/v1_lead on rn±1). q07 covers the idiomatic lag/lead window
#      form; this query runs the reference's 3-way self-join form, and
#      the DuckDB oracle computes the same result with window functions —
#      cross-validating the two implementations against each other.
# ---------------------------------------------------------------------------
_Q74_ORACLE = f"""
WITH monthly AS (
  SELECT l_returnflag,
         CAST(date_part('year', l_shipdate) AS INT) AS ship_year,
         CAST(date_part('month', l_shipdate) AS INT) AS ship_month,
         {sql_sum('l_quantity')} AS qty
  FROM lineitem GROUP BY 1, 2, 3
)
SELECT l_returnflag, ship_year, ship_month, qty,
       lag(qty, 1)  OVER w AS prev_qty,
       lead(qty, 1) OVER w AS next_qty
FROM monthly
WINDOW w AS (PARTITION BY l_returnflag ORDER BY ship_year, ship_month)
"""


@register(
    "q74_rank_selfjoin_chain",
    covers="J8 W1 J3 A1",
    oracle=_Q74_ORACLE,
)
def q74_rank_selfjoin_chain(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    monthly = li.groupBy(
        "l_returnflag",
        F.year("l_shipdate").alias("ship_year"),
        F.month("l_shipdate").alias("ship_month"),
    ).agg(exact_sum(F.col("l_quantity")).alias("qty"))
    w = W.partitionBy("l_returnflag").orderBy("ship_year", "ship_month")
    v1 = monthly.withColumn("rn", F.row_number().over(w))

    cur = v1.alias("cur")
    lagv = v1.select(
        F.col("l_returnflag").alias("_f"),
        (F.col("rn") + 1).alias("_rn"),
        F.col("qty").alias("prev_qty"),
    )
    leadv = v1.select(
        F.col("l_returnflag").alias("_f"),
        (F.col("rn") - 1).alias("_rn"),
        F.col("qty").alias("next_qty"),
    )
    return (
        cur.join(
            lagv,
            (F.col("cur.l_returnflag") == lagv._f) & (F.col("cur.rn") == lagv._rn),
            "left",
        )
        .join(
            leadv,
            (F.col("cur.l_returnflag") == leadv._f) & (F.col("cur.rn") == leadv._rn),
            "left",
        )
        .select(
            "cur.l_returnflag",
            "cur.ship_year",
            "cur.ship_month",
            "cur.qty",
            "prev_qty",
            "next_qty",
        )
    )


# ---------------------------------------------------------------------------
# q88: CUBE + GROUPING() — the third grouping-set family member next to
#      ROLLUP (q08) and explicit GROUPING SETS (q67): all 2^k subtotal
#      combinations in ONE Expand + ONE shuffle (Catalyst plans cube the
#      same way as rollup — no per-subtotal re-aggregation).
# ---------------------------------------------------------------------------
@register(
    "q88_cube_grouping",
    covers="A5 A6 A1",
    oracle=f"""
SELECT l_returnflag, l_linestatus,
       CAST(grouping(l_returnflag) AS BIGINT) AS g_flag,
       CAST(grouping(l_linestatus) AS BIGINT) AS g_status,
       {sql_sum('l_quantity')} AS sum_qty,
       count(*) AS n
FROM lineitem
GROUP BY CUBE (l_returnflag, l_linestatus)
""",
)
def q88_cube_grouping(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    return li.cube("l_returnflag", "l_linestatus").agg(
        F.grouping("l_returnflag").cast("bigint").alias("g_flag"),
        F.grouping("l_linestatus").cast("bigint").alias("g_status"),
        exact_sum(F.col("l_quantity")).alias("sum_qty"),
        F.count(F.lit(1)).alias("n"),
    )
