-- Spark-SQL corpus file (ANSI subset shared with the DuckDB oracle).
-- Runs over the temp views registered by sources.register_star_schema.
WITH daily AS (
  SELECT CAST(l_shipdate AS DATE) AS ship_date, l_returnflag,
         ((((sum(CAST(round((l_extendedprice * (1 - l_discount)) * 10000, 0) AS BIGINT)) + 50) - (sum(CAST(round((l_extendedprice * (1 - l_discount)) * 10000, 0) AS BIGINT)) + 50) % 100) / 100) / 100.0) AS day_rev
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
