-- Spark-SQL corpus file (ANSI subset shared with the DuckDB oracle).
-- Runs over the temp views registered by sources.register_star_schema.
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
