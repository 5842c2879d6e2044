-- Spark-SQL corpus file (ANSI subset shared with the DuckDB oracle).
-- Runs over the temp views registered by sources.register_star_schema.
SELECT channel, count(*) AS n, (sum(CAST(round((o_totalprice) * 100, 0) AS BIGINT)) / 100.0) AS total
FROM (
  SELECT 'urgent' AS channel, o_totalprice FROM orders
  WHERE o_orderpriority IN ('1-URGENT', '2-HIGH')
  UNION ALL
  SELECT 'normal' AS channel, o_totalprice FROM orders
  WHERE o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
) t
GROUP BY channel
