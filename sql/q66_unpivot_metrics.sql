-- Spark-SQL corpus file (ANSI subset shared with the DuckDB oracle).
-- Runs over the temp views registered by sources.register_star_schema.
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
