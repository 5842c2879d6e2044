-- Spark-SQL corpus file (ANSI subset shared with the DuckDB oracle).
-- Runs over the temp views registered by sources.register_star_schema.
SELECT o_custkey, count(*) AS n_orders, (sum(CAST(round((o_totalprice) * 100, 0) AS BIGINT)) / 100.0) AS total
FROM orders
GROUP BY o_custkey
HAVING count(*) >= 3
   AND sum(CAST(round(o_totalprice * 100, 0) AS BIGINT)) / 100.0 > 300000
