-- Spark-SQL corpus file (ANSI subset shared with the DuckDB oracle).
-- Runs over the temp views registered by sources.register_star_schema.
SELECT o_orderstatus,
       count(DISTINCT o_custkey) AS n_customers,
       count(*) AS n_orders,
       (sum(CAST(round((o_totalprice) * 100, 0) AS BIGINT)) / 100.0) AS total_price
FROM orders
GROUP BY o_orderstatus
