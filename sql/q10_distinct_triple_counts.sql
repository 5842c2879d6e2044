-- Spark-SQL corpus file (ANSI subset shared with the DuckDB oracle).
-- Runs over the temp views registered by sources.register_star_schema.
SELECT o_orderpriority, count(*) AS n_distinct_pairs
FROM (SELECT DISTINCT o_custkey, o_orderstatus, o_orderpriority FROM orders) t
GROUP BY o_orderpriority
