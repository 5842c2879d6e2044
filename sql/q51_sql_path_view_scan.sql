-- Spark-SQL corpus file (ANSI subset shared with the DuckDB oracle).
-- Runs over the temp views registered by sources.register_star_schema.
SELECT n_name,
       count(*) AS n_customers,
       CAST(sum(c_custkey) AS BIGINT) AS key_sum
FROM customer JOIN nation ON c_nationkey = n_nationkey
GROUP BY n_name
ORDER BY n_customers DESC, n_name
LIMIT 10
