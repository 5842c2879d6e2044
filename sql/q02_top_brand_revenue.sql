-- Spark-SQL corpus file (ANSI subset shared with the DuckDB oracle).
-- Runs over the temp views registered by sources.register_star_schema.
SELECT p_brand,
       ((((sum(CAST(round((l_extendedprice * (1 - l_discount)) * 10000, 0) AS BIGINT)) + 50) - (sum(CAST(round((l_extendedprice * (1 - l_discount)) * 10000, 0) AS BIGINT)) + 50) % 100) / 100) / 100.0) AS revenue,
       count(*) AS n_items
FROM lineitem
JOIN part ON l_partkey = p_partkey
JOIN supplier ON l_suppkey = s_suppkey
WHERE p_size >= 10
GROUP BY p_brand
ORDER BY revenue DESC, p_brand
LIMIT 10
