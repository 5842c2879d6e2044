-- Spark-SQL corpus file (ANSI subset shared with the DuckDB oracle).
-- Runs over the temp views registered by sources.register_star_schema.
WITH rev AS (
  SELECT p_brand, p_partkey,
         ((((sum(CAST(round((l_extendedprice * (1 - l_discount)) * 10000, 0) AS BIGINT)) + 50) - (sum(CAST(round((l_extendedprice * (1 - l_discount)) * 10000, 0) AS BIGINT)) + 50) % 100) / 100) / 100.0) AS revenue
  FROM lineitem JOIN part ON l_partkey = p_partkey
  GROUP BY p_brand, p_partkey
)
SELECT p_brand, p_partkey, revenue, rk
FROM (SELECT *, rank() OVER (PARTITION BY p_brand
                             ORDER BY revenue DESC, p_partkey) AS rk
      FROM rev) t
WHERE rk <= 3
