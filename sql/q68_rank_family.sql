-- Spark-SQL corpus file (ANSI subset shared with the DuckDB oracle).
-- Runs over the temp views registered by sources.register_star_schema.
WITH nat AS (
  SELECT n_name, count(*) AS n_customers,
         CAST(sum(c_custkey) AS BIGINT) AS key_sum
  FROM customer JOIN nation ON c_nationkey = n_nationkey
  GROUP BY n_name
)
SELECT n_name, n_customers,
       rank()         OVER w AS rk,
       dense_rank()   OVER w AS drk,
       ntile(4)       OVER w AS quartile,
       round(percent_rank() OVER w, 6) AS pct_rank,
       round(cume_dist()    OVER w, 6) AS cume
FROM nat
WINDOW w AS (ORDER BY n_customers DESC, n_name)
