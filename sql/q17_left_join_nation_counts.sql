-- Spark-SQL corpus file (ANSI subset shared with the DuckDB oracle).
-- Runs over the temp views registered by sources.register_star_schema.
SELECT n_name, coalesce(cnt, 0) AS n_rich
FROM nation n
LEFT JOIN (
  SELECT c_nationkey, count(*) AS cnt FROM customer
  WHERE c_acctbal > 8000 GROUP BY c_nationkey
) c ON n.n_nationkey = c.c_nationkey
