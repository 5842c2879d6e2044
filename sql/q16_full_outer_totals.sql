-- Spark-SQL corpus file (ANSI subset shared with the DuckDB oracle).
-- Runs over the temp views registered by sources.register_star_schema.
WITH tot AS (
  SELECT o_custkey, (sum(CAST(round((o_totalprice) * 100, 0) AS BIGINT)) / 100.0) AS order_total
  FROM orders GROUP BY o_custkey
), rich AS (
  SELECT c_custkey, round(c_acctbal, 2) AS acctbal
  FROM customer WHERE c_acctbal > 5000
)
SELECT coalesce(t.o_custkey, r.c_custkey) AS custkey,
       coalesce(t.order_total, 0.0) AS order_total,
       coalesce(r.acctbal, 0.0) AS acctbal
FROM tot t FULL OUTER JOIN rich r ON t.o_custkey = r.c_custkey
