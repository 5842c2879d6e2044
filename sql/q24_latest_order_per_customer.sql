-- Spark-SQL corpus file (ANSI subset shared with the DuckDB oracle).
-- Runs over the temp views registered by sources.register_star_schema.
SELECT o_custkey, o_orderkey AS latest_orderkey,
       CAST(o_orderdate AS DATE) AS latest_orderdate,
       round(o_totalprice, 2) AS totalprice
FROM (
  SELECT *, row_number() OVER (PARTITION BY o_custkey
                               ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
  FROM orders
) t WHERE rn = 1
