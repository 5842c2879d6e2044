-- Spark-SQL corpus file (ANSI subset shared with the DuckDB oracle).
-- Runs over the temp views registered by sources.register_star_schema.
SELECT round(r.avg_r, 2) AS avg_return_price,
       round(n.avg_n, 2) AS avg_noreturn_price,
       round(r.avg_r / n.avg_n, 4) AS price_ratio
FROM (SELECT sum(CAST(round(l_extendedprice * 100, 0) AS BIGINT)) / 100.0 / count(*) AS avg_r
      FROM lineitem WHERE l_returnflag = 'R') r
CROSS JOIN
     (SELECT sum(CAST(round(l_extendedprice * 100, 0) AS BIGINT)) / 100.0 / count(*) AS avg_n
      FROM lineitem WHERE l_returnflag = 'N') n
