-- Spark-SQL corpus file (ANSI subset shared with the DuckDB oracle).
-- Runs over the temp views registered by sources.register_star_schema.
WITH monthly AS (
  SELECT l_returnflag,
         CAST(date_part('year', l_shipdate) AS INT) AS ship_year,
         CAST(date_part('month', l_shipdate) AS INT) AS ship_month,
         sum(CAST(round(l_extendedprice * (1 - l_discount) * 10000, 0) AS BIGINT)) / 10000.0 AS rev_raw,
         ((((sum(CAST(round((l_extendedprice * (1 - l_discount)) * 10000, 0) AS BIGINT)) + 50) - (sum(CAST(round((l_extendedprice * (1 - l_discount)) * 10000, 0) AS BIGINT)) + 50) % 100) / 100) / 100.0) AS rev
  FROM lineitem GROUP BY 1, 2, 3
)
SELECT l_returnflag, ship_year, ship_month,
       rev,
       round(avg_rev, 2) AS avg_rev
FROM (SELECT *, avg(rev_raw) OVER (PARTITION BY l_returnflag) AS avg_rev FROM monthly) t
WHERE avg_rev > 0 AND abs(rev_raw - avg_rev) / avg_rev > 0.1
