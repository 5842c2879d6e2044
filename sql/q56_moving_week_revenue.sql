-- Spark-SQL port of the q56 oracle (DuckDB date_diff -> Spark datediff)
WITH daily AS (
  SELECT l_returnflag,
         CAST(datediff(CAST(l_shipdate AS DATE), DATE '1970-01-01') AS BIGINT) AS day_no,
         CAST(l_shipdate AS DATE) AS ship_date,
         ((sum(CAST(round((l_extendedprice * (1 - l_discount)) * 10000, 0) AS BIGINT)) + 50)
          - (sum(CAST(round((l_extendedprice * (1 - l_discount)) * 10000, 0) AS BIGINT)) + 50) % 100) / 100 / 100.0
           AS day_rev
  FROM lineitem GROUP BY 1, 2, 3
)
SELECT l_returnflag, ship_date, day_rev,
       round(sum(CAST(round(day_rev * 100, 0) AS BIGINT))
             OVER (PARTITION BY l_returnflag ORDER BY day_no
                   RANGE BETWEEN 6 PRECEDING AND CURRENT ROW) / 100.0, 2)
         AS week_rev
FROM daily
