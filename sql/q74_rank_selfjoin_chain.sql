-- Spark-SQL corpus file (ANSI subset shared with the DuckDB oracle).
-- Runs over the temp views registered by sources.register_star_schema.
-- window form of the DataFrame query's 3-way rank self-join chain
WITH monthly AS (
  SELECT l_returnflag,
         year(l_shipdate) AS ship_year,
         month(l_shipdate) AS ship_month,
         (sum(CAST(round((l_quantity) * 100, 0) AS BIGINT)) / 100.0) AS qty
  FROM lineitem GROUP BY 1, 2, 3
)
SELECT l_returnflag, ship_year, ship_month, qty,
       lag(qty)  OVER w AS prev_qty,
       lead(qty) OVER w AS next_qty
FROM monthly
WINDOW w AS (PARTITION BY l_returnflag ORDER BY ship_year, ship_month)
