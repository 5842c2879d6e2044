-- Spark-SQL corpus file (ANSI subset shared with the DuckDB oracle).
-- Runs over the temp views registered by sources.register_star_schema.
WITH monthly AS (
  SELECT l_returnflag,
         CAST(date_part('year', l_shipdate) AS INT) AS ship_year,
         CAST(date_part('month', l_shipdate) AS INT) AS ship_month,
         (sum(CAST(round((l_quantity) * 100, 0) AS BIGINT)) / 100.0) AS qty
  FROM lineitem GROUP BY 1, 2, 3
)
SELECT l_returnflag, ship_year, ship_month, qty,
       lag(qty, 1)  OVER w AS prev_qty,
       lead(qty, 1) OVER w AS next_qty,
       round(qty - coalesce(lag(qty, 1) OVER w, qty), 2) AS qty_delta
FROM monthly
WINDOW w AS (PARTITION BY l_returnflag ORDER BY ship_year, ship_month)
