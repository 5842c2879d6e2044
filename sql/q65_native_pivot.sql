-- Spark-SQL corpus file (ANSI subset shared with the DuckDB oracle).
-- Runs over the temp views registered by sources.register_star_schema.
SELECT l_returnflag,
       (sum(CAST(round((CASE WHEN l_linestatus = 'O' THEN l_quantity ELSE 0 END) * 100, 0) AS BIGINT)) / 100.0) AS qty_O,
       (sum(CAST(round((CASE WHEN l_linestatus = 'F' THEN l_quantity ELSE 0 END) * 100, 0) AS BIGINT)) / 100.0) AS qty_F
FROM lineitem
GROUP BY l_returnflag
