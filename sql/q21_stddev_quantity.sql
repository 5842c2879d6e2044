-- Spark-SQL corpus file (ANSI subset shared with the DuckDB oracle).
-- Runs over the temp views registered by sources.register_star_schema.
SELECT l_returnflag,
       round(stddev_samp(l_quantity), 4) AS std_qty,
       round(avg(l_quantity), 4) AS avg_qty,
       round(stddev_samp(l_quantity) / avg(l_quantity), 4) AS cov
FROM lineitem
GROUP BY l_returnflag
