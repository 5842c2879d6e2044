-- Spark-SQL port of the q55 oracle (DuckDB quantile_cont -> Spark percentile;
-- identical p*(n-1) linear interpolation)
SELECT event_type,
       count(*) AS n,
       round(percentile(value, 0.5), 4) AS p50,
       round(percentile(value, 0.9), 4) AS p90,
       round(percentile(value, 0.99), 4) AS p99
FROM events
GROUP BY event_type
