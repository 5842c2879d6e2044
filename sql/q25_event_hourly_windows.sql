-- Spark-SQL port of the q25 oracle (DuckDB time_bucket -> Spark window())
SELECT window(ts, '1 hour').start AS window_start,
       event_type,
       count(*) AS n,
       ((sum(CAST(round((value) * 100, 0) AS BIGINT)) / 100.0)) AS total_value
FROM events
GROUP BY window(ts, '1 hour'), event_type
HAVING count(*) >= 2
