-- Spark-SQL corpus file (ANSI subset shared with the DuckDB oracle).
-- Runs over the temp views registered by sources.register_star_schema.
SELECT event_type,
       (sum(CAST(round((CASE WHEN date_part('month', ts) IN (1, 2, 3) THEN value ELSE 0 END) * 100, 0) AS BIGINT)) / 100.0) AS q1_val,
       (sum(CAST(round((CASE WHEN date_part('month', ts) IN (4, 5, 6) THEN value ELSE 0 END) * 100, 0) AS BIGINT)) / 100.0) AS q2_val,
       (sum(CAST(round((CASE WHEN date_part('month', ts) IN (7, 8, 9) THEN value ELSE 0 END) * 100, 0) AS BIGINT)) / 100.0) AS q3_val,
       (sum(CAST(round((CASE WHEN date_part('month', ts) IN (10, 11, 12) THEN value ELSE 0 END) * 100, 0) AS BIGINT)) / 100.0) AS q4_val,
       count(*) AS n
FROM events
GROUP BY event_type
