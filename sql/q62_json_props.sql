-- Spark-SQL port of the q62 oracle (DuckDB json_extract -> get_json_object)
SELECT event_type,
       CAST(get_json_object(props, '$.k') AS INT) % 10 AS k_bucket,
       count(*) AS n,
       min(CAST(get_json_object(props, '$.k') AS INT)) AS k_min,
       max(CAST(get_json_object(props, '$.k') AS INT)) AS k_max
FROM events
WHERE get_json_object(props, '$.k') IS NOT NULL
GROUP BY 1, 2
