-- Spark-SQL corpus file (ANSI subset shared with the DuckDB oracle —
-- which uses DuckDB's native ASOF LEFT JOIN; here the as-of semantics
-- are spelled with a range join + latest-row window).
WITH versions AS (
  SELECT user_id, ts, value FROM (
    SELECT user_id, ts, value,
           row_number() OVER (PARTITION BY user_id, ts ORDER BY event_id DESC) AS rn
    FROM events WHERE event_type = 'purchase'
  ) WHERE rn = 1
), probes AS (
  SELECT event_id, user_id, ts FROM events WHERE event_type = 'click'
), j AS (
  SELECT p.event_id, p.user_id, p.ts AS pts, v.ts AS vts, v.value,
         row_number() OVER (PARTITION BY p.event_id ORDER BY v.ts DESC) AS rn
  FROM probes p LEFT JOIN versions v
    ON p.user_id = v.user_id AND v.ts <= p.ts
)
SELECT event_id, user_id,
       date_trunc('second', pts) AS click_time,
       date_trunc('second', vts) AS purchase_time,
       round(value, 2) AS purchase_value
FROM j WHERE rn = 1
