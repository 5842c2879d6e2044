-- Spark-SQL port of the q27 oracle (DuckDB date_diff -> unix_timestamp deltas)
WITH flagged AS (
  SELECT user_id, event_id, ts, value,
         CASE WHEN lag(ts) OVER w IS NULL
                OR unix_timestamp(ts) - unix_timestamp(lag(ts) OVER w) > 1800
              THEN 1 ELSE 0 END AS brk
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), numbered AS (
  SELECT *, CAST(sum(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
            AS session_idx
  FROM flagged
)
SELECT user_id, session_idx,
       count(*) AS n_events,
       date_trunc('second', min(ts)) AS session_start,
       date_trunc('second', max(ts)) AS session_end,
       unix_timestamp(max(ts)) - unix_timestamp(min(ts)) AS duration_s,
       ((sum(CAST(round((value) * 100, 0) AS BIGINT)) / 100.0)) AS total_value
FROM numbered
GROUP BY user_id, session_idx
