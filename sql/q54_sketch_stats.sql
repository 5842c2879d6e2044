-- Spark-SQL corpus file (ANSI subset shared with the DuckDB oracle).
-- Runs over the temp views registered by sources.register_star_schema.
WITH a AS (
  SELECT event_type,
         count(*) AS n_events,
         count(DISTINCT user_id) AS exact_users,
         approx_count_distinct(user_id, 0.02) AS _hll,
         percentile(value, array(0.5, 0.9, 0.99)) AS _pe,
         approx_percentile(value, array(0.5, 0.9, 0.99), 10000) AS _pa
  FROM events GROUP BY event_type
)
SELECT event_type, n_events, exact_users,
       (abs(_hll - exact_users) <= 0.06 * exact_users) AS hll_within_3rsd,
       (abs(_pa[0] - _pe[0]) <= 0.05 * abs(_pe[0]) + 0.5
        AND abs(_pa[1] - _pe[1]) <= 0.05 * abs(_pe[1]) + 0.5
        AND abs(_pa[2] - _pe[2]) <= 0.05 * abs(_pe[2]) + 0.5) AS pctl_within_tol
FROM a
