-- Spark-SQL corpus file (ANSI subset shared with the DuckDB oracle).
-- Runs over the temp views registered by sources.register_star_schema.
WITH v AS (
  SELECT vec_id, transform(embedding, e -> CAST(e AS DOUBLE)) AS x FROM embeddings
), s AS (
  SELECT vec_id, x, array_max(transform(x, e -> abs(e))) AS scale_raw FROM v
), q AS (
  SELECT vec_id, x, scale_raw,
         transform(x, e -> CASE WHEN scale_raw = 0 THEN 0
                                ELSE greatest(-127, least(127, CAST(round(e / scale_raw * 127, 0) AS INT))) END) AS qv
  FROM s
)
SELECT vec_id, scale_raw AS scale,
       qv[0] AS q0, qv[1] AS q1,
       array_max(zip_with(x, qv, (xe, qe) -> abs(xe - qe * (scale_raw / 127.0)))) AS max_abs_err
FROM q
