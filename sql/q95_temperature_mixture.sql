-- Spark-SQL corpus file (ANSI subset shared with the DuckDB oracle).
-- Runs over the temp views registered by sources.register_star_schema.
WITH sz AS (
  SELECT source, count(*) AS n_docs,
         CAST(sum(CASE WHEN trim(text) = '' THEN 0
                       ELSE size(split(trim(text), '\\s+')) END) AS BIGINT) AS n_tokens
  FROM documents GROUP BY source
), tot AS (
  SELECT CAST(sum(n_tokens) AS DOUBLE) AS tn,
         sum(sqrt(CAST(n_tokens AS DOUBLE))) AS ta
  FROM sz
)
SELECT source, n_docs, n_tokens,
       round(CAST(n_tokens AS DOUBLE) / t.tn, 6) AS p_raw,
       round(sqrt(CAST(n_tokens AS DOUBLE)) / t.ta, 6) AS p_temp,
       round((sqrt(CAST(n_tokens AS DOUBLE)) / t.ta) / (CAST(n_tokens AS DOUBLE) / t.tn), 4) AS boost
FROM sz CROSS JOIN tot t
