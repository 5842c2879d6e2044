-- Spark-SQL corpus file (ANSI subset shared with the DuckDB oracle).
-- Runs over the temp views registered by sources.register_star_schema.
WITH t AS (
  SELECT doc_id,
         split(trim(regexp_replace(lower(text), '\\s+', ' ')), ' ') AS toks,
         CASE WHEN trim(regexp_replace(lower(text), '\\s+', ' ')) = '' THEN 0
              ELSE size(split(trim(regexp_replace(lower(text), '\\s+', ' ')), ' ')) END AS n
  FROM documents
), c AS (
  SELECT doc_id, n, toks,
         transform(sequence(0, greatest(CAST(ceil((n - 32) / 24.0) AS BIGINT), 0)),
                   i -> CAST(i * 24 AS INT)) AS starts
  FROM t WHERE n > 0
), chunks AS (
  SELECT doc_id,
         md5(concat_ws(' ', slice(toks, st + 1, least(st + 32, n) - st))) AS fp
  FROM c LATERAL VIEW posexplode(starts) AS i, st
), flagged AS (
  SELECT doc_id, fp, count(*) OVER (PARTITION BY fp) > 1 AS is_dup FROM chunks
)
SELECT doc_id,
       count(*) AS n_chunks,
       CAST(sum(CASE WHEN is_dup THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_chunks,
       round(CAST(sum(CASE WHEN is_dup THEN 1 ELSE 0 END) AS DOUBLE) / count(*), 4) AS dup_ratio
FROM flagged
GROUP BY doc_id
