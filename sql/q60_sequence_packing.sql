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
  SELECT doc_id, CAST(i AS INT) AS chunk_idx,
         CAST(least(st + 32, n) - st AS BIGINT) AS n_tokens
  FROM c LATERAL VIEW posexplode(starts) AS i, st
), packed AS (
  SELECT doc_id % 8 AS bucket, n_tokens,
         CAST(floor((sum(n_tokens) OVER (PARTITION BY doc_id % 8
                                         ORDER BY doc_id, chunk_idx
                                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                     - n_tokens) / 256.0) AS BIGINT) AS pack_idx
  FROM chunks
)
SELECT bucket, pack_idx,
       count(*) AS n_chunks,
       CAST(sum(n_tokens) AS BIGINT) AS n_tokens_total
FROM packed
GROUP BY bucket, pack_idx
