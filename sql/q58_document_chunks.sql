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
)
SELECT doc_id, CAST(i AS INT) AS chunk_idx,
       st AS tok_start,
       CAST(least(st + 32, n) AS INT) AS tok_end,
       concat_ws(' ', slice(toks, st + 1, least(st + 32, n) - st)) AS chunk_text
FROM c LATERAL VIEW posexplode(starts) AS i, st
