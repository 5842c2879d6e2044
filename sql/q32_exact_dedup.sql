-- Spark-SQL corpus file (ANSI subset shared with the DuckDB oracle).
-- Runs over the temp views registered by sources.register_star_schema.
WITH fp AS (
  SELECT doc_id,
         md5(trim(regexp_replace(lower(text), '\\s+', ' '))) AS fingerprint
  FROM documents
)
SELECT min(doc_id) AS doc_id, fingerprint, count(*) AS group_size
FROM fp GROUP BY fingerprint
