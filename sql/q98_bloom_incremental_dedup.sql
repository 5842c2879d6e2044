-- Spark-SQL corpus file (ANSI subset shared with the DuckDB oracle).
-- SQL front door states q98's semantic contract — incoming-batch anti
-- join against the existing corpus's fingerprints. (The DataFrame twin
-- computes the same rows through the Bloom-prefilter scale path.)
WITH fp AS (
  SELECT doc_id, source,
         md5(trim(regexp_replace(lower(text), '\\s+', ' '))) AS fingerprint
  FROM documents
), inc AS (
  SELECT doc_id, source, fingerprint FROM fp WHERE doc_id % 3 = 0
  UNION ALL
  SELECT doc_id + 1000000 AS doc_id, source, fingerprint
  FROM fp WHERE doc_id % 3 <> 0 AND doc_id % 7 = 1
), ex AS (
  SELECT DISTINCT fingerprint FROM fp WHERE doc_id % 3 <> 0
)
SELECT i.doc_id, i.source, i.fingerprint
FROM inc i LEFT ANTI JOIN ex e ON i.fingerprint = e.fingerprint
