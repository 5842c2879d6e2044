-- Spark-SQL corpus file (ANSI subset shared with the DuckDB oracle).
-- Runs over the temp views registered by sources.register_star_schema.
WITH d AS (
  SELECT doc_id, source,
         CAST(CASE WHEN CAST(substring(source, 4, 10) AS INT) < 5 THEN 2300
                   WHEN CAST(substring(source, 4, 10) AS INT) < 10 THEN 1000
                   ELSE 400 END AS BIGINT) AS wpm,
         CAST(conv(substring(md5(concat_ws(':', CAST(doc_id AS STRING), '1')), 1, 6), 16, 10) AS BIGINT) % 1000 AS coin
  FROM documents
), r AS (
  SELECT doc_id, source,
         CAST(floor(wpm / 1000) AS BIGINT)
           + CASE WHEN coin < wpm % 1000 THEN 1 ELSE 0 END AS n_copies
  FROM d
), x AS (
  SELECT doc_id, source, explode(sequence(1, n_copies)) AS copy_idx
  FROM r WHERE n_copies > 0
), per AS (
  SELECT source,
         count(DISTINCT doc_id) AS n_docs_kept,
         count(*) AS n_rows_out,
         sum(copy_idx) AS sum_copy_idx
  FROM x GROUP BY source
), tot AS (
  SELECT source, count(*) AS n_docs_in FROM documents GROUP BY source
)
SELECT t.source, t.n_docs_in,
       CAST(coalesce(p.n_docs_kept, 0) AS BIGINT) AS n_docs_kept,
       CAST(coalesce(p.n_rows_out, 0) AS BIGINT) AS n_rows_out,
       CAST(coalesce(p.sum_copy_idx, 0) AS BIGINT) AS sum_copy_idx
FROM tot t LEFT JOIN per p ON t.source = p.source
