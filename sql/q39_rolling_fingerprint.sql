-- Spark-SQL corpus file (ANSI subset shared with the DuckDB oracle).
-- Runs over the temp views registered by sources.register_star_schema.
WITH n AS (
  SELECT doc_id, trim(regexp_replace(lower(text), '\\s+', ' ')) AS t FROM documents
), g AS (
  SELECT doc_id,
         transform(sequence(1, greatest(length(t) - 7, 1)),
                   i -> md5(substr(t, i, 8))) AS hs
  FROM n
)
SELECT doc_id, size(hs) AS n_kgrams, array_min(hs) AS fp_min,
       concat_ws('', slice(array_sort(hs), 1, 4)) AS fp_sketch
FROM g
