-- Spark-SQL corpus file (ANSI subset shared with the DuckDB oracle).
-- Runs over the temp views registered by sources.register_star_schema.
WITH norm AS (
  SELECT doc_id, split(trim(regexp_replace(lower(text), '\\s+', ' ')), ' ') AS t FROM documents
), sh AS (
  SELECT doc_id,
         array_distinct(transform(sequence(0, greatest(size(t) - 3, 0)),
                                  i -> concat_ws(' ', slice(t, i + 1, 3)))) AS s
  FROM norm
)
SELECT a.doc_id AS id_a, b.doc_id AS id_b,
       round(CAST(size(array_intersect(a.s, b.s)) AS DOUBLE)
             / size(array_distinct(concat(a.s, b.s))), 6) AS jaccard
FROM sh a JOIN sh b ON a.doc_id < b.doc_id
WHERE CAST(size(array_intersect(a.s, b.s)) AS DOUBLE)
      / size(array_distinct(concat(a.s, b.s))) >= 0.5
