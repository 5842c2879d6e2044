-- Spark-SQL corpus file (ANSI subset shared with the DuckDB oracle).
-- Runs over the temp views registered by sources.register_star_schema.
WITH nrm AS (
  SELECT doc_id, trim(regexp_replace(lower(text), '\\s+', ' ')) AS t FROM documents
), tok AS (
  SELECT doc_id,
         CASE WHEN t = '' THEN CAST(array() AS ARRAY<STRING>)
              ELSE split(t, ' ') END AS w
  FROM nrm
), g0 AS (
  SELECT doc_id,
         CASE WHEN size(w) >= 8
              THEN array_distinct(transform(sequence(1, size(w) - 7),
                                            i -> concat_ws(' ', slice(w, i, 8))))
              ELSE CAST(array() AS ARRAY<STRING>) END AS gs
  FROM tok
), ev AS (
  SELECT DISTINCT gram FROM (
    SELECT explode(gs) AS gram FROM g0 WHERE doc_id % 10 = 0)
), tr AS (
  SELECT doc_id, gs FROM g0 WHERE doc_id % 10 <> 0
  UNION ALL
  SELECT doc_id + 1000000, gs FROM g0 WHERE doc_id % 10 = 0
), x AS (
  SELECT doc_id, gram FROM tr LATERAL VIEW explode(gs) AS gram
), hit AS (
  SELECT x.doc_id, count(ev.gram) AS n_matched
  FROM x LEFT JOIN ev ON x.gram = ev.gram GROUP BY 1
)
SELECT t.doc_id,
       size(t.gs) AS n_grams,
       coalesce(h.n_matched, 0) AS n_matched,
       CASE WHEN size(t.gs) = 0 THEN 0.0
            ELSE round(coalesce(h.n_matched, 0) * 1.0 / size(t.gs), 6) END AS overlap_frac,
       coalesce(h.n_matched, 0) > 0 AS contaminated
FROM tr t LEFT JOIN hit h ON t.doc_id = h.doc_id
