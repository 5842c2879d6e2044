-- Spark-SQL corpus file (ANSI subset shared with the DuckDB oracle).
-- Runs over the temp views registered by sources.register_star_schema.
WITH nrm AS (
  SELECT doc_id, trim(regexp_replace(lower(text), '\\s+', ' ')) AS t FROM documents
), tok AS (
  SELECT doc_id,
         CASE WHEN t = '' THEN CAST(array() AS ARRAY<STRING>)
              ELSE split(t, ' ') END AS w
  FROM nrm
), base AS (
  SELECT doc_id, size(w) AS n_tokens, w,
         CASE WHEN size(w) >= 3
              THEN transform(sequence(1, size(w) - 2),
                             i -> concat_ws(' ', slice(w, i, 3)))
              ELSE CAST(array() AS ARRAY<STRING>) END AS tri
  FROM tok
), uni AS (
  SELECT doc_id, max(c) AS top_uni FROM (
    SELECT doc_id, g, count(*) AS c
    FROM (SELECT doc_id, g FROM base LATERAL VIEW explode(w) AS g)
    GROUP BY 1, 2)
  GROUP BY 1
), bi AS (
  SELECT doc_id, max(c) AS top_bi FROM (
    SELECT doc_id, g, count(*) AS c
    FROM (SELECT doc_id, g FROM (
            SELECT doc_id,
                   CASE WHEN size(w) >= 2
                        THEN transform(sequence(1, size(w) - 1),
                                       i -> concat_ws(' ', slice(w, i, 2)))
                        ELSE CAST(array() AS ARRAY<STRING>) END AS bg
            FROM base) LATERAL VIEW explode(bg) AS g)
    GROUP BY 1, 2)
  GROUP BY 1
)
SELECT b.doc_id,
       b.n_tokens,
       round(CASE WHEN b.n_tokens = 0 THEN 0.0
                  ELSE coalesce(u.top_uni, 0) * 1.0 / b.n_tokens END, 6) AS top_unigram_frac,
       round(CASE WHEN b.n_tokens <= 1 THEN 0.0
                  ELSE coalesce(i.top_bi, 0) * 1.0 / (b.n_tokens - 1) END, 6) AS top_bigram_frac,
       round(CASE WHEN size(b.tri) = 0 THEN 0.0
                  ELSE (size(b.tri) - size(array_distinct(b.tri))) * 1.0 / size(b.tri) END, 6) AS dup_trigram_frac,
       ((CASE WHEN b.n_tokens = 0 THEN 0.0
              ELSE coalesce(u.top_uni, 0) * 1.0 / b.n_tokens END) > 0.2
        OR (CASE WHEN size(b.tri) = 0 THEN 0.0
                 ELSE (size(b.tri) - size(array_distinct(b.tri))) * 1.0 / size(b.tri) END) > 0.5
       ) AS repetitive
FROM base b
LEFT JOIN uni u ON b.doc_id = u.doc_id
LEFT JOIN bi i ON b.doc_id = i.doc_id
