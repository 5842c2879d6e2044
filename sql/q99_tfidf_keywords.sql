-- Spark-SQL corpus file (ANSI subset shared with the DuckDB oracle).
WITH n AS (
  SELECT doc_id, source,
         trim(regexp_replace(lower(text), '\\s+', ' ')) AS t
  FROM documents
), toks AS (
  SELECT doc_id, source, term
  FROM (SELECT doc_id, source, explode(split(t, ' ')) AS term FROM n)
  WHERE term <> ''
), nd AS (
  SELECT count(DISTINCT doc_id) AS n_docs FROM toks
), dfx AS (
  SELECT term, CAST(count(DISTINCT doc_id) AS BIGINT) AS df FROM toks GROUP BY term
), tfx AS (
  SELECT source, term, CAST(count(*) AS BIGINT) AS tf
  FROM toks GROUP BY source, term
), sc AS (
  SELECT t.source, t.term, t.tf, d.df,
         round(t.tf * ln((n.n_docs + 1) / (d.df + 1)), 4) AS tfidf
  FROM tfx t JOIN dfx d USING (term) CROSS JOIN nd n
), r AS (
  SELECT *, row_number() OVER (PARTITION BY source
                               ORDER BY tfidf DESC, term ASC) AS rk
  FROM sc
)
SELECT source, term, tf, df, tfidf, CAST(rk AS BIGINT) AS term_rank
FROM r WHERE rk <= 5
