-- Spark-SQL corpus file (ANSI subset shared with the DuckDB oracle).
-- Runs over the temp views registered by sources.register_star_schema.
WITH base AS (
  SELECT doc_id,
         split(trim(regexp_replace(lower(text), '\\s+', ' ')), ' ') AS t,
         CASE WHEN trim(regexp_replace(lower(text), '\\s+', ' ')) = '' THEN 0
              ELSE size(split(trim(regexp_replace(lower(text), '\\s+', ' ')), ' ')) END AS n_tokens
  FROM documents
), wdoc AS (
  SELECT doc_id, n_tokens, greatest(n_tokens - 7, 0) AS n_windows,
         CASE WHEN n_tokens >= 8
              THEN transform(sequence(0, n_tokens - 8),
                             i -> md5(concat_ws(' ', slice(t, i + 1, 8))))
              ELSE CAST(array() AS ARRAY<STRING>) END AS ws
  FROM base
), w AS (
  SELECT doc_id, pos, h FROM wdoc LATERAL VIEW posexplode(ws) AS pos, h
), dh AS (
  SELECT h FROM w GROUP BY h HAVING min(doc_id) <> max(doc_id)
), dw AS (
  SELECT doc_id, pos FROM w LEFT SEMI JOIN dh ON w.h = dh.h
), isl AS (
  SELECT doc_id, pos,
         max(pos + 8) OVER (PARTITION BY doc_id ORDER BY pos
                            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pe
  FROM dw
), cov AS (
  SELECT doc_id, count(*) AS n_dup_windows,
         sum(greatest(0, pos + 8 - greatest(pos, coalesce(pe, pos)))) AS dup_tokens
  FROM isl GROUP BY doc_id
)
SELECT b.doc_id, b.n_tokens,
       CAST(b.n_windows AS BIGINT) AS n_windows,
       CAST(coalesce(c.n_dup_windows, 0) AS BIGINT) AS n_dup_windows,
       CAST(coalesce(c.dup_tokens, 0) AS BIGINT) AS dup_tokens,
       round(CASE WHEN b.n_tokens > 0
                  THEN CAST(coalesce(c.dup_tokens, 0) AS DOUBLE) / b.n_tokens
                  ELSE 0.0 END, 4) AS dup_ratio
FROM wdoc b LEFT JOIN cov c ON b.doc_id = c.doc_id
