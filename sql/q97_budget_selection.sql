-- Spark-SQL corpus file (ANSI subset shared with the DuckDB oracle).
-- Runs over the temp views registered by sources.register_star_schema.
WITH m AS (
  SELECT doc_id, source,
         length(text) AS nc,
         CASE WHEN trim(text) = '' THEN 0 ELSE size(split(trim(text), '\\s+')) END AS n_tokens,
         trim(regexp_replace(lower(text), '\\s+', ' ')) AS norm,
         size(regexp_extract_all(text, '[^A-Za-z0-9\\s]', 0)) AS npunct
  FROM documents
), x AS (
  SELECT doc_id, source, nc, n_tokens,
         CASE WHEN n_tokens = 0 THEN 0.0
              ELSE CAST(length(replace(norm, ' ', '')) AS DOUBLE) / n_tokens END AS mtl,
         CASE WHEN nc = 0 THEN 0.0 ELSE CAST(npunct AS DOUBLE) / nc END AS pr,
         CASE WHEN n_tokens = 0 THEN 0.0
              ELSE CAST(size(filter(split(norm, ' '),
                     t -> t IN ('the','a','and','of','to','in','is','it','that','for'))) AS DOUBLE) / n_tokens END AS swr
  FROM m
), q AS (
  SELECT doc_id, source, n_tokens,
         round(CASE WHEN nc BETWEEN 64 AND 4096 THEN 0.25 ELSE 0.0 END
             + CASE WHEN mtl >= 3 AND mtl <= 12 THEN 0.25 ELSE 0.0 END
             + CASE WHEN pr <= 0.2 THEN 0.25 ELSE 0.0 END
             + CASE WHEN swr >= 0.02 THEN 0.25 ELSE 0.0 END, 2) AS quality_score
  FROM x
), sz AS (
  SELECT source, CAST(sum(n_tokens) AS BIGINT) AS gtok FROM q GROUP BY source
), tot AS (
  SELECT sum(sqrt(CAST(gtok AS DOUBLE))) AS ta,
         CAST(sum(gtok) AS BIGINT) * 500L DIV 1000L AS budget
  FROM sz
), quo AS (
  SELECT source,
         CAST(floor(round(sqrt(CAST(gtok AS DOUBLE)) / t.ta, 6) * t.budget) AS BIGINT) AS quota
  FROM sz CROSS JOIN tot t
), r AS (
  SELECT doc_id, source, n_tokens, quality_score,
         CAST(sum(n_tokens) OVER (PARTITION BY source
                                  ORDER BY quality_score DESC, doc_id ASC
                                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_tokens
  FROM q
)
SELECT r.doc_id, r.source, r.n_tokens, r.quality_score, r.cum_tokens, qo.quota
FROM r JOIN quo qo ON r.source = qo.source
WHERE r.cum_tokens <= qo.quota
