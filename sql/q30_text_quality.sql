-- Spark-SQL corpus file (ANSI subset shared with the DuckDB oracle).
-- Runs over the temp views registered by sources.register_star_schema.
WITH m AS (
  SELECT doc_id,
         length(text) AS n_chars_obs,
         CASE WHEN trim(text) = '' THEN 0 ELSE size(split(trim(text), '\\s+')) END AS n_tokens,
         size(regexp_extract_all(text, '[A-Za-z0-9_]+|[^A-Za-z0-9_\\s]', 0)) AS n_bpe_tokens,
         trim(regexp_replace(lower(text), '\\s+', ' ')) AS norm,
         size(regexp_extract_all(text, '[^A-Za-z0-9\\s]', 0)) AS npunct
  FROM documents
), x AS (
  SELECT doc_id, n_chars_obs, n_tokens, n_bpe_tokens,
         CASE WHEN n_tokens = 0 THEN 0.0
              ELSE CAST(length(replace(norm, ' ', '')) AS DOUBLE) / n_tokens END AS mtl,
         CASE WHEN n_chars_obs = 0 THEN 0.0
              ELSE CAST(npunct AS DOUBLE) / n_chars_obs END AS pr,
         CASE WHEN n_tokens = 0 THEN 0.0
              ELSE CAST(size(filter(split(norm, ' '),
                     t -> t IN ('the','a','and','of','to','in','is','it','that','for'))) AS DOUBLE) / n_tokens END AS swr,
         md5(norm) AS fingerprint
  FROM m
)
SELECT doc_id, n_chars_obs, n_tokens, n_bpe_tokens,
       round(mtl, 4) AS mean_token_len,
       round(pr, 4) AS punct_ratio,
       round(swr, 4) AS stopword_ratio,
       round(CASE WHEN n_chars_obs BETWEEN 64 AND 4096 THEN 0.25 ELSE 0.0 END
           + CASE WHEN mtl BETWEEN 3 AND 12 THEN 0.25 ELSE 0.0 END
           + CASE WHEN pr <= 0.2 THEN 0.25 ELSE 0.0 END
           + CASE WHEN swr >= 0.02 THEN 0.25 ELSE 0.0 END, 2) AS quality_score,
       fingerprint
FROM x
