-- Spark-SQL corpus file (ANSI subset shared with the DuckDB oracle).
-- Runs over the temp views registered by sources.register_star_schema.
WITH tok AS (
  SELECT doc_id, token
  FROM (SELECT doc_id,
               split(trim(regexp_replace(lower(text), '\\s+', ' ')), ' ') AS t
        FROM documents
        WHERE trim(regexp_replace(lower(text), '\\s+', ' ')) <> '')
  LATERAL VIEW explode(t) AS token
), counts AS (
  SELECT token, count(*) AS c FROM tok GROUP BY token
), vocab AS (
  SELECT token, c FROM counts ORDER BY c DESC, token ASC LIMIT 256
), scal AS (
  SELECT (SELECT count(*) FROM vocab) AS v, (SELECT sum(c) FROM counts) AS n
), pd AS (
  SELECT t.doc_id, count(*) AS n_tokens,
         sum(CASE WHEN vo.c IS NULL THEN 1 ELSE 0 END) AS n_oov,
         round(-avg(log2(CAST(coalesce(vo.c, 0) + 1 AS DOUBLE) / (s.n + s.v + 1))), 4) AS nll_bits
  FROM tok t LEFT JOIN vocab vo ON t.token = vo.token CROSS JOIN scal s
  GROUP BY t.doc_id
)
SELECT doc_id, n_tokens,
       CAST(n_oov AS BIGINT) AS n_oov,
       round(CAST(n_oov AS DOUBLE) / n_tokens, 4) AS oov_ratio,
       nll_bits,
       round(power(2, nll_bits), 2) AS ppl
FROM pd
