-- Spark-SQL corpus file (ANSI subset shared with the DuckDB oracle).
-- Runs over the temp views registered by sources.register_star_schema.
WITH r AS (
  SELECT doc_id, source, lang,
         row_number() OVER (PARTITION BY source, lang
                            ORDER BY md5(concat_ws(':', CAST(doc_id AS STRING), 'strat')) ASC,
                                     doc_id ASC) AS sample_rank,
         count(*) OVER (PARTITION BY source, lang) AS stratum_n
  FROM documents
)
SELECT doc_id, source, lang,
       CAST(sample_rank AS BIGINT) AS sample_rank,
       CAST(stratum_n AS BIGINT) AS stratum_n
FROM r
WHERE sample_rank <= (stratum_n * 200 + 999) DIV 1000
