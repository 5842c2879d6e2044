-- Spark-SQL corpus file (ANSI subset shared with the DuckDB oracle).
-- Runs over the temp views registered by sources.register_star_schema.
WITH d AS (
  SELECT doc_id, source,
         CAST(conv(substring(md5(CAST(doc_id AS STRING)), 1, 6), 16, 10) AS BIGINT) % 1000 AS bucket,
         CAST(conv(substring(md5(CAST(doc_id AS STRING)), 7, 6), 16, 10) AS BIGINT) % 1000 AS mb,
         CAST(substring(source, 4, 10) AS INT) AS src_n
  FROM documents
)
SELECT source,
       CASE WHEN bucket < 800 THEN 'train'
            WHEN bucket < 900 THEN 'val'
            ELSE 'test' END AS split,
       count(*) AS n_docs,
       min(doc_id) AS first_doc
FROM d
WHERE mb < CASE WHEN src_n < 5 THEN 1000 WHEN src_n < 10 THEN 700 ELSE 500 END
GROUP BY 1, 2
