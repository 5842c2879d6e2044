-- Spark-SQL port of the q45 oracle (encode needs the charset in Spark)
WITH m AS (
  SELECT doc_id AS media_id,
         length(encode(text, 'UTF-8')) AS n_bytes,
         md5(encode(text, 'UTF-8')) AS digest
  FROM documents
)
SELECT media_id, n_bytes, digest,
       n_bytes % 64 + 16 AS width,
       n_bytes % 48 + 16 AS height,
       n_bytes % 8 + 1 AS n_frames
FROM m
