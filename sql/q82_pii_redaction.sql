-- Spark-SQL corpus file (ANSI subset shared with the DuckDB oracle).
-- Runs over the temp views registered by sources.register_star_schema.
WITH d AS (
  SELECT doc_id,
         CASE WHEN doc_id % 7 = 0
              THEN concat(text, ' contact user', CAST(doc_id AS STRING),
                          '@mail.example.net or call 555-',
                          lpad(CAST(doc_id % 10000 AS STRING), 4, '0'),
                          ' from 10.0.0.', CAST(doc_id % 256 AS STRING))
              ELSE text END AS text
  FROM documents
)
SELECT doc_id,
       size(regexp_extract_all(text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}', 0)) AS n_emails,
       size(regexp_extract_all(text, '\\b[0-9]{3}-[0-9]{4}\\b', 0)) AS n_phones,
       size(regexp_extract_all(text, '\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b', 0)) AS n_ips,
       (size(regexp_extract_all(text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}', 0))
        + size(regexp_extract_all(text, '\\b[0-9]{3}-[0-9]{4}\\b', 0))
        + size(regexp_extract_all(text, '\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b', 0))) > 0 AS pii_found,
       md5(regexp_replace(regexp_replace(regexp_replace(text,
             '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}', '<EMAIL>'),
             '\\b[0-9]{3}-[0-9]{4}\\b', '<PHONE>'),
             '\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b', '<IP>')) AS redacted_fp
FROM d
