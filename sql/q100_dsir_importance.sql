-- Spark-SQL corpus file (ANSI subset shared with the DuckDB oracle).
WITH n AS (
  SELECT doc_id, (lang = 'en') AS tgt,
         split(trim(regexp_replace(lower(text), '\\s+', ' ')), ' ') AS t
  FROM documents
), big AS (
  SELECT doc_id, tgt,
         transform(sequence(0, size(t) - 2), i -> concat(t[i], ' ', t[i + 1])) AS bl
  FROM n WHERE size(t) >= 2
), f AS (
  SELECT doc_id, tgt,
         CAST(CAST(conv(substr(md5(u), 1, 8), 16, 10) AS BIGINT) % 1024 AS INT) AS bucket
  FROM (SELECT doc_id, tgt, explode(bl) AS u FROM big)
), cnt AS (
  SELECT bucket, count(*) AS c_raw,
         sum(CASE WHEN tgt THEN 1 ELSE 0 END) AS c_tgt
  FROM f GROUP BY bucket
), tot AS (
  SELECT sum(c_raw) AS n_raw, sum(c_tgt) AS n_tgt FROM cnt
), model AS (
  SELECT bucket,
         log2((c_tgt + 1) / (t.n_tgt + 1024))
       - log2((c_raw + 1) / (t.n_raw + 1024)) AS lr
  FROM cnt CROSS JOIN tot t
)
SELECT f.doc_id, CAST(count(*) AS BIGINT) AS n_feats,
       round(avg(m.lr), 4) AS dsir_score
FROM f JOIN model m USING (bucket)
GROUP BY f.doc_id
