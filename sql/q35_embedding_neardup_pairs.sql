-- Spark-SQL corpus file (array-HOF dialect; bounded to the fixed
-- 1000-vector diagnostic sample like the DataFrame twin).
WITH n AS (
  SELECT vec_id AS id,
         transform(embedding, x -> CAST(x AS DOUBLE)) AS v,
         sqrt(aggregate(transform(embedding, x -> CAST(x AS DOUBLE)),
                        CAST(0.0 AS DOUBLE), (acc, x) -> acc + x * x)) AS nm
  FROM embeddings WHERE vec_id < 1000
), pairs AS (
  SELECT a.id AS id_a, b.id AS id_b,
         round(CASE WHEN a.nm * b.nm = 0 THEN 0.0
               ELSE aggregate(zip_with(a.v, b.v, (x, y) -> x * y),
                              CAST(0.0 AS DOUBLE), (acc, x) -> acc + x)
                    / (a.nm * b.nm) END, 6) AS cosine_sim
  FROM n a JOIN n b ON a.id < b.id
)
SELECT id_a, id_b, cosine_sim FROM pairs WHERE cosine_sim >= 0.4
