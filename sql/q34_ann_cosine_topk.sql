-- Spark-SQL corpus file (array-HOF dialect; the DuckDB oracle uses
-- list_cosine_similarity — both fronts compute the identical doubles).
WITH n AS (
  SELECT vec_id,
         transform(embedding, x -> CAST(x AS DOUBLE)) AS cv,
         sqrt(aggregate(transform(embedding, x -> CAST(x AS DOUBLE)),
                        CAST(0.0 AS DOUBLE), (acc, x) -> acc + x * x)) AS cn
  FROM embeddings
), q AS (
  SELECT vec_id AS query_id, cv AS qv, cn AS qn FROM n WHERE vec_id < 5
), scored AS (
  SELECT q.query_id, n.vec_id,
         round(CASE WHEN n.cn * q.qn = 0 THEN 0.0
               ELSE aggregate(zip_with(n.cv, q.qv, (x, y) -> x * y),
                              CAST(0.0 AS DOUBLE), (acc, x) -> acc + x)
                    / (n.cn * q.qn) END, 6) AS cosine_sim
  FROM n CROSS JOIN q
), r AS (
  SELECT *, row_number() OVER (PARTITION BY query_id
                               ORDER BY cosine_sim DESC, vec_id) AS rk
  FROM scored
)
SELECT query_id, vec_id, cosine_sim, rk FROM r WHERE rk <= 5
