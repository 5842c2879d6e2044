-- Spark-SQL corpus file: SemDeDup-style semantic dedup — the q72 SRP
-- blocking pipeline at threshold 0.95 plus the keep-first rule (a
-- vector drops iff a lower-id near-duplicate exists).
WITH c0 AS (
  SELECT vec_id, transform(embedding, x -> CAST(x AS DOUBLE)) AS v FROM embeddings
), c AS (
  SELECT vec_id, v FROM c0
  UNION ALL
  SELECT vec_id + 1000000 AS vec_id, v FROM c0
), ex AS (
  SELECT vec_id, pos, CAST(round(v[pos] * 1000000, 0) AS BIGINT) AS vq
  FROM c LATERAL VIEW explode(sequence(0, 63)) t AS pos
), s AS (
  SELECT b AS bit, p AS pos,
         CASE WHEN substr(md5(concat_ws(':', 'srp', b, p)), 1, 1) <= '7'
              THEN 1 ELSE -1 END AS s
  FROM (SELECT explode(sequence(0, 63)) AS b)
  CROSS JOIN (SELECT explode(sequence(0, 63)) AS p)
), proj AS (
  SELECT vec_id, bit, sum(vq * s) AS pr FROM ex JOIN s USING (pos)
  GROUP BY vec_id, bit
), chunks AS (
  SELECT vec_id, bit div 16 AS chunk,
         sum(CASE WHEN pr >= 0 THEN shiftleft(1L, CAST(bit % 16 AS INT))
             ELSE 0L END) AS cval
  FROM proj GROUP BY vec_id, bit div 16
), capped AS (
  SELECT vec_id, chunk, cval,
         row_number() OVER (PARTITION BY chunk, cval ORDER BY vec_id) AS rn
  FROM chunks
), cand AS (
  SELECT DISTINCT a.vec_id AS id_a, b.vec_id AS id_b
  FROM capped a JOIN capped b
    ON a.chunk = b.chunk AND a.cval = b.cval AND a.vec_id < b.vec_id
  WHERE a.rn <= 200 AND b.rn <= 200
), pairs AS (
  SELECT cand.id_a, cand.id_b
  FROM cand
  JOIN c ca ON ca.vec_id = cand.id_a
  JOIN c cb ON cb.vec_id = cand.id_b
  WHERE round(CASE WHEN sqrt(aggregate(ca.v, CAST(0.0 AS DOUBLE), (acc, x) -> acc + x * x))
                      * sqrt(aggregate(cb.v, CAST(0.0 AS DOUBLE), (acc, x) -> acc + x * x)) = 0
              THEN 0.0
              ELSE aggregate(zip_with(ca.v, cb.v, (x, y) -> x * y),
                             CAST(0.0 AS DOUBLE), (acc, x) -> acc + x)
                   / (sqrt(aggregate(ca.v, CAST(0.0 AS DOUBLE), (acc, x) -> acc + x * x))
                      * sqrt(aggregate(cb.v, CAST(0.0 AS DOUBLE), (acc, x) -> acc + x * x)))
              END, 6) >= 0.95
), nbrs AS (
  SELECT id_b AS vec_id, count(*) AS n_lower_nbrs FROM pairs GROUP BY id_b
)
SELECT c.vec_id,
       coalesce(n.n_lower_nbrs, 0L) AS n_lower_nbrs,
       coalesce(n.n_lower_nbrs, 0L) = 0 AS kept
FROM c LEFT JOIN nbrs n ON n.vec_id = c.vec_id
