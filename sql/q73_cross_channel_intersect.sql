-- Spark-SQL corpus file (ANSI subset shared with the DuckDB oracle).
-- Runs over the temp views registered by sources.register_star_schema.
WITH per AS (
  SELECT l_returnflag AS channel, l_partkey,
         sum(CAST(round(l_extendedprice * (1 - l_discount) * 10000, 0) AS BIGINT)) AS c4
  FROM lineitem GROUP BY 1, 2
), cross_parts AS (
  SELECT l_partkey FROM per WHERE channel = 'A'
  INTERSECT
  SELECT l_partkey FROM per WHERE channel = 'N'
  INTERSECT
  SELECT l_partkey FROM per WHERE channel = 'R'
), threshold AS (
  SELECT sum(c4) AS s, count(*) AS n FROM per
)
SELECT channel, p_brand,
       CAST(grouping(channel) AS INT) AS g_channel,
       CAST(grouping(p_brand) AS INT) AS g_brand,
       count(*) AS n_parts,
       ((sum(c4) + 50) - (sum(c4) + 50) % 100) / 100 / 100.0 AS revenue
FROM per
JOIN cross_parts USING (l_partkey)
JOIN part ON l_partkey = p_partkey
CROSS JOIN threshold
WHERE per.c4 * threshold.n > threshold.s
GROUP BY ROLLUP(channel, p_brand)
