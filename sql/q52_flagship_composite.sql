-- Spark-SQL corpus file (ANSI subset shared with the DuckDB oracle).
-- Runs over the temp views registered by sources.register_star_schema.
WITH channels AS (
  SELECT l_suppkey, l_partkey, l_extendedprice, l_discount, 'returned' AS channel
  FROM lineitem WHERE l_returnflag = 'R'
  UNION ALL
  SELECT l_suppkey, l_partkey, l_extendedprice, l_discount, 'kept' AS channel
  FROM lineitem WHERE l_returnflag <> 'R'
), agg AS (
  SELECT channel, n_name, p_brand,
         CAST(grouping(channel) AS INT)  AS g_channel,
         CAST(grouping(n_name) AS INT)   AS g_nation,
         CAST(grouping(p_brand) AS INT)  AS g_brand,
         ((((sum(CAST(round((l_extendedprice * (1 - l_discount)) * 10000, 0) AS BIGINT)) + 50) - (sum(CAST(round((l_extendedprice * (1 - l_discount)) * 10000, 0) AS BIGINT)) + 50) % 100) / 100) / 100.0) AS revenue,
         count(*) AS n_items
  FROM channels
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation   ON s_nationkey = n_nationkey
  JOIN part     ON l_partkey = p_partkey
  GROUP BY ROLLUP(channel, n_name, p_brand)
  HAVING count(*) >= 5
)
SELECT channel, n_name, p_brand, g_channel, g_nation, g_brand,
       revenue, n_items,
       rank() OVER (PARTITION BY channel, n_name, g_brand
                    ORDER BY revenue DESC, p_brand) AS rk
FROM agg
ORDER BY g_channel DESC, g_nation DESC, g_brand DESC,
         channel NULLS FIRST, n_name NULLS FIRST, revenue DESC, p_brand NULLS FIRST
LIMIT 100
