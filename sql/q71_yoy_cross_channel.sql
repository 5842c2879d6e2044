-- Spark-SQL corpus file (ANSI subset shared with the DuckDB oracle).
-- Runs over the temp views registered by sources.register_star_schema.
WITH year_total AS (
  SELECT o_custkey AS custkey, year(o_orderdate) AS yr, 'pri' AS channel,
         sum(CAST(round(o_totalprice * 100, 0) AS BIGINT)) AS cents
  FROM orders WHERE o_orderpriority IN ('1-URGENT','2-HIGH') GROUP BY 1, 2
  UNION ALL
  SELECT o_custkey, year(o_orderdate), 'std',
         sum(CAST(round(o_totalprice * 100, 0) AS BIGINT))
  FROM orders WHERE o_orderpriority NOT IN ('1-URGENT','2-HIGH') GROUP BY 1, 2
  UNION ALL
  SELECT o_custkey, year(o_orderdate), 'ret',
         CAST((((sum(CAST(round(l_extendedprice * (1 - l_discount) * 10000, 0) AS BIGINT)) + 50)
                - (sum(CAST(round(l_extendedprice * (1 - l_discount) * 10000, 0) AS BIGINT)) + 50) % 100) / 100) AS BIGINT)
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
  WHERE l_returnflag = 'R' GROUP BY 1, 2
)
SELECT p1.custkey AS custkey, c.c_name AS c_name,
  round(CAST(p2.cents AS DOUBLE) / p1.cents, 6) AS pri_growth,
  round(CAST(s2.cents AS DOUBLE) / s1.cents, 6) AS std_growth,
  round(CAST(r2.cents AS DOUBLE) / r1.cents, 6) AS ret_growth
FROM year_total p1
JOIN year_total p2 ON p1.custkey = p2.custkey AND p2.channel = 'pri' AND p2.yr = 1999
JOIN year_total s1 ON p1.custkey = s1.custkey AND s1.channel = 'std' AND s1.yr = 1998
JOIN year_total s2 ON p1.custkey = s2.custkey AND s2.channel = 'std' AND s2.yr = 1999
JOIN year_total r1 ON p1.custkey = r1.custkey AND r1.channel = 'ret' AND r1.yr = 1998
JOIN year_total r2 ON p1.custkey = r2.custkey AND r2.channel = 'ret' AND r2.yr = 1999
JOIN customer c ON c.c_custkey = p1.custkey
WHERE p1.channel = 'pri' AND p1.yr = 1998
  AND p1.cents > 0 AND s1.cents > 0 AND r1.cents > 0
  AND p2.cents * s1.cents > s2.cents * p1.cents
  AND p2.cents * r1.cents > r2.cents * p1.cents
ORDER BY custkey LIMIT 100
