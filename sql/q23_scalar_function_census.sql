-- Spark-SQL port of the q23 oracle: DuckDB trunc(x) (toward zero) ->
-- Spark CAST(... AS BIGINT), which also truncates toward zero
SELECT c_custkey,
       substr(c_name, 1, 10) AS name_prefix,
       upper(c_mktsegment) AS seg,
       concat(n_name, '-', c_name) AS tagged,
       CASE WHEN c_acctbal < 0 THEN 'neg'
            WHEN c_acctbal < 5000 THEN 'mid'
            ELSE 'high' END AS bal_band,
       round(abs(c_acctbal), 2) AS abs_bal,
       CAST(c_acctbal AS BIGINT) AS bal_int
FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
WHERE c_mktsegment IN ('BUILDING', 'AUTOMOBILE', 'MACHINERY')
  AND c_name LIKE '%1%'
  AND c_acctbal BETWEEN -500 AND 9500
  AND c_name IS NOT NULL
