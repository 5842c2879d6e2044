-- Spark-SQL corpus file (ANSI subset shared with the DuckDB oracle).
-- Runs over the temp views registered by sources.register_star_schema.
SELECT count(CASE WHEN l_quantity BETWEEN 1 AND 10 AND l_discount < 0.05 THEN 1 END)  AS bucket_lo,
       count(CASE WHEN l_quantity BETWEEN 11 AND 30 AND l_discount BETWEEN 0.03 AND 0.07 THEN 1 END) AS bucket_mid,
       count(CASE WHEN l_quantity > 30 OR (l_discount > 0.08 AND l_tax > 0.04) THEN 1 END) AS bucket_hi
FROM lineitem
WHERE (l_returnflag = 'N' AND l_linestatus = 'O')
   OR (l_returnflag = 'R' AND l_quantity > 5)
