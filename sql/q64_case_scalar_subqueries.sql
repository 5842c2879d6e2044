-- Spark-SQL corpus file (ANSI subset shared with the DuckDB oracle).
-- Runs over the temp views registered by sources.register_star_schema.
SELECT r_name,
       (SELECT count(*) FROM orders) AS n_orders_total,
       CASE WHEN (SELECT count(*) FROM lineitem WHERE l_quantity <= 25) >
                 (SELECT count(*) FROM lineitem WHERE l_quantity > 25)
            THEN CAST((SELECT sum(CAST(round(l_extendedprice * 100, 0) AS BIGINT))
                  FROM lineitem WHERE l_quantity <= 25) AS DOUBLE) / 100.0
            ELSE CAST((SELECT sum(CAST(round(l_extendedprice * 100, 0) AS BIGINT))
                  FROM lineitem WHERE l_quantity > 25) AS DOUBLE) / 100.0
       END AS majority_bucket_revenue,
       CASE WHEN (SELECT count(*) FROM lineitem WHERE l_returnflag = 'R') * 2 >
                 (SELECT count(*) FROM lineitem)
            THEN 'mostly_returned' ELSE 'mostly_kept'
       END AS return_profile
FROM region
ORDER BY r_name
