-- Spark-SQL corpus file (ANSI subset shared with the DuckDB oracle).
-- Runs over the temp views registered by sources.register_star_schema.
SELECT l_returnflag, l_linestatus,
       (sum(CAST(round((l_quantity) * 100, 0) AS BIGINT)) / 100.0)                                   AS sum_qty,
       (sum(CAST(round((l_extendedprice) * 100, 0) AS BIGINT)) / 100.0)                              AS sum_base_price,
       ((((sum(CAST(round((l_extendedprice * (1 - l_discount)) * 10000, 0) AS BIGINT)) + 50) - (sum(CAST(round((l_extendedprice * (1 - l_discount)) * 10000, 0) AS BIGINT)) + 50) % 100) / 100) / 100.0)    AS sum_disc_price,
       round(sum(CAST(round((l_quantity) * 100, 0) AS BIGINT)) / 100.0 / count(l_quantity), 2)                                   AS avg_qty,
       round(sum(CAST(round((l_discount) * 100, 0) AS BIGINT)) / 100.0 / count(l_discount), 4)                           AS avg_disc,
       count(*)                                                  AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1997-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
