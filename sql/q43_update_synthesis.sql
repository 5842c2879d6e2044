-- Spark-SQL corpus file (ANSI subset shared with the DuckDB oracle).
-- Runs over the temp views registered by sources.register_star_schema.
SELECT o_orderkey AS pk,
       o_orderdate + INTERVAL 1 DAY AS extraction_timestamp,
       'U' AS op,
       1 AS o_quantity_override,
       -- integer half-up: o_totalprice*1.05 is a 4dp value whose .xx5
       -- midpoints round differently across engines (see plans/_exact.py)
       (((CAST(round(o_totalprice * 1.05 * 10000, 0) AS BIGINT) + 50)
         - (CAST(round(o_totalprice * 1.05 * 10000, 0) AS BIGINT) + 50) % 100) / 100)
       / 100.0 AS o_totalprice
FROM orders
WHERE o_orderkey % 100 < 10
