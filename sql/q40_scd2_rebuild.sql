-- Spark-SQL corpus file (ANSI subset shared with the DuckDB oracle).
-- Runs over the temp views registered by sources.register_star_schema.
WITH versions AS (
  SELECT l_orderkey AS pk, l_shipdate AS extraction_timestamp,
         l_quantity AS quantity, l_extendedprice AS price, l_linenumber
  FROM lineitem
)
SELECT pk, extraction_timestamp, quantity, price,
       extraction_timestamp AS start_datetime,
       lead(extraction_timestamp, 1, TIMESTAMP '2250-01-01 00:00:00')
         OVER w AS end_datetime,
       (lead(extraction_timestamp, 1, TIMESTAMP '2250-01-01 00:00:00')
         OVER w = TIMESTAMP '2250-01-01 00:00:00') AS is_current
FROM versions
-- order must be TOTAL: the testdata contains duplicate
-- (orderkey, shipdate, linenumber) rows, so value columns join the key
WINDOW w AS (PARTITION BY pk
             ORDER BY extraction_timestamp, l_linenumber, quantity, price)
