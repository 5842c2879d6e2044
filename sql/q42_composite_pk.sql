-- Spark-SQL corpus file (ANSI subset shared with the DuckDB oracle).
-- Runs over the temp views registered by sources.register_star_schema.
SELECT o_orderkey, o_custkey,
       md5(concat_ws('-', o_orderkey, o_custkey, o_orderstatus)) AS pk
FROM orders
