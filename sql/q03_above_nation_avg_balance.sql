-- Spark-SQL corpus file (ANSI subset shared with the DuckDB oracle).
-- Runs over the temp views registered by sources.register_star_schema.
SELECT c_custkey, c_name, n_name, round(c_acctbal, 2) AS acctbal
FROM customer c
JOIN nation n ON c.c_nationkey = n.n_nationkey
WHERE c_acctbal > 1.2 * (
    SELECT avg(c2.c_acctbal) FROM customer c2
    WHERE c2.c_nationkey = c.c_nationkey)
