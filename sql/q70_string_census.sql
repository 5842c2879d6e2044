-- Spark-SQL corpus file (ANSI subset shared with the DuckDB oracle).
-- Runs over the temp views registered by sources.register_star_schema.
SELECT c_mktsegment,
       count(*) AS n,
       sum(length(trim(c_name))) AS total_name_len,
       sum(length(regexp_replace(lower(c_name), 'customer', ''))) AS len_sans_word,
       sum(CASE WHEN instr(c_name, '#') > 0 THEN 1 ELSE 0 END) AS with_hash,
       min(lpad(CAST(c_custkey AS STRING), 10, '0')) AS first_key_padded,
       sum(size(split(c_name, '#'))) AS total_parts
FROM customer
GROUP BY c_mktsegment
