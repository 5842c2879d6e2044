-- Spark-SQL corpus file (ANSI subset shared with the DuckDB oracle).
-- Runs over the temp views registered by sources.register_star_schema.
WITH m AS (
  SELECT doc_id,
         CASE WHEN trim(text) = '' THEN 0 ELSE size(split(trim(text), '\\s+')) END AS n_tok,
         split(trim(regexp_replace(lower(text), '\\s+', ' ')), ' ') AS toks
  FROM documents
), r AS (
  SELECT doc_id,
         CASE WHEN n_tok = 0 THEN 0.0 ELSE CAST(size(filter(toks, t -> t IN ('der','die','das','und','ist','nicht','ein','mit','für','auf'))) AS DOUBLE) / n_tok END AS r_de,
         CASE WHEN n_tok = 0 THEN 0.0 ELSE CAST(size(filter(toks, t -> t IN ('the','a','and','of','to','in','is','it','that','for'))) AS DOUBLE) / n_tok END AS r_en,
         CASE WHEN n_tok = 0 THEN 0.0 ELSE CAST(size(filter(toks, t -> t IN ('el','la','de','que','y','en','un','es','no','por'))) AS DOUBLE) / n_tok END AS r_es,
         CASE WHEN n_tok = 0 THEN 0.0 ELSE CAST(size(filter(toks, t -> t IN ('le','la','et','les','des','un','une','est','que','pour'))) AS DOUBLE) / n_tok END AS r_fr
  FROM m
)
SELECT doc_id,
       round(r_de, 4) AS ratio_de,
       round(r_en, 4) AS ratio_en,
       round(r_es, 4) AS ratio_es,
       round(r_fr, 4) AS ratio_fr,
       CASE WHEN greatest(r_de, r_en, r_es, r_fr) > 0 AND r_de = greatest(r_de, r_en, r_es, r_fr) THEN 'de'
            WHEN greatest(r_de, r_en, r_es, r_fr) > 0 AND r_en = greatest(r_de, r_en, r_es, r_fr) THEN 'en'
            WHEN greatest(r_de, r_en, r_es, r_fr) > 0 AND r_es = greatest(r_de, r_en, r_es, r_fr) THEN 'es'
            WHEN greatest(r_de, r_en, r_es, r_fr) > 0 AND r_fr = greatest(r_de, r_en, r_es, r_fr) THEN 'fr'
            ELSE 'und' END AS lang_pred
FROM r
