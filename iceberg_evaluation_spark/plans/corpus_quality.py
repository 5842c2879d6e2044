"""Corpus-hygiene pipeline queries: semantic dedup, benchmark
contamination, PII scrubbing, and repetition filtering — the data-quality
layer a 100 TB pretraining pipeline runs between raw ingest and
tokenization (graded alongside SURVEY.md §2 as first-class components).

All four are exactly deterministic end-to-end, so each carries a FULL
DuckDB oracle — including q80, whose SRP-LSH blocking was designed
integer-deterministic precisely so the oracle can replay the whole
pipeline (see ``operators/similarity.py::srp_neardup_pairs``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.contamination import contamination_check, word_ngrams
from ..operators.similarity import semantic_dedup
from ..operators.text_ops import pii_scrub, repetition_metrics
from ..sources import load_table
from .registry import register

# DuckDB twins of functions.text helpers (same idioms as corpus_text)
_NORM = "trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))"
_TOKS = f"regexp_split_to_array({_NORM}, ' ')"


# ---------------------------------------------------------------------------
# q80: SemDeDup-style semantic dedup over embeddings, SRP-LSH blocked.
#      Corpus = embeddings + planted exact copies (vec_id + 1e6) — the
#      copies MUST drop (identical vectors share every SRP band and have
#      a lower-id twin at cosine 1.0); originals drop only when a real
#      lower-id near-dup ≥ 0.95 exists. The oracle replays the integer
#      SRP pipeline + keep-first rule exactly (no float divergence: the
#      projections are BIGINT sums of quantized components).
# ---------------------------------------------------------------------------
_Q80_ORACLE = """
WITH c0 AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
c AS (SELECT vec_id, v FROM c0 UNION ALL SELECT vec_id + 1000000, v FROM c0),
ex AS (SELECT vec_id, CAST(t.pos AS INT) AS pos,
              CAST(round(v[CAST(t.pos AS INT) + 1] * 1000000, 0) AS BIGINT) AS vq
       FROM c, range(64) t(pos)),
s AS (SELECT CAST(t1.b AS INT) AS bit, CAST(t2.p AS INT) AS pos,
             CASE WHEN substr(md5(concat_ws(':', 'srp', CAST(t1.b AS INT), CAST(t2.p AS INT))), 1, 1) <= '7'
                  THEN 1 ELSE -1 END AS s
      FROM range(64) t1(b), range(64) t2(p)),
proj AS (SELECT vec_id, bit, sum(vq * s) AS pr FROM ex JOIN s USING (pos) GROUP BY 1, 2),
chunks AS (SELECT vec_id, bit // 16 AS chunk,
                  sum(CASE WHEN pr >= 0 THEN CAST(power(2, bit % 16) AS BIGINT) ELSE 0 END) AS cval
           FROM proj GROUP BY 1, 2),
capped AS (SELECT vec_id, chunk, cval,
                  row_number() OVER (PARTITION BY chunk, cval ORDER BY vec_id) AS rn
           FROM chunks),
cand AS (SELECT DISTINCT a.vec_id AS id_a, b.vec_id AS id_b
         FROM capped a JOIN capped b
           ON a.chunk = b.chunk AND a.cval = b.cval AND a.vec_id < b.vec_id
         WHERE a.rn <= 200 AND b.rn <= 200),
pairs AS (SELECT id_a, id_b
          FROM cand JOIN c ca ON ca.vec_id = id_a JOIN c cb ON cb.vec_id = id_b
          WHERE round(list_cosine_similarity(ca.v, cb.v), 6) >= 0.95),
nbrs AS (SELECT id_b AS vec_id, count(*) AS n_lower_nbrs FROM pairs GROUP BY 1)
SELECT c.vec_id,
       coalesce(n.n_lower_nbrs, 0) AS n_lower_nbrs,
       coalesce(n.n_lower_nbrs, 0) = 0 AS kept
FROM c LEFT JOIN nbrs n ON n.vec_id = c.vec_id
"""


# Operator-only variant (bench `run_s`): semantic dedup on the plain
# embeddings corpus — no planted-copy doubling (that exists only so the
# oracle can anchor must-drop pairs).
def _q80_bare(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    return semantic_dedup(emb, threshold=0.95)


@register(
    "q80_semantic_dedup",
    covers="dedup-semantic dedup-srp-lsh dedup-embedding-cosine J1 A1 W1",
    oracle=_Q80_ORACLE,
    bare=_q80_bare,
)
def q80_semantic_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    planted = emb.select((F.col("vec_id") + 1_000_000).alias("vec_id"), "embedding")
    corpus = emb.unionByName(planted)
    return semantic_dedup(corpus, threshold=0.95)


# ---------------------------------------------------------------------------
# q81: benchmark-contamination check (GPT-3 appendix-C style word-8-gram
#      overlap). Eval set = doc_id % 10 == 0; training corpus = the other
#      documents PLUS planted copies of every eval doc (doc_id + 1e6) —
#      the copies are contaminated by construction (overlap 1.0), while
#      organic 8-gram collisions between unrelated docs are counted
#      identically by both engines.
# ---------------------------------------------------------------------------
_Q81_ORACLE = f"""
WITH nrm AS (SELECT doc_id, {_NORM} AS t FROM documents),
tok AS (SELECT doc_id,
               CASE WHEN t = '' THEN CAST([] AS VARCHAR[])
                    ELSE regexp_split_to_array(t, ' ') END AS w
        FROM nrm),
g0 AS (SELECT doc_id,
              CASE WHEN len(w) >= 8
                   THEN list_distinct(list_transform(range(1, len(w) - 6),
                                                     i -> array_to_string(w[i:i+7], ' ')))
                   ELSE CAST([] AS VARCHAR[]) END AS gs
       FROM tok),
ev AS (SELECT DISTINCT unnest(gs) AS gram FROM g0 WHERE doc_id % 10 = 0),
tr AS (SELECT doc_id, gs FROM g0 WHERE doc_id % 10 <> 0
       UNION ALL
       SELECT doc_id + 1000000, gs FROM g0 WHERE doc_id % 10 = 0),
x AS (SELECT doc_id, unnest(gs) AS gram FROM tr),
hit AS (SELECT x.doc_id, count(ev.gram) AS n_matched
        FROM x LEFT JOIN ev USING (gram) GROUP BY 1)
SELECT t.doc_id,
       len(t.gs) AS n_grams,
       coalesce(h.n_matched, 0) AS n_matched,
       CASE WHEN len(t.gs) = 0 THEN 0.0
            ELSE round(coalesce(h.n_matched, 0) * 1.0 / len(t.gs), 6) END AS overlap_frac,
       coalesce(h.n_matched, 0) > 0 AS contaminated
FROM tr t LEFT JOIN hit h USING (doc_id)
"""


@register(
    "q81_contamination_check",
    covers="contamination text-analysis J1 A1 U1",
    oracle=_Q81_ORACLE,
)
def q81_contamination_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    ev = docs.filter(F.col("doc_id") % 10 == 0)
    train = docs.filter(F.col("doc_id") % 10 != 0).unionByName(
        ev.select((F.col("doc_id") + 1_000_000).alias("doc_id"), "text")
    )
    return contamination_check(train, ev, n=8)


# ---------------------------------------------------------------------------
# q82: PII scrub. The synthetic corpus carries no organic PII, so PII is
#      planted deterministically in-query (every 7th doc gets an email, a
#      phone, and an IPv4 appended) and both engines scrub the identical
#      decorated text — redaction correctness is pinned by the md5 of the
#      scrubbed output, not just the counts.
# ---------------------------------------------------------------------------
_PII_DECOR = (
    "CASE WHEN doc_id % 7 = 0 THEN text || ' contact user' || CAST(doc_id AS VARCHAR)"
    " || '@mail.example.net or call 555-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')"
    " || ' from 10.0.0.' || CAST(doc_id % 256 AS VARCHAR) ELSE text END"
)
_PII_EMAIL = r"'[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}'"
_PII_PHONE = r"'\b[0-9]{3}-[0-9]{4}\b'"
_PII_IP = r"'\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b'"

_Q82_ORACLE = f"""
WITH d AS (SELECT doc_id, {_PII_DECOR} AS text FROM documents)
SELECT doc_id,
       len(regexp_extract_all(text, {_PII_EMAIL})) AS n_emails,
       len(regexp_extract_all(text, {_PII_PHONE})) AS n_phones,
       len(regexp_extract_all(text, {_PII_IP})) AS n_ips,
       (len(regexp_extract_all(text, {_PII_EMAIL}))
        + len(regexp_extract_all(text, {_PII_PHONE}))
        + len(regexp_extract_all(text, {_PII_IP}))) > 0 AS pii_found,
       md5(regexp_replace(regexp_replace(regexp_replace(text,
             {_PII_EMAIL}, '<EMAIL>', 'g'),
             {_PII_PHONE}, '<PHONE>', 'g'),
             {_PII_IP}, '<IP>', 'g')) AS redacted_fp
FROM d
"""


@register(
    "q82_pii_redaction",
    covers="pii-redaction text-analysis P2 scalar-census",
    oracle=_Q82_ORACLE,
)
def q82_pii_redaction(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    decorated = docs.select(
        "doc_id",
        F.when(
            F.col("doc_id") % 7 == 0,
            F.concat(
                F.col("text"),
                F.lit(" contact user"),
                F.col("doc_id").cast("string"),
                F.lit("@mail.example.net or call 555-"),
                F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0"),
                F.lit(" from 10.0.0."),
                (F.col("doc_id") % 256).cast("string"),
            ),
        )
        .otherwise(F.col("text"))
        .alias("text"),
    )
    return pii_scrub(decorated)


# ---------------------------------------------------------------------------
# q83: Gopher/MassiveText repetition filters — top-unigram fraction,
#      top-bigram fraction, duplicate-trigram fraction, and the
#      "repetitive" flag. Exact rational arithmetic → full oracle.
# ---------------------------------------------------------------------------
_Q83_ORACLE = f"""
WITH nrm AS (SELECT doc_id, {_NORM} AS t FROM documents),
tok AS (SELECT doc_id,
               CASE WHEN t = '' THEN CAST([] AS VARCHAR[])
                    ELSE regexp_split_to_array(t, ' ') END AS w
        FROM nrm),
base AS (SELECT doc_id, len(w) AS n_tokens, w,
                CASE WHEN len(w) >= 3
                     THEN list_transform(range(1, len(w) - 1),
                                         i -> array_to_string(w[i:i+2], ' '))
                     ELSE CAST([] AS VARCHAR[]) END AS tri
         FROM tok),
uni AS (SELECT doc_id, max(c) AS top_uni FROM (
          SELECT doc_id, g, count(*) AS c
          FROM (SELECT doc_id, unnest(w) AS g FROM base) GROUP BY 1, 2)
        GROUP BY 1),
bi AS (SELECT doc_id, max(c) AS top_bi FROM (
         SELECT doc_id, g, count(*) AS c
         FROM (SELECT doc_id, unnest(
                 CASE WHEN len(w) >= 2
                      THEN list_transform(range(1, len(w)),
                                          i -> array_to_string(w[i:i+1], ' '))
                      ELSE CAST([] AS VARCHAR[]) END) AS g
               FROM base) GROUP BY 1, 2)
       GROUP BY 1)
SELECT b.doc_id,
       b.n_tokens,
       round(CASE WHEN b.n_tokens = 0 THEN 0.0
                  ELSE coalesce(u.top_uni, 0) * 1.0 / b.n_tokens END, 6) AS top_unigram_frac,
       round(CASE WHEN b.n_tokens <= 1 THEN 0.0
                  ELSE coalesce(i.top_bi, 0) * 1.0 / (b.n_tokens - 1) END, 6) AS top_bigram_frac,
       round(CASE WHEN len(b.tri) = 0 THEN 0.0
                  ELSE (len(b.tri) - len(list_distinct(b.tri))) * 1.0 / len(b.tri) END, 6) AS dup_trigram_frac,
       ((CASE WHEN b.n_tokens = 0 THEN 0.0
              ELSE coalesce(u.top_uni, 0) * 1.0 / b.n_tokens END) > 0.2
        OR (CASE WHEN len(b.tri) = 0 THEN 0.0
                 ELSE (len(b.tri) - len(list_distinct(b.tri))) * 1.0 / len(b.tri) END) > 0.5
       ) AS repetitive
FROM base b LEFT JOIN uni u USING (doc_id) LEFT JOIN bi i USING (doc_id)
"""


@register(
    "q83_repetition_metrics",
    covers="repetition text-quality text-analysis A1 J3",
    oracle=_Q83_ORACLE,
)
def q83_repetition_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    return repetition_metrics(load_table(spark, sf_dir, "documents"))


# ---------------------------------------------------------------------------
# q89: weighted mixture resampling (epoch construction). High-quality
#      sources upsample (2.3×: two guaranteed copies + a 30% md5-coin
#      third), mid sources stay 1×, bulk sources downsample to 0.4×.
#      The Spark side MATERIALIZES the copies (explode fan-out — the
#      operator under test); the oracle computes the same totals in
#      closed form (sum of floor(w) + coin), so any fan-out bug —
#      wrong copy count, dropped row, phantom copy, wrong coin — breaks
#      the hash. sum_copy_idx pins the per-row 1..n structure, not just
#      the total (n·(n+1)/2 per doc).
# ---------------------------------------------------------------------------
_Q89_W = (
    "CASE WHEN CAST(substr(source, 4, 10) AS INT) < 5 THEN 2300 "
    "WHEN CAST(substr(source, 4, 10) AS INT) < 10 THEN 1000 ELSE 400 END"
)

_Q89_ORACLE = f"""
WITH w AS (
  SELECT doc_id, source, {_Q89_W} AS wpm,
         CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':1'), 1, 6)) AS BIGINT)
           % 1000 AS bucket
  FROM documents
), n AS (
  SELECT doc_id, source,
         (wpm // 1000) + (CASE WHEN bucket < wpm % 1000 THEN 1 ELSE 0 END) AS n_copies
  FROM w
)
SELECT source,
       CAST(count(*) AS BIGINT) AS n_docs_in,
       CAST(sum(CASE WHEN n_copies > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_docs_kept,
       CAST(sum(n_copies) AS BIGINT) AS n_rows_out,
       CAST(sum(n_copies * (n_copies + 1) / 2) AS BIGINT) AS sum_copy_idx
FROM n
GROUP BY source
"""


@register(
    "q89_mixture_resample",
    covers="mixture P4 A1 text-analysis",
    oracle=_Q89_ORACLE,
)
def q89_mixture_resample(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.mixture import mixture_resample

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "source")
    src_n = F.substring("source", 4, 10).cast("int")
    wpm = (
        F.when(src_n < 5, 2300).when(src_n < 10, 1000).otherwise(400)
    ).cast("bigint")
    resampled = mixture_resample(docs, wpm, id_col="doc_id", epoch=1)
    per_source = resampled.groupBy("source").agg(
        F.count_distinct("doc_id").alias("n_docs_kept"),
        F.count(F.lit(1)).alias("n_rows_out"),
        F.sum("copy_idx").alias("sum_copy_idx"),
    )
    totals = docs.groupBy("source").agg(F.count(F.lit(1)).alias("n_docs_in"))
    return totals.join(per_source, "source", "left").select(
        "source",
        "n_docs_in",
        F.coalesce(F.col("n_docs_kept"), F.lit(0)).cast("bigint").alias("n_docs_kept"),
        F.coalesce(F.col("n_rows_out"), F.lit(0)).cast("bigint").alias("n_rows_out"),
        F.coalesce(F.col("sum_copy_idx"), F.lit(0)).cast("bigint").alias("sum_copy_idx"),
    )


# ---------------------------------------------------------------------------
# q90: leakage-safe dataset split — the subtle pipeline requirement that
#      near-duplicate documents must NEVER straddle train/eval (a
#      test-set member with a train-set near-twin leaks). Split
#      assignment hashes the CLUSTER representative (min doc_id of the
#      connected component over the Jaccard-0.5 near-dup graph), not the
#      document id, so whole dup-clusters move together by construction.
#      Oracle: recursive-CTE connected components (q69's idiom) + the
#      same md5 bucket on the representative — per-document hash check
#      of cluster AND split.
# ---------------------------------------------------------------------------
_TOKS_Q90 = "regexp_split_to_array(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')), ' ')"

_Q90_ORACLE = f"""
WITH RECURSIVE norm AS (
  SELECT doc_id, {_TOKS_Q90} AS t FROM documents
), sh AS (
  SELECT doc_id,
         list_distinct(list_transform(range(0, greatest(len(t) - 3, 0) + 1),
                                      i -> array_to_string(t[i+1:i+3], ' '))) AS s
  FROM norm
), pairs AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b
  FROM sh a JOIN sh b ON a.doc_id < b.doc_id
  WHERE CAST(len(list_intersect(a.s, b.s)) AS DOUBLE)
        / len(list_distinct(list_concat(a.s, b.s))) >= 0.5
), edges AS (
  SELECT id_a AS a, id_b AS b FROM pairs
  UNION
  SELECT id_b, id_a FROM pairs
), reach(node, r) AS (
  SELECT doc_id, doc_id FROM documents
  UNION
  SELECT e.a, reach.r FROM edges e JOIN reach ON e.b = reach.node
), cc AS (
  SELECT node AS doc_id, CAST(min(r) AS BIGINT) AS cluster
  FROM reach GROUP BY node
), split AS (
  SELECT doc_id, cluster,
         CAST(('0x' || substr(md5(CAST(cluster AS VARCHAR) || ':split'), 1, 6)) AS BIGINT)
           % 1000 AS bucket
  FROM cc
)
SELECT doc_id, cluster,
       CASE WHEN bucket < 800 THEN 'train'
            WHEN bucket < 900 THEN 'val'
            ELSE 'test' END AS split
FROM split
"""


@register(
    "q90_leakage_safe_split",
    covers="dedup-ngram-jaccard P4 A1 text-analysis",
    oracle=_Q90_ORACLE,
)
def q90_leakage_safe_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    # The near-dup graph + clustering is q69's shared stage — built once
    # per session and reused here, so split assignment costs only one
    # md5-bucket projection over the (doc_id, cluster) frame.
    from ..operators.mixture import leakage_safe_split
    from .corpus_text import shared_neardup_clusters

    clusters = shared_neardup_clusters(spark, sf_dir)
    return leakage_safe_split(clusters, train_permille=800, val_permille=100)


# ---------------------------------------------------------------------------
# q93: exact substring-span dedup (Lee et al. 2021, "Deduplicating
#      Training Data Makes Language Models Better") — per-document
#      coverage by verbatim >= 8-token spans shared with OTHER docs.
#      The suffix-array formulation becomes a hashed sliding-window
#      inventory + gaps-and-islands interval union in a distributed
#      engine (operators/span_dedup.py); every stage is exact and
#      deterministic, so the oracle replays the whole pipeline.
# ---------------------------------------------------------------------------
_NTOK = f"(CASE WHEN {_NORM} = '' THEN 0 ELSE len({_TOKS}) END)"

_Q93_ORACLE = f"""
WITH base AS (
  SELECT doc_id, {_NTOK} AS n_tokens, {_TOKS} AS t FROM documents
), wl AS (
  SELECT doc_id,
         list_transform(range(0, greatest(n_tokens - 7, 0)),
                        i -> struct_pack(pos := i, h := md5(array_to_string(t[i+1:i+8], ' ')))) AS ws
  FROM base
), w AS (
  SELECT doc_id, u.pos AS pos, u.h AS h FROM wl, unnest(ws) AS s(u)
), dh AS (
  SELECT h FROM w GROUP BY h HAVING min(doc_id) <> max(doc_id)
), dw AS (
  SELECT doc_id, pos FROM w WHERE h IN (SELECT h FROM dh)
), isl AS (
  SELECT doc_id, pos,
         max(pos + 8) OVER (PARTITION BY doc_id ORDER BY pos
                            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pe
  FROM dw
), cov AS (
  SELECT doc_id,
         count(*) AS n_dup_windows,
         sum(greatest(0, pos + 8 - greatest(pos, coalesce(pe, pos)))) AS dup_tokens
  FROM isl GROUP BY doc_id
)
SELECT b.doc_id, b.n_tokens,
       CAST(greatest(b.n_tokens - 7, 0) AS BIGINT) AS n_windows,
       CAST(coalesce(c.n_dup_windows, 0) AS BIGINT) AS n_dup_windows,
       CAST(coalesce(c.dup_tokens, 0) AS BIGINT) AS dup_tokens,
       round(CASE WHEN b.n_tokens > 0
                  THEN CAST(coalesce(c.dup_tokens, 0) AS DOUBLE) / b.n_tokens
                  ELSE 0.0 END, 4) AS dup_ratio
FROM base b LEFT JOIN cov c USING (doc_id)
"""


@register(
    "q93_substring_span_dedup",
    covers="dedup-substring text-analysis A1 J5 W3",
    oracle=_Q93_ORACLE,
)
def q93_substring_span_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.span_dedup import duplicated_span_metrics

    docs = load_table(spark, sf_dir, "documents")
    return duplicated_span_metrics(docs, "text", "doc_id", k=8)


# ---------------------------------------------------------------------------
# q94: unigram-LM perplexity scoring — the deterministic stand-in for the
#      KenLM perplexity filters of CCNet/Gopher/RedPajama. The model (top
#      256 tokens by frequency, ties on token text, add-one smoothing) is
#      fit on the corpus itself with a distributed sort+limit and then
#      BROADCAST to the scoring join; log2 is the only float step and
#      both engines take it over identical rational inputs.
# ---------------------------------------------------------------------------
_Q94_ORACLE = f"""
WITH tok AS (
  SELECT doc_id, u AS token
  FROM (SELECT doc_id, {_TOKS} AS t FROM documents WHERE {_NORM} <> ''), unnest(t) AS s(u)
), counts AS (
  SELECT token, count(*) AS c FROM tok GROUP BY token
), vocab AS (
  SELECT token, c FROM counts ORDER BY c DESC, token LIMIT 256
), scal AS (
  SELECT (SELECT count(*) FROM vocab) AS v, (SELECT CAST(sum(c) AS BIGINT) FROM counts) AS n
), pd AS (
  SELECT t.doc_id,
         count(*) AS n_tokens,
         sum(CASE WHEN vo.c IS NULL THEN 1 ELSE 0 END) AS n_oov,
         round(-avg(log2(CAST(coalesce(vo.c, 0) + 1 AS DOUBLE) / (s.n + s.v + 1))), 4) AS nll_bits
  FROM tok t LEFT JOIN vocab vo USING (token) CROSS JOIN scal s
  GROUP BY t.doc_id
)
SELECT doc_id, n_tokens,
       CAST(n_oov AS BIGINT) AS n_oov,
       round(CAST(n_oov AS DOUBLE) / n_tokens, 4) AS oov_ratio,
       nll_bits,
       round(power(2, nll_bits), 2) AS ppl
FROM pd
"""


@register(
    "q94_unigram_lm_score",
    covers="text-analysis lm-score A1 A2 O2 J1",
    oracle=_Q94_ORACLE,
)
def q94_unigram_lm_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.lm import unigram_lm_score

    docs = load_table(spark, sf_dir, "documents")
    return unigram_lm_score(docs, "text", "doc_id", vocab_size=256)


# ---------------------------------------------------------------------------
# q95: temperature-smoothed mixture weights (alpha = 0.5) — the data-
#      mixture design step (mBERT/XLM-R/PaLM style): flatten per-source
#      token shares so small sources are upsampled. Runs on the OUTPUT of
#      a per-source aggregate; alpha is 0.5 because sqrt is IEEE-exact in
#      every engine, keeping the cross-engine hash check float-safe.
# ---------------------------------------------------------------------------
_Q95_ORACLE = f"""
WITH sz AS (
  SELECT source, count(*) AS n_docs, CAST(sum({_NTOK}) AS BIGINT) AS n_tokens
  FROM documents GROUP BY source
), tot AS (
  SELECT CAST(sum(n_tokens) AS DOUBLE) AS tn,
         sum(sqrt(CAST(n_tokens AS DOUBLE))) AS ta
  FROM sz
)
SELECT source, n_docs, n_tokens,
       round(CAST(n_tokens AS DOUBLE) / t.tn, 6) AS p_raw,
       round(sqrt(CAST(n_tokens AS DOUBLE)) / t.ta, 6) AS p_temp,
       round((sqrt(CAST(n_tokens AS DOUBLE)) / t.ta) / (CAST(n_tokens AS DOUBLE) / t.tn), 4) AS boost
FROM sz CROSS JOIN tot t
"""


@register(
    "q95_temperature_mixture",
    covers="mixture A1 A2 J9",
    oracle=_Q95_ORACLE,
)
def q95_temperature_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.mixture import temperature_mixture_weights
    from ..operators.text_ops import _fan_out
    from ..functions.text import token_count_ws

    docs = load_table(spark, sf_dir, "documents")
    sizes = (
        _fan_out(docs)
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(token_count_ws("text")).cast("bigint").alias("n_tokens"),
        )
    )
    return temperature_mixture_weights(sizes, group_col="source", size_col="n_tokens")


# ---------------------------------------------------------------------------
# q96: stratified exact-quota sample — ceil(20% * n) docs from every
#      (source, lang) stratum, chosen by a salted-md5 deterministic
#      permutation (the distributed equivalent of per-stratum reservoir
#      sampling). One shuffle; both window functions share it.
# ---------------------------------------------------------------------------
_Q96_ORACLE = """
WITH r AS (
  SELECT doc_id, source, lang,
         row_number() OVER (PARTITION BY source, lang
                            ORDER BY md5(CAST(doc_id AS VARCHAR) || ':strat'), doc_id) AS sample_rank,
         count(*) OVER (PARTITION BY source, lang) AS stratum_n
  FROM documents
)
SELECT doc_id, source, lang,
       CAST(sample_rank AS BIGINT) AS sample_rank,
       CAST(stratum_n AS BIGINT) AS stratum_n
FROM r
WHERE sample_rank <= (stratum_n * 200 + 999) // 1000
"""


@register(
    "q96_stratified_sample",
    covers="P4 W1 W2 text-analysis",
    oracle=_Q96_ORACLE,
)
def q96_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.sampling import stratified_exact_sample

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "source", "lang")
    return stratified_exact_sample(
        docs, ["source", "lang"], frac_permille=200, id_col="doc_id", salt="strat"
    )


# ---------------------------------------------------------------------------
# q97: budget-constrained corpus selection — the capstone of the mixture
#      family: q95's temperature weights become per-source token QUOTAS
#      (half the corpus's tokens as the budget), and each quota is filled
#      with the source's best documents first (quality desc, id tiebreak)
#      via a running token sum. Every step is deterministic — integer
#      token counts, one sqrt, one floor — so the oracle replays the
#      whole pipeline including the quality model.
# ---------------------------------------------------------------------------
_Q97_PUNCT = r"'[^A-Za-z0-9\s]'"
_Q97_SW = "('the','a','and','of','to','in','is','it','that','for')"

_Q97_ORACLE = f"""
WITH m AS (
  SELECT doc_id, source,
         length(text) AS nc,
         {_NTOK} AS n_tokens,
         CASE WHEN {_NTOK} = 0 THEN 0.0
              ELSE CAST(length(replace({_NORM}, ' ', '')) AS DOUBLE) / {_NTOK} END AS mtl,
         CASE WHEN length(text) = 0 THEN 0.0
              ELSE CAST(len(regexp_extract_all(text, {_Q97_PUNCT})) AS DOUBLE) / length(text) END AS pr,
         CASE WHEN {_NTOK} = 0 THEN 0.0
              ELSE CAST(len(list_filter({_TOKS}, t -> t IN {_Q97_SW})) AS DOUBLE) / {_NTOK} END AS swr
  FROM documents
), q AS (
  SELECT doc_id, source, n_tokens,
         round(CAST(CASE WHEN nc BETWEEN 64 AND 4096 THEN 0.25 ELSE 0.0 END
             + CASE WHEN mtl >= 3 AND mtl <= 12 THEN 0.25 ELSE 0.0 END
             + CASE WHEN pr <= 0.2 THEN 0.25 ELSE 0.0 END
             + CASE WHEN swr >= 0.02 THEN 0.25 ELSE 0.0 END AS DOUBLE), 2) AS quality_score
  FROM m
), sz AS (
  SELECT source, CAST(sum(n_tokens) AS BIGINT) AS gtok FROM q GROUP BY source
), tot AS (
  SELECT sum(sqrt(CAST(gtok AS DOUBLE))) AS ta,
         CAST(sum(gtok) AS BIGINT) * 500 // 1000 AS budget
  FROM sz
), quo AS (
  SELECT source,
         CAST(floor(round(sqrt(CAST(gtok AS DOUBLE)) / t.ta, 6) * t.budget) AS BIGINT) AS quota
  FROM sz CROSS JOIN tot t
), r AS (
  SELECT doc_id, source, n_tokens, quality_score,
         CAST(sum(n_tokens) OVER (PARTITION BY source
                                  ORDER BY quality_score DESC, doc_id ASC
                                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_tokens
  FROM q
)
SELECT r.doc_id, r.source, r.n_tokens, r.quality_score, r.cum_tokens, qo.quota
FROM r JOIN quo qo ON r.source = qo.source
WHERE r.cum_tokens <= qo.quota
"""


@register(
    "q97_budget_selection",
    covers="mixture text-quality W3 A1 J1 J9",
    oracle=_Q97_ORACLE,
)
def q97_budget_selection(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.selection import budget_constrained_selection
    from ..operators.text_ops import text_quality

    docs = load_table(spark, sf_dir, "documents")
    scored = text_quality(docs, keep_cols=("source",)).select(
        "doc_id", "source", "n_tokens", "quality_score"
    )
    return budget_constrained_selection(
        scored,
        budget_frac_permille=500,
        group_col="source",
        token_col="n_tokens",
        quality_col="quality_score",
        id_col="doc_id",
    )


# ---------------------------------------------------------------------------
# q98: Bloom-prefiltered incremental dedup — the continuous-ingest shape:
#      an incoming batch is deduped AGAINST the existing corpus, not
#      against itself. Incoming = the doc_id % 3 = 0 slice (novel texts)
#      PLUS planted re-ingests (doc_id % 7 = 1 docs re-badged with
#      doc_id + 1000000 but identical text) — the planted rows MUST
#      drop, the novel rows MUST survive, so both branches of the
#      pipeline carry verified weight. The Bloom filter (distributed
#      bit-OR build, driver state = num_bits/64 longs) prefilters the
#      batch before the exact anti-join removes its false positives; no
#      false negatives by construction, so the result is EXACTLY the
#      anti-join and the oracle is plain SQL. At 100 TB the filter
#      broadcasts where the reference fingerprint set cannot.
# ---------------------------------------------------------------------------
_Q98_ORACLE = f"""
WITH inc AS (
  SELECT doc_id, source, md5({_NORM}) AS fingerprint
  FROM documents WHERE doc_id % 3 = 0
  UNION ALL
  SELECT doc_id + 1000000, source, md5({_NORM}) AS fingerprint
  FROM documents WHERE doc_id % 3 <> 0 AND doc_id % 7 = 1
), ex AS (
  SELECT DISTINCT md5({_NORM}) AS fingerprint
  FROM documents WHERE doc_id % 3 <> 0
)
SELECT i.doc_id, i.source, i.fingerprint
FROM inc i LEFT JOIN ex e USING (fingerprint)
WHERE e.fingerprint IS NULL
"""


@register(
    "q98_bloom_incremental_dedup",
    covers="dedup-exact dedup-bloom J6 M7 P3 A1 U1",
    oracle=_Q98_ORACLE,
)
def q98_bloom_incremental_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.text import fingerprint_md5
    from ..operators.bloom_dedup import bloom_prefiltered_anti_join

    docs = load_table(spark, sf_dir, "documents")
    with_fp = docs.select(
        "doc_id", "source", fingerprint_md5("text").alias("fingerprint")
    )
    replayed = (
        with_fp.filter((F.col("doc_id") % 3 != 0) & (F.col("doc_id") % 7 == 1))
        .withColumn("doc_id", F.col("doc_id") + 1000000)
    )
    incoming = with_fp.filter(F.col("doc_id") % 3 == 0).unionByName(replayed)
    existing = with_fp.filter(F.col("doc_id") % 3 != 0).select("fingerprint")
    return bloom_prefiltered_anti_join(
        incoming, existing, "fingerprint", num_bits=1 << 17, num_hashes=4
    )


# ---------------------------------------------------------------------------
# q99: TF-IDF keyword extraction — top-5 terms per source by smoothed
#      tf*ln((N+1)/(df+1)). Ranking is on the ROUNDED score with the
#      term as tiebreak, so the selected set is reproducible across
#      engines (raw float ordering would expose libm ULP differences).
#      The df/tf join stays on the token key (vocabulary-sized — no
#      broadcast), the per-source top-k is one window.
# ---------------------------------------------------------------------------
_Q99_ORACLE = f"""
WITH toks AS (
  SELECT doc_id, source, u AS term
  FROM (SELECT doc_id, source, {_TOKS} AS t FROM documents WHERE {_NORM} <> ''),
       unnest(t) AS s(u)
), nd AS (
  SELECT count(DISTINCT doc_id) AS n_docs FROM toks
), dfx AS (
  SELECT term, CAST(count(DISTINCT doc_id) AS BIGINT) AS df FROM toks GROUP BY term
), tfx AS (
  SELECT source, term, CAST(count(*) AS BIGINT) AS tf FROM toks GROUP BY source, term
), sc AS (
  SELECT t.source, t.term, t.tf, d.df,
         round(t.tf * ln(CAST(n.n_docs + 1 AS DOUBLE) / (d.df + 1)), 4) AS tfidf
  FROM tfx t JOIN dfx d USING (term) CROSS JOIN nd n
), r AS (
  SELECT *, row_number() OVER (PARTITION BY source
                               ORDER BY tfidf DESC, term ASC) AS rk
  FROM sc
)
SELECT source, term, tf, df, tfidf, CAST(rk AS BIGINT) AS term_rank
FROM r WHERE rk <= 5
"""


@register(
    "q99_tfidf_keywords",
    covers="text-analysis tfidf A1 A3 W1 J1 J9 O2",
    oracle=_Q99_ORACLE,
)
def q99_tfidf_keywords(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.keywords import tfidf_top_terms

    docs = load_table(spark, sf_dir, "documents")
    out = tfidf_top_terms(docs, "text", "doc_id", "source", top_k=5)
    return out.withColumn("term_rank", F.col("term_rank").cast("bigint"))


# ---------------------------------------------------------------------------
# q100: DSIR-style importance weights (Xie et al. 2023) — hashed-bigram
#       log-likelihood ratio of the target distribution (lang='en' docs)
#       vs the raw corpus, add-one smoothed over 1024 buckets. The
#       model is TWO count vectors fit in one hash aggregation and
#       broadcast back (1024 rows regardless of corpus size); the only
#       float steps are log2 + one round(4), same discipline as q94.
# ---------------------------------------------------------------------------
_Q100_ORACLE = f"""
WITH base AS (
  SELECT doc_id, (lang = 'en') AS tgt, {_TOKS} AS t
  FROM documents WHERE {_NORM} <> ''
), big AS (
  SELECT doc_id, tgt,
         list_transform(range(0, len(t) - 1), i -> t[i+1] || ' ' || t[i+2]) AS bl
  FROM base WHERE len(t) >= 2
), f AS (
  SELECT doc_id, tgt,
         CAST(CAST(('0x' || substr(md5(u), 1, 8)) AS BIGINT) % 1024 AS INT) AS bucket
  FROM big, unnest(bl) AS s(u)
), cnt AS (
  SELECT bucket, count(*) AS c_raw,
         sum(CASE WHEN tgt THEN 1 ELSE 0 END) AS c_tgt
  FROM f GROUP BY bucket
), tot AS (
  SELECT sum(c_raw) AS n_raw, sum(c_tgt) AS n_tgt FROM cnt
), model AS (
  SELECT bucket,
         log2(CAST(c_tgt + 1 AS DOUBLE) / (t.n_tgt + 1024))
       - log2(CAST(c_raw + 1 AS DOUBLE) / (t.n_raw + 1024)) AS lr
  FROM cnt CROSS JOIN tot t
)
SELECT f.doc_id, CAST(count(*) AS BIGINT) AS n_feats,
       round(avg(m.lr), 4) AS dsir_score
FROM f JOIN model m USING (bucket)
GROUP BY f.doc_id
"""


@register(
    "q100_dsir_importance",
    covers="text-analysis dsir mixture A1 A2 J1 J9",
    oracle=_Q100_ORACLE,
)
def q100_dsir_importance(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.dsir import dsir_importance_weights

    docs = load_table(spark, sf_dir, "documents").withColumn(
        "__is_target", F.col("lang") == "en"
    )
    return dsir_importance_weights(
        docs, "text", "doc_id", "__is_target", num_buckets=1024
    )


# ---------------------------------------------------------------------------
# q112: hashed linear classifier inference (fastText-shape quality gate,
#       Joulin et al. 2016 / CCNet) — unigram+bigram features hashed to
#       1024 buckets, a B-row broadcast weight vector, mean-weight
#       logit → sigmoid → keep/drop. The "trained" weights are a
#       deterministic md5-derived vector so the oracle rebuilds the
#       exact model from scratch; swapping in real trained weights
#       changes ONLY the weight frame, not the engine path.
# ---------------------------------------------------------------------------
_Q112_BUCKETS = 1024
_Q112_ORACLE = f"""
WITH base AS (
  SELECT doc_id, {_TOKS} AS t FROM documents WHERE {_NORM} <> ''
), uni AS (
  SELECT doc_id, u AS f FROM base, unnest(t) AS s(u)
), bi AS (
  SELECT doc_id, u AS f
  FROM (SELECT doc_id,
               list_transform(range(0, len(t) - 1),
                              i -> t[i+1] || ' ' || t[i+2]) AS bl
        FROM base WHERE len(t) >= 2),
       unnest(bl) AS s(u)
), feats AS (
  SELECT doc_id,
         CAST(CAST(('0x' || substr(md5(f), 1, 8)) AS BIGINT)
              % {_Q112_BUCKETS} AS INT) AS bucket
  FROM (SELECT * FROM uni UNION ALL SELECT * FROM bi)
), w AS (
  SELECT CAST(b AS INT) AS bucket,
         (CAST(('0x' || substr(md5('w' || CAST(b AS VARCHAR)), 1, 8)) AS BIGINT)
          % 2001 - 1000) / 1000.0 AS wt
  FROM range(0, {_Q112_BUCKETS}) AS r(b)
), sc AS (
  SELECT f.doc_id, CAST(count(*) AS BIGINT) AS n_feats,
         round(-0.05 + sum(w.wt) / count(*), 4) AS logit
  FROM feats f JOIN w USING (bucket)
  GROUP BY f.doc_id
)
SELECT doc_id, n_feats, logit,
       round(1.0 / (1.0 + exp(-logit)), 4) AS prob,
       CASE WHEN round(1.0 / (1.0 + exp(-logit)), 4) >= 0.5
            THEN 'keep' ELSE 'drop' END AS label
FROM sc
"""


@register(
    "q112_classifier_inference",
    covers="classifier-inference text-analysis text-quality A1 J1 P2",
    oracle=_Q112_ORACLE,
)
def q112_classifier_inference(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.classifier import demo_weight_vector, hashed_classifier_scores

    docs = load_table(spark, sf_dir, "documents")
    weights = demo_weight_vector(spark, _Q112_BUCKETS)
    return hashed_classifier_scores(
        docs, "text", "doc_id", weights, num_buckets=_Q112_BUCKETS
    )
