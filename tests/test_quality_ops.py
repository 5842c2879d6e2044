"""Edge-case tests for the corpus-hygiene operators (q80-q83 family):
semantic dedup, contamination check, PII scrub, repetition metrics."""

from __future__ import annotations

from pyspark.sql import functions as F

from iceberg_evaluation_spark.operators.contamination import contamination_check
from iceberg_evaluation_spark.operators.similarity import semantic_dedup
from iceberg_evaluation_spark.operators.text_ops import pii_scrub, repetition_metrics


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id bigint, text string")


# ---------------------------------------------------------------- contamination
def test_contamination_planted_copy_flags(spark):
    ev = _docs(spark, [(0, "a b c d e f g h i j")])
    train = _docs(
        spark,
        [
            (1, "a b c d e f g h i j"),  # identical → contaminated
            (2, "z y x w v u t s r q"),  # disjoint → clean
            (3, "short text"),  # < n tokens → 0 grams, clean
        ],
    )
    out = {r["doc_id"]: r for r in contamination_check(train, ev, n=8).collect()}
    assert out[1]["contaminated"] and out[1]["overlap_frac"] == 1.0
    assert not out[2]["contaminated"] and out[2]["n_matched"] == 0
    assert out[3]["n_grams"] == 0 and out[3]["overlap_frac"] == 0.0


def test_contamination_partial_overlap(spark):
    # train doc shares exactly its first 8-gram with the eval set
    ev = _docs(spark, [(0, "a b c d e f g h")])
    train = _docs(spark, [(1, "a b c d e f g h x")])  # grams: [a..h], [b..x]
    row = contamination_check(train, ev, n=8).collect()[0]
    assert row["n_grams"] == 2 and row["n_matched"] == 1
    assert row["overlap_frac"] == 0.5


# ---------------------------------------------------------------- pii scrub
def test_pii_scrub_counts_and_redaction(spark):
    df = _docs(
        spark,
        [
            (1, "mail me at jo.doe+x@sub.example.com or 555-1234 via 192.168.0.1"),
            (2, "no pii here at all"),
            (3, ""),
        ],
    )
    out = {r["doc_id"]: r for r in pii_scrub(df).collect()}
    assert (out[1]["n_emails"], out[1]["n_phones"], out[1]["n_ips"]) == (1, 1, 1)
    assert out[1]["pii_found"]
    assert not out[2]["pii_found"]
    assert out[3]["n_emails"] == 0
    # redaction actually replaced the text (fp differs from raw md5)
    raw_fp = df.filter(F.col("doc_id") == 1).select(F.md5("text")).collect()[0][0]
    assert out[1]["redacted_fp"] != raw_fp
    # clean text is untouched → fp equals raw md5
    raw2 = df.filter(F.col("doc_id") == 2).select(F.md5("text")).collect()[0][0]
    assert out[2]["redacted_fp"] == raw2


def test_pii_phone_word_boundary(spark):
    # digits embedded in longer runs must NOT match the phone pattern
    df = _docs(spark, [(1, "serial 1555-12345 is not a phone")])
    row = pii_scrub(df).collect()[0]
    assert row["n_phones"] == 0


# ---------------------------------------------------------------- repetition
def test_repetition_flags_degenerate_doc(spark):
    df = _docs(
        spark,
        [
            (1, "spam spam spam spam spam"),  # one token repeated
            (2, "a b c d e f g h i j"),  # all distinct
            (3, ""),  # empty
            (4, "x y"),  # too short for trigrams
        ],
    )
    out = {r["doc_id"]: r for r in repetition_metrics(df).collect()}
    assert out[1]["top_unigram_frac"] == 1.0
    # 3 trigram occurrences, 1 distinct → dup frac 2/3 (rounded to 6 dp)
    assert abs(out[1]["dup_trigram_frac"] - 2.0 / 3.0) < 1e-5
    assert out[1]["repetitive"]
    assert out[2]["top_unigram_frac"] == 0.1 and not out[2]["repetitive"]
    assert out[3]["n_tokens"] == 0 and out[3]["top_unigram_frac"] == 0.0
    assert out[4]["dup_trigram_frac"] == 0.0


def test_repetition_top_bigram(spark):
    # "ab ab ab" → bigrams: "ab ab","ab ab" → top_bigram_frac = 1.0
    df = _docs(spark, [(1, "ab ab ab")])
    row = repetition_metrics(df).collect()[0]
    assert row["top_bigram_frac"] == 1.0


# ---------------------------------------------------------------- semantic dedup
def test_semantic_dedup_drops_planted_copies(spark):
    import math

    rows = []
    for i in range(8):
        v = [0.0] * 64
        v[i % 64] = 1.0
        v[(i * 7 + 3) % 64] = 0.5
        rows.append((i, [float(x) for x in v]))
    emb = spark.createDataFrame(rows, "vec_id bigint, embedding array<float>")
    copies = emb.select((F.col("vec_id") + 100).alias("vec_id"), "embedding")
    out = {
        r["vec_id"]: r
        for r in semantic_dedup(emb.unionByName(copies), threshold=0.95).collect()
    }
    assert len(out) == 16
    for i in range(8):
        assert out[i]["kept"], f"original {i} must be kept"
        assert not out[i + 100]["kept"], f"copy {i + 100} must drop"
        assert out[i + 100]["n_lower_nbrs"] >= 1


# ---------------------------------------------------------------- mixture
def test_mixture_resample_copy_structure(spark):
    from iceberg_evaluation_spark.operators.mixture import mixture_resample

    df = spark.createDataFrame([(i, "s") for i in range(200)], "doc_id long, src string")
    # pure upsample: exactly 2 copies each, copy_idx = 1, 2
    out = mixture_resample(df, F.lit(2000), epoch=1)
    assert out.count() == 400
    per = out.groupBy("doc_id").count().collect()
    assert all(r["count"] == 2 for r in per)
    idx = {(r["doc_id"], r["copy_idx"]) for r in out.collect()}
    assert (0, 1) in idx and (0, 2) in idx

    # fractional: 1.5x → between 1 and 2 copies per doc, mean ≈ 1.5
    frac = mixture_resample(df, F.lit(1500), epoch=1)
    n = frac.count()
    assert 200 <= n <= 400 and abs(n - 300) < 60  # md5 coin ≈ 50%

    # epoch changes re-roll the coin without changing guaranteed copies
    frac2 = mixture_resample(df, F.lit(1500), epoch=2)
    kept1 = {r["doc_id"] for r in frac.filter("copy_idx = 2").collect()}
    kept2 = {r["doc_id"] for r in frac2.filter("copy_idx = 2").collect()}
    assert kept1 != kept2  # different epochs sample different extras
    # downsample region: 0 copies possible, weight 0 drops everything
    assert mixture_resample(df, F.lit(0), epoch=1).count() == 0
