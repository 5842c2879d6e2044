"""Every operator must degrade to empty output (not crash) on empty
inputs — empty CDC days and empty partitions are routine at scale."""

from __future__ import annotations

import tempfile

from pyspark.sql import functions as F

from iceberg_evaluation_spark.operators.dedup import (
    exact_dedup,
    minhash_near_duplicates,
    ngram_jaccard_pairs,
    simhash_near_duplicates,
)
from iceberg_evaluation_spark.operators.scd2 import bulk_insert, scd2_complex
from iceberg_evaluation_spark.operators.similarity import (
    cosine_pairs,
    cosine_topk,
    ivf_cosine_topk,
)
from iceberg_evaluation_spark.operators.text_ops import (
    language_id,
    rolling_fingerprint,
    text_quality,
)
from iceberg_evaluation_spark.tables.snapshot_table import SnapshotTable


def test_text_and_dedup_ops_on_empty(spark):
    docs = spark.createDataFrame([], "doc_id bigint, text string")
    for fn in (
        lambda: exact_dedup(docs, "text", "doc_id"),
        lambda: minhash_near_duplicates(docs, "doc_id", "text"),
        lambda: simhash_near_duplicates(docs, "doc_id", "text"),
        lambda: ngram_jaccard_pairs(docs, "doc_id", "text"),
        lambda: text_quality(docs),
        lambda: language_id(docs),
        lambda: rolling_fingerprint(docs),
    ):
        assert fn().count() == 0


def test_similarity_ops_on_empty(spark):
    emb = spark.createDataFrame([], "vec_id bigint, embedding array<float>")
    queries = emb.select(F.col("vec_id").alias("query_id"), "embedding")
    assert cosine_topk(emb, queries).count() == 0
    assert cosine_pairs(emb).count() == 0
    out = ivf_cosine_topk(emb, queries)
    assert out.count() == 0
    assert set(out.columns) == {"query_id", "vec_id", "cosine_sim", "rk"}


def test_scd2_empty_update_batch_is_noop(spark):
    feed = spark.range(10).select(
        F.col("id").alias("pk"),
        F.lit("2024-01-01 00:00:00").cast("timestamp").alias("extraction_timestamp"),
        (F.col("id") * 1.0).alias("price"),
    )
    t = SnapshotTable(spark, tempfile.mkdtemp(prefix="empty_scd2_"))
    bulk_insert(t, feed)
    before = sorted(map(tuple, t.read().collect()))
    scd2_complex(t, feed.limit(0))
    assert sorted(map(tuple, t.read().collect())) == before


def test_round3_pipeline_ops_on_empty(spark):
    from iceberg_evaluation_spark.operators.lm import unigram_lm_score
    from iceberg_evaluation_spark.operators.sampling import stratified_exact_sample
    from iceberg_evaluation_spark.operators.selection import (
        budget_constrained_selection,
    )
    from iceberg_evaluation_spark.operators.span_dedup import duplicated_span_metrics

    docs = spark.createDataFrame([], "doc_id bigint, text string")
    assert duplicated_span_metrics(docs).count() == 0
    assert unigram_lm_score(docs).count() == 0

    strat = spark.createDataFrame([], "doc_id bigint, source string, lang string")
    assert stratified_exact_sample(strat, ["source", "lang"]).count() == 0

    scored = spark.createDataFrame(
        [], "doc_id bigint, source string, n_tokens int, quality_score double"
    )
    assert budget_constrained_selection(scored).count() == 0


def test_temperature_weights_single_group(spark):
    from iceberg_evaluation_spark.operators.mixture import (
        temperature_mixture_weights,
    )

    one = spark.createDataFrame([("only", 42)], "source string, n_tokens bigint")
    row = temperature_mixture_weights(one).collect()[0]
    assert row["p_raw"] == 1.0 and row["p_temp"] == 1.0 and row["boost"] == 1.0


def test_round3b_ops_on_empty(spark):
    from iceberg_evaluation_spark.operators.bloom_dedup import (
        bloom_prefiltered_anti_join,
    )
    from iceberg_evaluation_spark.operators.dsir import dsir_importance_weights
    from iceberg_evaluation_spark.operators.keywords import tfidf_top_terms

    docs = spark.createDataFrame(
        [], "doc_id bigint, source string, tgt boolean, text string"
    )
    assert tfidf_top_terms(docs, "text", "doc_id", "source").count() == 0
    assert dsir_importance_weights(docs, "text", "doc_id", "tgt").count() == 0

    fps = spark.createDataFrame([], "id bigint, fp string")
    # empty incoming AND empty existing (all-zero filter) in both modes
    for probe in ("literal", "pandas"):
        out = bloom_prefiltered_anti_join(
            fps, fps.select("fp"), "fp", num_bits=256, num_hashes=3, probe=probe
        )
        assert out.count() == 0
