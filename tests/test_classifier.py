"""Hashed linear classifier inference (operators/classifier)."""

from __future__ import annotations

from pyspark.sql import functions as F

from iceberg_evaluation_spark.operators.classifier import (
    demo_weight_vector,
    hashed_classifier_scores,
)


def test_demo_weights_shape(spark):
    w = demo_weight_vector(spark, 64).collect()
    assert len(w) == 64
    assert all(-1.0 <= r["wt"] <= 1.0 for r in w)
    # deterministic across calls
    again = demo_weight_vector(spark, 64).collect()
    assert sorted(map(tuple, w)) == sorted(map(tuple, again))


def test_scores_contract(spark):
    docs = spark.createDataFrame(
        [
            (1, "alpha beta gamma"),
            (2, "alpha  beta   GAMMA"),  # ws/case jitter → same features
            (3, "one"),                  # single token → no bigrams
            (4, ""),                     # empty after norm → dropped
        ],
        "doc_id bigint, text string",
    )
    w = demo_weight_vector(spark, 128)
    out = {
        r["doc_id"]: r
        for r in hashed_classifier_scores(
            docs, "text", "doc_id", w, num_buckets=128
        ).collect()
    }
    assert set(out) == {1, 2, 3}
    # 3 unigrams + 2 bigrams
    assert out[1]["n_feats"] == 5
    assert out[3]["n_feats"] == 1
    # normalization makes 1 and 2 identical
    assert out[1]["logit"] == out[2]["logit"]
    assert out[1]["prob"] == out[2]["prob"]
    for r in out.values():
        assert 0.0 <= r["prob"] <= 1.0
        assert r["label"] == ("keep" if r["prob"] >= 0.5 else "drop")


def test_known_weights_exact_score(spark):
    """With a hand-built weight vector the logit is exactly computable."""
    docs = spark.createDataFrame([(1, "x x")], "doc_id bigint, text string")
    # features: 'x' (twice) and 'x x' (once); force every bucket weight
    # to 0.5 so the mean is 0.5 regardless of hashing
    w = spark.range(32).select(
        F.col("id").cast("int").alias("bucket"), F.lit(0.5).alias("wt")
    )
    row = hashed_classifier_scores(
        docs, "text", "doc_id", w, num_buckets=32, bias=0.25
    ).collect()[0]
    assert row["n_feats"] == 3
    assert row["logit"] == 0.75
    assert row["label"] == "keep"


def test_weights_contract_enforced(spark):
    """r5 verdict #4: duplicate or missing bucket rows must raise, not
    silently corrupt (fan-out double-count / dropped features)."""
    import pytest

    docs = spark.createDataFrame(
        [(1, "alpha beta gamma")], "doc_id bigint, text string"
    )
    good = demo_weight_vector(spark, 64)

    # duplicate bucket: right row count, fan-out hazard
    dup = good.limit(63).unionByName(
        spark.createDataFrame([(0, 0.5)], "bucket int, wt double")
    )
    with pytest.raises(ValueError, match="exactly one row per bucket"):
        hashed_classifier_scores(docs, "text", "doc_id", dup, num_buckets=64)

    # missing bucket: silently dropped features
    with pytest.raises(ValueError, match="exactly one row per bucket"):
        hashed_classifier_scores(
            docs, "text", "doc_id", good.limit(63), num_buckets=64
        )

    # out-of-range bucket id: count right, coverage wrong
    shifted = good.withColumn(
        "bucket", (F.col("bucket") + F.lit(1)).cast("int")
    )
    with pytest.raises(ValueError, match="exactly one row per bucket"):
        hashed_classifier_scores(
            docs, "text", "doc_id", shifted, num_buckets=64
        )

    # valid model still scores; check_weights=False skips the guard
    assert hashed_classifier_scores(
        docs, "text", "doc_id", good, num_buckets=64
    ).count() == 1
    assert hashed_classifier_scores(
        docs, "text", "doc_id", good, num_buckets=64, check_weights=False
    ).count() == 1
