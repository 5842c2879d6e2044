"""Unit tests for the round-3 additions: Bloom-prefiltered incremental
dedup, TF-IDF keyword extraction, and DSIR importance weights."""

from __future__ import annotations

import hashlib
import math

from pyspark.sql import functions as F

from iceberg_evaluation_spark.operators.bloom_dedup import (
    bloom_position_exprs,
    bloom_prefiltered_anti_join,
    build_bloom_words,
)
from iceberg_evaluation_spark.operators.dsir import dsir_importance_weights
from iceberg_evaluation_spark.operators.keywords import tfidf_top_terms


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id bigint, source string, text string")


# ---------------------------------------------------------------------------
# Bloom-prefiltered incremental dedup
# ---------------------------------------------------------------------------


def _bloom_fixture(spark):
    incoming = spark.createDataFrame(
        [(1, "aa"), (2, "bb"), (3, "cc"), (4, "dd")], "id bigint, fp string"
    )
    existing = spark.createDataFrame([("bb",), ("dd",), ("zz",)], "fp string")
    return incoming, existing


def test_bloom_literal_equals_exact_anti_join(spark):
    incoming, existing = _bloom_fixture(spark)
    out = bloom_prefiltered_anti_join(
        incoming, existing, "fp", num_bits=1024, num_hashes=4, probe="literal"
    )
    assert sorted(r["id"] for r in out.collect()) == [1, 3]


def test_bloom_pandas_probe_equals_literal(spark):
    incoming, existing = _bloom_fixture(spark)
    lit = bloom_prefiltered_anti_join(
        incoming, existing, "fp", num_bits=1024, num_hashes=4, probe="literal"
    )
    pan = bloom_prefiltered_anti_join(
        incoming, existing, "fp", num_bits=1024, num_hashes=4, probe="pandas"
    )
    assert sorted(map(tuple, lit.collect())) == sorted(map(tuple, pan.collect()))


def test_bloom_no_false_negatives(spark):
    # every member of the build set must probe positive: feeding the
    # build set itself through the pipeline must return zero rows
    fps = spark.createDataFrame([(f"k{i}",) for i in range(500)], "fp string")
    out = bloom_prefiltered_anti_join(
        fps, fps, "fp", num_bits=64 * 4, num_hashes=3, probe="literal"
    )  # deliberately tiny + saturated filter: exactness must still hold
    assert out.count() == 0


def test_bloom_empty_existing_keeps_everything(spark):
    incoming, existing = _bloom_fixture(spark)
    out = bloom_prefiltered_anti_join(
        incoming, existing.filter(F.lit(False)), "fp", num_bits=1024, num_hashes=4
    )
    assert out.count() == 4


def test_bloom_prefilter_actually_prunes(spark):
    # with a well-sized filter, non-members should overwhelmingly fail
    # the probe — pin the plumbing by checking the tag column directly
    from iceberg_evaluation_spark.operators.bloom_dedup import _with_might_literal

    existing = spark.createDataFrame([(f"e{i}",) for i in range(100)], "fp string")
    probe_set = spark.createDataFrame([(f"n{i}",) for i in range(200)], "fp string")
    words = build_bloom_words(existing, "fp", num_bits=1 << 13, num_hashes=4)
    tagged = _with_might_literal(
        probe_set, bloom_position_exprs("fp", 1 << 13, 4), words
    )
    fp_hits = tagged.filter(F.col("__might")).count()
    assert fp_hits <= 10  # ~(1 - e^-kn/m)^k << 5% here


# ---------------------------------------------------------------------------
# TF-IDF keywords
# ---------------------------------------------------------------------------


def test_tfidf_closed_form(spark):
    docs = _docs(
        spark,
        [
            (1, "s1", "apple apple banana"),
            (2, "s1", "banana cherry"),
            (3, "s2", "cherry cherry cherry"),
        ],
    )
    out = {
        (r["source"], r["term"]): r
        for r in tfidf_top_terms(docs, "text", "doc_id", "source", top_k=10).collect()
    }
    # N=3 docs; df(apple)=1, df(banana)=2, df(cherry)=2
    assert out[("s1", "apple")]["tf"] == 2
    assert out[("s1", "apple")]["df"] == 1
    assert out[("s1", "apple")]["tfidf"] == round(2 * math.log(4 / 2), 4)
    assert out[("s2", "cherry")]["tfidf"] == round(3 * math.log(4 / 3), 4)


def test_tfidf_rank_tiebreak_on_term(spark):
    docs = _docs(spark, [(1, "s", "zz aa")])  # identical tf/df → tie
    rows = tfidf_top_terms(docs, "text", "doc_id", "source", top_k=2).collect()
    ranked = sorted(rows, key=lambda r: r["term_rank"])
    assert [r["term"] for r in ranked] == ["aa", "zz"]


def test_tfidf_top_k_bound(spark):
    docs = _docs(spark, [(1, "s", " ".join(f"t{i}" for i in range(20)))])
    out = tfidf_top_terms(docs, "text", "doc_id", "source", top_k=5)
    assert out.count() == 5


# ---------------------------------------------------------------------------
# DSIR importance weights
# ---------------------------------------------------------------------------


def _py_bucket(bigram: str, B: int = 1024) -> int:
    return int(hashlib.md5(bigram.encode()).hexdigest()[:8], 16) % B


def test_dsir_closed_form(spark):
    docs = spark.createDataFrame(
        [(1, True, "good clean text"), (2, False, "bad noisy text")],
        "doc_id bigint, tgt boolean, text string",
    )
    out = {
        r["doc_id"]: r
        for r in dsir_importance_weights(docs, "text", "doc_id", "tgt").collect()
    }
    feats = {
        1: ["good clean", "clean text"],
        2: ["bad noisy", "noisy text"],
    }
    counts_raw: dict[int, int] = {}
    counts_tgt: dict[int, int] = {}
    for d, fs in feats.items():
        for f_ in fs:
            b = _py_bucket(f_)
            counts_raw[b] = counts_raw.get(b, 0) + 1
            if d == 1:
                counts_tgt[b] = counts_tgt.get(b, 0) + 1
    n_raw, n_tgt = 4, 2
    for d in (1, 2):
        lrs = [
            math.log2((counts_tgt.get(_py_bucket(f_), 0) + 1) / (n_tgt + 1024))
            - math.log2((counts_raw[_py_bucket(f_)] + 1) / (n_raw + 1024))
            for f_ in feats[d]
        ]
        assert out[d]["n_feats"] == 2
        assert abs(out[d]["dsir_score"] - round(sum(lrs) / len(lrs), 4)) <= 1e-4
    # target docs score above background docs
    assert out[1]["dsir_score"] > out[2]["dsir_score"]


def test_dsir_uniform_target_scores_zero(spark):
    docs = spark.createDataFrame(
        [(1, True, "a b c"), (2, True, "d e f")],
        "doc_id bigint, tgt boolean, text string",
    )
    rows = dsir_importance_weights(docs, "text", "doc_id", "tgt").collect()
    assert rows and all(r["dsir_score"] == 0.0 for r in rows)


def test_dsir_short_docs_excluded(spark):
    docs = spark.createDataFrame(
        [(1, True, "only"), (2, True, ""), (3, False, "two tokens")],
        "doc_id bigint, tgt boolean, text string",
    )
    out = dsir_importance_weights(docs, "text", "doc_id", "tgt")
    assert [r["doc_id"] for r in out.collect()] == [3]
