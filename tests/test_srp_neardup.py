"""srp_neardup_pairs: deterministic SRP-LSH blocking — planted-copy recall
is exact by construction; near-identical (noised) copies are found at the
banding guarantee; verification filters below-threshold candidates."""

from __future__ import annotations

import numpy as np
import pytest

from iceberg_evaluation_spark.operators.similarity import srp_neardup_pairs


@pytest.fixture(scope="module")
def noised(spark):
    rng = np.random.RandomState(0)
    base = rng.randn(60, 64).astype("float32")
    base /= np.linalg.norm(base, axis=1, keepdims=True)
    noise = rng.randn(60, 64).astype("float32") * 0.01  # ~0.8 deg angle
    rows = [(i, base[i].tolist()) for i in range(60)] + [
        (1000 + i, (base[i] + noise[i]).tolist()) for i in range(60)
    ]
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


def test_noised_copy_recall_and_precision(spark, noised):
    got = {
        (r["id_a"], r["id_b"]): r["cosine_sim"]
        for r in srp_neardup_pairs(noised, threshold=0.95).collect()
    }
    found = sum(1 for i in range(60) if (i, 1000 + i) in got)
    # banding guarantee at ~0.8deg: miss prob per pair ~ (1-(1-θ/π)^16)^4 ≈ 5e-4
    assert found >= 58, f"only {found}/60 noised copies found"
    assert all(v >= 0.95 for v in got.values())
    # organic random 64-dim pairs are far below 0.95 — none may appear
    organic = [p for p in got if not (p[0] < 1000 <= p[1] and p[1] - 1000 == p[0])]
    assert organic == []


def test_exact_copy_recall_is_total(spark, noised):
    exact = noised.selectExpr("vec_id + 5000 AS vec_id", "embedding")
    both = noised.unionByName(exact)
    got = {
        (r["id_a"], r["id_b"])
        for r in srp_neardup_pairs(both, threshold=0.999).collect()
    }
    missing = [i for i in [r[0] for r in noised.select("vec_id").collect()]
               if (i, i + 5000) not in got]
    assert missing == []


def test_ivf_kmeans_recall_vs_exact(spark, sf_correct):
    """IVF with k-means-refined centroids must reach recall@5 >= 0.8
    against the exact brute-force top-k on the real embeddings table."""
    from pyspark.sql import functions as F

    from iceberg_evaluation_spark.operators.similarity import (
        cosine_topk,
        ivf_cosine_topk,
    )
    from iceberg_evaluation_spark.sources import load_table

    emb = load_table(spark, sf_correct, "embeddings")
    queries = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    exact = {
        (r["query_id"], r["vec_id"])
        for r in cosine_topk(emb, queries, k=5).collect()
    }
    approx = {
        (r["query_id"], r["vec_id"])
        for r in ivf_cosine_topk(
            emb, queries, k=5, n_cells=16, nprobe=4, kmeans_iters=2
        ).collect()
    }
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.8, f"recall@5 = {recall}"
