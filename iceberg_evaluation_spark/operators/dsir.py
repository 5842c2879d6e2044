"""DSIR-style data selection: hashed-n-gram importance weights.

Data Selection with Importance Resampling (Xie et al., 2023, public):
score each raw document by how much more likely its features are under
a TARGET distribution (a trusted/high-quality subset) than under the
RAW background distribution.  Features are hashed bigrams — a fixed
``num_buckets``-dimensional multinomial, so both "models" are just two
count vectors and the per-document score is a sum of per-feature log
ratios.

Engine shape (all built-ins, no Python):

1. one explode of the staged token array into bigram features (the same
   linear cost class as the corpus's shingling stages);
2. bucket each feature with the corpus-standard portable hash
   ``conv(substr(md5(f), 1, 8), 16, 10) % B`` — identical in DuckDB, so
   the oracle replays the whole pipeline;
3. one hash aggregation over buckets fits BOTH models at once
   (``count(*)`` raw, conditional count target) — B rows, broadcast
   back onto the features;
4. one per-document aggregation averages the add-one-smoothed log2
   ratios.

At 100 TB: the model is B rows regardless of corpus size (broadcast),
the explodes are linear and partial-aggregated map-side, and the only
shuffles are the two hash aggs — the same budget as quality scoring.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.keys import md5_bucket
from ..functions.text import normalize_ws

__all__ = ["dsir_importance_weights"]


def dsir_importance_weights(
    docs: DataFrame,
    text_col: str,
    id_col: str,
    target_col: str,
    num_buckets: int = 1024,
) -> DataFrame:
    """Per-document importance weight of target vs. background distribution.

    ``target_col`` is a boolean column marking the trusted subset.
    Returns ``(id_col, n_feats, dsir_score)`` for every document with at
    least one bigram feature; ``dsir_score`` is the mean over the doc's
    features (with multiplicity) of
    ``log2(p_target(bucket) / p_raw(bucket))`` with add-one smoothing,
    rounded to 4 decimals.
    """
    toks = docs.select(
        F.col(id_col),
        F.col(target_col).alias("__target"),
        F.split(normalize_ws(text_col), " ").alias("__t"),
    ).filter(F.size("__t") >= 2)

    feats = toks.select(
        F.col(id_col),
        "__target",
        F.explode(
            F.expr("transform(sequence(0, size(__t) - 2), i -> concat(__t[i], ' ', __t[i + 1]))")
        ).alias("__f"),
    ).select(
        F.col(id_col),
        "__target",
        md5_bucket("__f", num_buckets).cast("int").alias("bucket"),
    )

    # ONE pass over the exploded features: the per-(doc, bucket) count
    # frame feeds BOTH the model fit and the scoring join, and its
    # exchange is identical in the two branches — Spark plans a
    # ReusedExchange, so the bigram explode + md5 run once, not twice
    doc_bucket = feats.groupBy(id_col, "__target", "bucket").agg(
        F.count(F.lit(1)).alias("__c")
    )
    counts = doc_bucket.groupBy("bucket").agg(
        F.sum("__c").alias("c_raw"),
        F.sum(F.when(F.col("__target"), F.col("__c")).otherwise(0)).alias("c_tgt"),
    )
    totals = counts.agg(
        F.sum("c_raw").alias("n_raw"), F.sum("c_tgt").alias("n_tgt")
    )
    model = counts.crossJoin(F.broadcast(totals)).select(
        "bucket",
        (
            F.log2((F.col("c_tgt") + 1) / (F.col("n_tgt") + num_buckets))
            - F.log2((F.col("c_raw") + 1) / (F.col("n_raw") + num_buckets))
        ).alias("__lr"),
    )

    # per-occurrence mean as a weighted mean over the bucket counts —
    # identical up to FP associativity, absorbed by the round(4)
    return (
        doc_bucket.join(F.broadcast(model), "bucket")
        .groupBy(id_col)
        .agg(
            F.sum("__c").cast("bigint").alias("n_feats"),
            F.round(F.sum(F.col("__c") * F.col("__lr")) / F.sum("__c"), 4).alias(
                "dsir_score"
            ),
        )
    )
