"""fastText-style linear text-classifier INFERENCE at corpus scale.

The reference pipelines gate documents on model quality scores the way
CCNet/fastText-based curation does (public: Joulin et al. 2016,
Wenzek et al. 2019): a linear model over hashed bag-of-words(+bigram)
features, a sigmoid, and a keep/drop threshold. Training happens
offline; the ENGINE's job is the inference sweep over the corpus, and
that is pure DataFrame algebra — no Python in the hot path:

1. one explode of the staged token array into unigram + bigram
   features (same linear cost class as shingling / DSIR);
2. bucket each feature with the corpus-standard portable hash
   ``conv(substr(md5(f), 1, 8), 16, 10) % B`` (md5_bucket — identical
   in DuckDB, so the oracle replays the whole pipeline);
3. one hash aggregation to per-(doc, bucket) counts, then a BROADCAST
   join against the B-row weight vector — the model is B rows no
   matter how big the corpus is;
4. one per-document aggregation: mean feature weight + bias → logit →
   sigmoid → threshold label. round(4) on the logit before the sigmoid
   and on the probability keeps both engines' float paths aligned (the
   q94/q100 discipline).

At 100 TB: explodes are linear and partial-aggregated map-side, the
model broadcast is B rows, and the only shuffles are the two hash aggs
— the same budget as DSIR scoring. No all-to-one step anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.keys import md5_bucket
from ..functions.text import normalize_ws

__all__ = ["demo_weight_vector", "hashed_classifier_scores", "validate_weights"]


def validate_weights(weights: DataFrame, num_buckets: int) -> None:
    """Assert ``weights`` holds exactly one row per bucket in
    ``[0, num_buckets)``. A duplicate bucket silently double-counts its
    features (inner-join fan-out inflates n_feats and the logit); a
    missing bucket silently drops them. One aggregate over the B-row
    model frame — call it once per loaded model version (the ingest
    loop pins the validated version, like the cached bloom words)."""
    from ..functions.scalar import scalar_first

    row = scalar_first(
        weights.agg(
            F.count(F.lit(1)).alias("n"),
            F.count_distinct(
                F.when(
                    (F.col("bucket") >= 0) & (F.col("bucket") < num_buckets),
                    F.col("bucket"),
                )
            ).alias("d"),
        )
    )
    if row["n"] != num_buckets or row["d"] != num_buckets:
        raise ValueError(
            "hashed_classifier_scores: weights must hold exactly one row "
            f"per bucket in [0, {num_buckets}): got {row['n']} rows, "
            f"{row['d']} distinct in-range buckets. A duplicate bucket "
            "double-counts its features; a missing bucket drops them."
        )


def demo_weight_vector(
    spark: SparkSession, num_buckets: int, seed_tag: str = "w"
) -> DataFrame:
    """A deterministic stand-in for trained weights: B rows
    ``(bucket, wt)`` with ``wt = (md5-derived int in [-1000, 1000]) /
    1000``. In production this frame is ``spark.read.parquet`` of the
    training job's output; the ENGINE contract (B-row broadcast join)
    is identical, and a pseudo-random-but-portable vector lets the
    DuckDB oracle rebuild the exact same model from scratch."""
    return spark.range(num_buckets).select(
        F.col("id").cast("int").alias("bucket"),
        (
            (
                F.conv(
                    F.substring(
                        F.md5(F.concat(F.lit(seed_tag), F.col("id").cast("string"))),
                        1,
                        8,
                    ),
                    16,
                    10,
                ).cast("bigint")
                % 2001
                - 1000
            )
            / 1000.0
        ).alias("wt"),
    )


def hashed_classifier_scores(
    docs: DataFrame,
    text_col: str,
    id_col: str,
    weights: DataFrame,
    *,
    num_buckets: int = 1024,
    bias: float = -0.05,
    threshold: float = 0.5,
    check_weights: bool = True,
) -> DataFrame:
    """Score every document with a hashed linear classifier.

    ``weights`` is a ``(bucket int, wt double)`` frame with exactly one
    row per bucket in ``[0, num_buckets)`` (a trained model loaded from
    storage, or :func:`demo_weight_vector`). With ``check_weights``
    (default) that contract is ASSERTED up front — a duplicate bucket
    row would silently double-count (the inner-join fan-out inflates
    ``n_feats`` and the logit) and a missing bucket would silently drop
    its features; both now raise instead. The check is one aggregate
    over the B-row model frame (B rows regardless of corpus size, same
    cost class as the ``check_lookup`` guard in incremental dedup);
    pass ``check_weights=False`` only when the same validated model
    frame is reused across many calls. Returns
    ``(id_col, n_feats, logit, prob, label)``:

    - ``n_feats``: unigram + bigram feature occurrences;
    - ``logit = round(bias + mean feature weight, 4)``;
    - ``prob = round(sigmoid(logit), 4)`` (sigmoid of the ROUNDED
      logit, so both engines feed libm identical inputs);
    - ``label``: ``'keep'`` iff ``prob >= threshold``.
    """
    if check_weights:
        validate_weights(weights, num_buckets)

    toks = (
        docs.filter(normalize_ws(text_col) != "")  # no empty-string feature
        .select(
            F.col(id_col),
            F.split(normalize_ws(text_col), " ").alias("__t"),
        )
    )

    uni = toks.select(F.col(id_col), F.explode("__t").alias("__f"))
    bi = toks.filter(F.size("__t") >= 2).select(
        F.col(id_col),
        F.explode(
            F.expr(
                "transform(sequence(0, size(__t) - 2),"
                " i -> concat(__t[i], ' ', __t[i + 1]))"
            )
        ).alias("__f"),
    )
    feats = uni.unionByName(bi).select(
        F.col(id_col),
        md5_bucket("__f", num_buckets).cast("int").alias("bucket"),
    )

    # per-(doc, bucket) counts first: the broadcast-join then touches
    # at most min(n_feats, B) rows per doc instead of every occurrence,
    # and the count agg is map-side partial
    doc_bucket = feats.groupBy(id_col, "bucket").agg(
        F.count(F.lit(1)).alias("__c")
    )
    scored = (
        doc_bucket.join(F.broadcast(weights), "bucket")
        .groupBy(id_col)
        .agg(
            F.sum("__c").cast("bigint").alias("n_feats"),
            F.round(
                F.lit(bias) + F.sum(F.col("wt") * F.col("__c")) / F.sum("__c"), 4
            ).alias("logit"),
        )
    )
    return scored.select(
        F.col(id_col),
        "n_feats",
        "logit",
        F.round(F.lit(1.0) / (F.lit(1.0) + F.exp(-F.col("logit"))), 4).alias("prob"),
        F.when(
            F.round(F.lit(1.0) / (F.lit(1.0) + F.exp(-F.col("logit"))), 4)
            >= threshold,
            F.lit("keep"),
        )
        .otherwise(F.lit("drop"))
        .alias("label"),
    )
