"""Weighted mixture resampling — epoch construction for pretraining.

Given a per-row sampling weight (per-mille, so 2300 = 2.3×), emit
``floor(w)`` copies of every row plus one more with probability
``frac(w)`` — the standard way a data mixture upsamples high-quality
sources and downsamples bulk ones when materializing a training epoch
(w < 1000 is a pure downsample, q63's case; w > 1000 upsamples).

Determinism contract: the fractional coin is an md5 bucket of
``(id, epoch)`` — no RNG, identical across engines and runs, and a new
``epoch`` value re-rolls every coin without correlation to the previous
epoch. The copy fan-out is ``explode(sequence(...))`` — narrow, codegen,
no shuffle; downstream writers see ``copy_idx`` to disambiguate
duplicates (e.g. for pack-level shuffling).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["mixture_resample", "leakage_safe_split", "temperature_mixture_weights"]


def mixture_resample(
    df: DataFrame,
    weight_permille: Column,
    *,
    id_col: str = "doc_id",
    epoch: int = 1,
) -> DataFrame:
    """All input columns + ``copy_idx`` (1..n_copies per row).

    ``n_copies = weight_permille // 1000 + (bucket < weight_permille % 1000)``
    where ``bucket = int(md5(id || ':' || epoch)[:6], 16) % 1000``.
    Rows with ``n_copies = 0`` are dropped (pure downsample region).
    Integer per-mille weights avoid float-boundary drift between
    engines (2.3 reads as 2299.999…·1e-3 in binary).
    """
    bucket = (
        F.conv(
            F.substring(
                F.md5(F.concat_ws(":", F.col(id_col).cast("string"), F.lit(str(epoch)))),
                1,
                6,
            ),
            16,
            10,
        ).cast("bigint")
        % 1000
    )
    n = F.floor(weight_permille / F.lit(1000)).cast("bigint") + F.when(
        bucket < weight_permille.cast("bigint") % 1000, 1
    ).otherwise(0)
    return (
        df.withColumn("__n", n)
        .filter(F.col("__n") > 0)
        .withColumn("copy_idx", F.explode(F.sequence(F.lit(1), F.col("__n"))))
        .drop("__n")
    )


def leakage_safe_split(
    clusters: DataFrame,
    *,
    cluster_col: str = "cluster",
    train_permille: int = 800,
    val_permille: int = 100,
    salt: str = "split",
) -> DataFrame:
    """Assign every row a train/val/test split by its duplicate CLUSTER.

    ``clusters`` is a precomputed cluster assignment (e.g. the output of
    ``operators.cluster.connected_components`` over near-dup edges) —
    this operator deliberately does NOT build the near-dup graph itself:
    at scale the graph is the expensive artifact, built once per corpus
    and consumed by dedup, clustering, AND splitting (the reference
    benches the same one-run-many-reads shape,
    ``src/benchmarking/benchmark_functions.py``).

    All members of a cluster land in the same split (no train/eval
    leakage through near-duplicates). The assignment is a deterministic
    md5 bucket of the cluster id — no RNG, engine-portable, and a new
    ``salt`` re-rolls the assignment independently.
    """
    if train_permille + val_permille > 1000:
        raise ValueError("train_permille + val_permille must be <= 1000")
    bucket = (
        F.conv(
            F.substring(
                F.md5(
                    F.concat(F.col(cluster_col).cast("string"), F.lit(":" + salt))
                ),
                1,
                6,
            ),
            16,
            10,
        ).cast("bigint")
        % 1000
    )
    split = (
        F.when(bucket < train_permille, "train")
        .when(bucket < train_permille + val_permille, "val")
        .otherwise("test")
    )
    return clusters.withColumn("split", split)

def temperature_mixture_weights(
    sizes: DataFrame,
    *,
    group_col: str = "source",
    size_col: str = "n_tokens",
) -> DataFrame:
    """Temperature-smoothed sampling weights per source (alpha = 0.5).

    The standard multilingual/multi-source mixture design (mBERT, XLM-R,
    PaLM data cards): raw proportions ``p_raw = n_i / N`` are flattened
    to ``p_temp = n_i^alpha / sum_j n_j^alpha`` so small sources are
    upsampled relative to bulk ones. ``alpha`` is fixed at 0.5 because
    ``sqrt`` is IEEE-exact in every engine (an arbitrary ``pow(x, a)``
    can differ in the last ulp across libm implementations, which would
    poison a cross-engine hash check); 0.5 is also squarely inside the
    range production recipes use (0.3-0.7).

    Emits per group: the input size, ``p_raw``, ``p_temp`` (each rounded
    to 6 dp) and ``boost = p_temp / p_raw`` (4 dp) — the factor by which
    temperature sampling over/under-represents the source relative to
    its natural share. Scale shape: one aggregate to a groups-count-sized
    frame, scalars via a 1-row broadcast cross join; nothing here touches
    row-level data, so this runs on the OUTPUT of a per-source count, not
    the corpus.
    """
    tot = sizes.agg(
        F.sum(size_col).cast("double").alias("_tn"),
        F.sum(F.sqrt(F.col(size_col).cast("double"))).alias("_ta"),
    )
    p_raw = F.col(size_col).cast("double") / F.col("_tn")
    p_temp = F.sqrt(F.col(size_col).cast("double")) / F.col("_ta")
    return (
        sizes.crossJoin(F.broadcast(tot))
        .select(
            *sizes.columns,
            F.round(p_raw, 6).alias("p_raw"),
            F.round(p_temp, 6).alias("p_temp"),
            F.round(p_temp / p_raw, 4).alias("boost"),
        )
    )
