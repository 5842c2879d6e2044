"""Deterministic epoch shuffling into training shards.

The last step of a training-data pipeline: assign every document to a
shard and give it a position inside the shard, such that (a) the order
is a deterministic pseudo-random permutation — reproducible across
reruns, engines, and cluster sizes, (b) each epoch draws an INDEPENDENT
permutation (epoch salt), and (c) shard sizes are balanced in
expectation. Downstream trainers read shard files sequentially; the
md5-derived order is the distributed equivalent of a seeded
Fisher–Yates shuffle in the hash-randomness model.

Scale shape: ONE hash exchange on the shard key; the per-shard ordering
rides a single window over that exchange. No driver state, no RNG, no
skew (md5 uniformity bounds shard imbalance by Chernoff at any corpus
size). Writing the result partitioned by ``shard`` gives exactly the
file-per-shard layout trainers want.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["epoch_shard_shuffle"]


def epoch_shard_shuffle(
    df: DataFrame,
    *,
    n_shards: int,
    epoch: int,
    id_col: str = "doc_id",
) -> DataFrame:
    """Input columns + ``shard`` (0..n_shards-1) + ``pos`` (1-based).

    shard = first-48-bits-of-md5(id:epoch) mod n_shards; pos orders the
    shard by a SECOND salted hash (the within-shard permutation must be
    independent of the shard draw, or low hashes would cluster early in
    every shard), with the id as the final tiebreak so exact-duplicate
    hashes cannot make the order engine-dependent.
    """
    if n_shards < 1:
        raise ValueError("n_shards must be >= 1")
    if epoch < 0:
        raise ValueError("epoch must be >= 0")
    sid = F.col(id_col).cast("string")
    shard = (
        F.conv(
            F.substring(F.md5(F.concat_ws(":", sid, F.lit(f"shard#{epoch}"))), 1, 12),
            16,
            10,
        ).cast("bigint")
        % n_shards
    )
    order = F.md5(F.concat_ws(":", sid, F.lit(f"pos#{epoch}")))
    w = Window.partitionBy("shard").orderBy(F.asc("_ord"), F.asc(id_col))
    return (
        df.withColumn("shard", shard.cast("int"))
        .withColumn("_ord", order)
        .withColumn("pos", F.row_number().over(w).cast("bigint"))
        .drop("_ord")
    )
