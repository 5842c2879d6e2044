"""Curriculum export: a GLOBAL ordering of the corpus by a difficulty /
quality score, materialized as range shards ready for sequential
training consumption (curriculum learning, Bengio et al. 2009 —
easy-to-hard ordering at corpus scale).

A naive global ``orderBy(...).write`` funnels 100 TB through a total
sort whose output files a trainer then has to consume in filename
order anyway. The engine shape that scales is Spark's own range
machinery:

- ``repartitionByRange(n_shards, score, id)`` samples the score
  distribution (driver-side reservoir over a bounded sample — NOT a
  full pass), computes ``n_shards - 1`` range boundaries, and shuffles
  each row once to its shard. Shard k holds a contiguous score range;
  shard boundaries are the curriculum's stages.
- ``sortWithinPartitions(score, id)`` orders rows inside each shard at
  shuffle-read time (no extra exchange — Spark fuses the sort into the
  same stage), so a trainer streaming shard 0, 1, 2, … reads the
  corpus in nondecreasing difficulty with exactly ONE wide shuffle.

The (score, id) composite makes the order TOTAL — ties on score are
broken by id, so the export is byte-reproducible for a fixed corpus.

Because range boundaries come from sampling, per-shard SIZES are not a
deterministic function of the data (Spark may also use fewer shards
than requested when the sample finds few distinct keys). What IS
guaranteed — and what :func:`curriculum_invariants` checks relationally
— is the curriculum contract itself: no row lost or duplicated, the
score mass preserved, at most ``n_shards`` shards, and every shard's
(score, id) interval strictly below the next shard's (zero boundary
violations). A broken RangePartitioner, a lossy shuffle, or a
non-contiguous assignment all fail the invariants.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["curriculum_shards", "curriculum_invariants"]


def curriculum_shards(
    docs: DataFrame, score_col: str, id_col: str, n_shards: int
) -> DataFrame:
    """Assign every row to a range shard of the global (score, id) order.

    Returns the input columns plus ``shard`` (int). One wide shuffle;
    the within-shard sort rides the shuffle read for free."""
    return (
        docs.repartitionByRange(n_shards, F.col(score_col), F.col(id_col))
        .sortWithinPartitions(score_col, id_col)
        .withColumn("shard", F.spark_partition_id())
    )


def curriculum_invariants(
    sharded: DataFrame, score_col: str, id_col: str, n_shards: int
) -> DataFrame:
    """One-row frame pinning the curriculum contract (see module doc).

    ``boundary_violations`` counts adjacent shard pairs whose (score,
    id) intervals overlap — 0 for a correct range partitioning; the
    lexicographic comparison is expressed on a struct so it matches the
    partitioner's composite ordering exactly."""
    per_shard = sharded.groupBy("shard").agg(
        F.count(F.lit(1)).alias("rows"),
        F.min(F.struct(score_col, id_col)).alias("lo"),
        F.max(F.struct(score_col, id_col)).alias("hi"),
        F.sum(score_col).alias("score_sum"),
    )
    w = Window.orderBy("shard")
    checked = per_shard.withColumn("prev_hi", F.lag("hi").over(w))
    # coalesce(…, 0): aggregates over ZERO per-shard rows yield NULL —
    # an empty (fully filtered) corpus must produce the well-defined
    # 0/0/true/0 row, not NULLs a downstream gate would misread
    return checked.agg(
        F.coalesce(F.sum("rows"), F.lit(0)).cast("bigint").alias("total_rows"),
        F.coalesce(F.sum("score_sum"), F.lit(0)).cast("bigint").alias("sum_score"),
        (F.count(F.lit(1)) <= n_shards).alias("shards_within_bound"),
        F.coalesce(
            F.sum(
                F.when(
                    F.col("prev_hi").isNotNull() & (F.col("lo") <= F.col("prev_hi")),
                    1,
                ).otherwise(0)
            ),
            F.lit(0),
        )
        .cast("bigint")
        .alias("boundary_violations"),
    )
