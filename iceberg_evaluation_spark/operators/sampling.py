"""Stratified exact-quota sampling — deterministic per-stratum subsets.

Bernoulli-style hashing (q63's split/mixture idiom) gives each stratum a
binomially-noisy sample size; eval-set construction and audit sampling
need EXACT quotas: ceil(frac * n) rows from every stratum, no more, no
less, stable across runs and engines. The selection order inside a
stratum is an md5 hash of the row id (salted, so a new salt draws an
independent sample) with the id as tiebreak — a deterministic random
permutation, which makes the quota sample an exact simple random sample
per stratum in the hash-randomness model (the distributed equivalent of
reservoir sampling, without the sequential reservoir).

Scale shape: ONE shuffle (hash-partition by strata), then two window
functions over the same partitioning (count + row_number) — Spark plans
them in a single Window exchange. No driver state, no RNG.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["stratified_exact_sample"]


def stratified_exact_sample(
    df: DataFrame,
    strata: Sequence[str],
    *,
    frac_permille: int = 200,
    id_col: str = "doc_id",
    salt: str = "strat",
    shards: int = 1,
) -> DataFrame:
    """Exactly ``ceil(n * frac_permille / 1000)`` rows per stratum.

    Output: the input columns plus ``sample_rank`` (1-based position in
    the stratum's hash order) and ``stratum_n`` (the stratum's input
    size, so downstream weighting can invert the sampling fraction).
    Quota arithmetic is pure integers — ``(n * frac + 999) div 1000`` —
    to keep ceil() off doubles.

    One hot stratum serializes onto one task (window functions partition
    by stratum). ``shards`` > 1 is the scale path for that case: each
    stratum is pre-split into ``shards`` deterministic md5 sub-strata
    and the quota is taken per sub-stratum. The sample stays an exact
    simple random sample per sub-stratum; the total kept per stratum is
    between the parent ceil quota and quota + shards - 1 (each shard
    rounds up independently) — the documented trade for never putting a
    whole hot stratum through one task. ``sample_rank``/``stratum_n``
    then describe the sub-stratum, so the fraction is still invertible.
    """
    if not 0 <= frac_permille <= 1000:
        raise ValueError("frac_permille must be in [0, 1000]")
    if shards < 1:
        raise ValueError("shards must be >= 1")
    order = F.md5(F.concat_ws(":", F.col(id_col).cast("string"), F.lit(salt)))
    keys: list = list(strata)
    work = df
    if shards > 1:
        shard = (
            F.conv(
                F.substring(
                    F.md5(
                        F.concat_ws(
                            ":", F.col(id_col).cast("string"), F.lit(salt + "#shard")
                        )
                    ),
                    1,
                    6,
                ),
                16,
                10,
            ).cast("bigint")
            % shards
        )
        work = df.withColumn("_shard", shard)
        keys = keys + ["_shard"]
    w = Window.partitionBy(*keys).orderBy(order.asc(), F.col(id_col).asc())
    wn = Window.partitionBy(*keys)
    ranked = work.select(
        *work.columns,
        F.row_number().over(w).alias("sample_rank"),
        F.count(F.lit(1)).over(wn).alias("stratum_n"),
    )
    # integer `div` end-to-end: a double intermediate would lose exactness
    # past 2^53, i.e. on precisely the corpus sizes this is designed for
    quota = F.expr(f"(stratum_n * {frac_permille}L + 999L) div 1000L")
    return ranked.filter(F.col("sample_rank") <= quota).select(
        *df.columns,
        F.col("sample_rank").cast("bigint").alias("sample_rank"),
        F.col("stratum_n").cast("bigint").alias("stratum_n"),
    )
