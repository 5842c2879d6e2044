"""Budget-constrained corpus selection — assemble a training set of at
most B tokens by (1) giving every source a token quota from its
temperature-smoothed mixture weight and (2) filling each quota with that
source's best documents first (quality-descending, id tiebreak) via a
running token sum.

This is the "data selection under budget" step that closes the mixture
family: q95's weights say WHAT SHARE each source deserves, this operator
decides WHICH documents realize that share. Everything is deterministic
(integer token counts, one sqrt, one floor), so the whole pipeline has
an exact SQL twin.

Scale shape: the quota table is |sources| rows (broadcast); the ranking
+ running sum is ONE hash exchange on the group key shared by the window
pair; the quality column arrives precomputed (any scoring operator —
text_quality, unigram_lm_score — composes upstream). A hot source
serializes its ordered scan onto one task, the inherent cost of an exact
prefix-sum cutoff; ``shards > 1`` is the 100 TB path for that case —
deterministic md5 sub-groups with per-shard token quotas, same design as
``stratified_exact_sample`` (operators/sampling.py), still one exchange.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .mixture import temperature_mixture_weights

__all__ = ["budget_constrained_selection"]


def budget_constrained_selection(
    df: DataFrame,
    *,
    budget_frac_permille: int = 500,
    group_col: str = "source",
    token_col: str = "n_tokens",
    quality_col: str = "quality_score",
    id_col: str = "doc_id",
    shards: int = 1,
) -> DataFrame:
    """Keep each group's quality-best prefix whose token sum fits its quota.

    ``quota(g) = floor(p_temp(g) * floor(total_tokens * budget_frac / 1000))``
    with ``p_temp`` from :func:`temperature_mixture_weights` (alpha = 0.5).
    A document is kept iff its running token sum (quality desc, id asc
    within the group) stays within the quota — so a single over-long
    document cannot blow the budget, and the kept set is a deterministic
    function of the corpus.

    Output: ``id, group, token, quality`` columns of the kept rows plus
    ``cum_tokens`` (the running sum including the row) and ``quota``.

    One hot group serializes its ordered prefix scan onto one task (the
    window partitions by group). ``shards > 1`` is the scale path: each
    group is pre-split into ``shards`` deterministic md5 sub-groups, the
    group quota is split ``quota div shards`` per shard, and each shard
    keeps its own quality-best prefix. Because shard quotas round DOWN,
    the budget cap still holds EXACTLY (sum of shard prefixes ≤ quota —
    a budget may round up, a hard token ceiling may not, the opposite
    trade from ``stratified_exact_sample``'s per-shard ceil). The kept
    set is per-shard-best rather than globally-best — with hash-random
    shard assignment the quality profile converges to the global prefix —
    and ``cum_tokens``/``quota`` then describe the sub-group. The window
    pair still plans as ONE exchange (pinned by tests/test_pipeline_ops).
    """
    if not 0 <= budget_frac_permille <= 1000:
        raise ValueError("budget_frac_permille must be in [0, 1000]")
    if shards < 1:
        raise ValueError("shards must be >= 1")
    sizes = df.groupBy(group_col).agg(
        F.sum(token_col).cast("bigint").alias("_gtok")
    )
    weights = temperature_mixture_weights(
        sizes, group_col=group_col, size_col="_gtok"
    )
    total = sizes.agg(
        F.expr(f"sum(_gtok) * {budget_frac_permille}L div 1000L").alias("_budget")
    )
    quotas = (
        weights.crossJoin(F.broadcast(total))
        .select(
            group_col,
            F.floor(F.col("p_temp") * F.col("_budget")).cast("bigint").alias("quota"),
        )
    )
    keys: list = [group_col]
    work = df
    if shards > 1:
        shard = (
            F.conv(
                F.substring(
                    F.md5(
                        F.concat_ws(
                            ":", F.col(id_col).cast("string"), F.lit("budget#shard")
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
    w = Window.partitionBy(*keys).orderBy(
        F.desc(quality_col), F.asc(id_col)
    ).rowsBetween(Window.unboundedPreceding, Window.currentRow)
    ranked = work.select(
        id_col,
        group_col,
        *(["_shard"] if shards > 1 else []),
        token_col,
        quality_col,
        F.sum(token_col).over(w).cast("bigint").alias("cum_tokens"),
    )
    out = ranked.join(F.broadcast(quotas), group_col)
    if shards > 1:
        # floor split: Σ shard prefixes ≤ shards·(quota div shards) ≤ quota
        out = out.withColumn("quota", F.expr(f"quota div {shards}L"))
    return out.filter(F.col("cum_tokens") <= F.col("quota")).select(
        id_col, group_col, token_col, quality_col, "cum_tokens", "quota"
    )
