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
prefix-sum cutoff; at 100 TB shard hot sources into sub-groups with
per-shard quotas (same trade as stratified_exact_sample documents).
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
    """
    if not 0 <= budget_frac_permille <= 1000:
        raise ValueError("budget_frac_permille must be in [0, 1000]")
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
    w = Window.partitionBy(group_col).orderBy(
        F.desc(quality_col), F.asc(id_col)
    ).rowsBetween(Window.unboundedPreceding, Window.currentRow)
    ranked = df.select(
        id_col,
        group_col,
        token_col,
        quality_col,
        F.sum(token_col).over(w).cast("bigint").alias("cum_tokens"),
    )
    return ranked.join(F.broadcast(quotas), group_col).filter(
        F.col("cum_tokens") <= F.col("quota")
    ).select(id_col, group_col, token_col, quality_col, "cum_tokens", "quota")
