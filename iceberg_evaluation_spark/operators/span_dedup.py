"""Exact substring-span dedup metrics — the token-window analogue of
"Deduplicating Training Data Makes Language Models Better" (Lee et al.,
2021): find spans of >= k consecutive tokens that occur verbatim in more
than one document and measure, per document, how much of it is covered
by such cross-document spans.

A suffix array (the paper's structure) is a single-machine construct;
the scale-correct Spark expression of the same semantics is a hashed
k-token window inventory: every document contributes its n_tokens-k+1
sliding windows, a window hash occurring in >= 2 distinct documents is a
duplicated span seed, and the per-document covered-token count is the
length of the union of the (pos, pos+k) intervals of its duplicated
windows — a gaps-and-islands union done with one window function.
Maximal duplicated spans of length L >= k appear as L-k+1 consecutive
duplicated windows whose interval union is exactly the span, so the
covered-token measure is identical to the suffix-array formulation for
spans with >= k tokens.

Cost shape at 100 TB: one explode (corpus token count × 1 rows), one
hash aggregate keyed by window hash (map-side combinable), one semi
join back on the same key, and one per-document window + aggregate —
all linear in corpus size, no all-pairs stage anywhere. Reference
parity note: the reference has no substring-dedup operator; this is
part of the beyond-the-reference training-data surface (SURVEY.md §6).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.text import normalize_ws
from .text_ops import _fan_out

__all__ = ["duplicated_span_metrics"]


def duplicated_span_metrics(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 8,
) -> DataFrame:
    """Per-document cross-document duplicated-span coverage.

    Returns one row per input document:
    ``(id, n_tokens, n_windows, n_dup_windows, dup_tokens, dup_ratio)``
    where ``dup_tokens`` is the exact number of token positions covered
    by at least one k-token window that also occurs verbatim in a
    DIFFERENT document, and ``dup_ratio = dup_tokens / n_tokens``.
    Documents shorter than ``k`` tokens contribute no windows (they are
    covered by the whole-document exact-dedup operator instead).
    """
    # STAGED token array: the window lambda references it m times; inlining
    # the regex+split would re-run it per window position (the HOF trap).
    staged = _fan_out(df).select(
        F.col(id_col), F.split(normalize_ws(text_col), " ").alias("_toks")
    )
    staged = staged.select(
        id_col,
        "_toks",
        F.when(
            (F.size("_toks") == 1) & (F.element_at("_toks", 1) == ""), F.lit(0)
        )
        .otherwise(F.size("_toks"))
        .alias("n_tokens"),
    )
    m = F.greatest(F.col("n_tokens") - F.lit(k) + 1, F.lit(0))
    windows = F.when(
        m > 0,
        F.transform(
            F.sequence(F.lit(0), m - 1),
            lambda i: F.md5(F.concat_ws(" ", F.slice("_toks", i + 1, k))),
        ),
    ).otherwise(F.array().cast("array<string>"))
    docs = staged.select(id_col, "n_tokens", m.alias("n_windows"), windows.alias("_ws"))
    # Materialize ONCE (lazy lineage-truncating checkpoint): `docs` feeds
    # two consumers (the posexplode dup-detection path and the final
    # metrics join), so the tokenize + per-window md5 pipeline otherwise
    # appears as two independent plan subtrees — and because a bare
    # repartition is no optimizer barrier, each copy ran at the SCAN's
    # parallelism (measured at sf0.1: two 3.5 s single-task stages on a
    # 32-core box). The window inventory is the operator's own working
    # set (it is exploded and shuffled next), so storing it once costs
    # less than recomputing it per consumer at any scale.
    docs = docs.localCheckpoint(eager=False)

    wins = docs.select(
        F.col(id_col), F.posexplode("_ws").alias("pos", "h")
    )
    # A window hash seen in >= 2 DISTINCT documents marks a cross-doc span.
    # min!=max is a one-pass distinct->=2 test (no count(DISTINCT) shuffle).
    dup_h = (
        wins.groupBy("h")
        .agg(F.min(id_col).alias("_lo"), F.max(id_col).alias("_hi"))
        .filter(F.col("_lo") != F.col("_hi"))
        .select("h")
    )
    dup_wins = wins.join(dup_h, "h", "left_semi")

    # Gaps-and-islands union of [pos, pos+k) intervals per document: each
    # window contributes the part of its interval past the running max end
    # of all earlier windows. One shuffle (partition by doc), and the
    # following per-doc aggregate reuses the same partitioning.
    prev_end = F.max(F.col("pos") + k).over(
        Window.partitionBy(id_col)
        .orderBy("pos")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    contrib = F.greatest(
        F.lit(0),
        F.col("pos") + k - F.greatest(F.col("pos"), F.coalesce(prev_end, F.col("pos"))),
    )
    cov = (
        dup_wins.select(id_col, contrib.alias("_c"))
        .groupBy(id_col)
        .agg(
            F.sum("_c").alias("dup_tokens"),
            F.count(F.lit(1)).alias("n_dup_windows"),
        )
    )
    return (
        docs.select(id_col, "n_tokens", "n_windows")
        .join(cov, id_col, "left")
        .select(
            id_col,
            "n_tokens",
            F.col("n_windows").cast("bigint").alias("n_windows"),
            F.coalesce("n_dup_windows", F.lit(0)).cast("bigint").alias("n_dup_windows"),
            F.coalesce("dup_tokens", F.lit(0)).cast("bigint").alias("dup_tokens"),
            F.round(
                F.when(
                    F.col("n_tokens") > 0,
                    F.coalesce("dup_tokens", F.lit(0)).cast("double")
                    / F.col("n_tokens"),
                ).otherwise(F.lit(0.0)),
                4,
            ).alias("dup_ratio"),
        )
    )
