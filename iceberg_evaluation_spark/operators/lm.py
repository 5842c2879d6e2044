"""Unigram language-model scoring — the cheap, fully-deterministic
stand-in for the KenLM-style perplexity filters that production
pretraining pipelines (CCNet, Gopher, RedPajama) run over every
candidate document.

The model is derived from the corpus itself: the top-``vocab_size``
tokens by frequency (ties broken by token text, so selection is a
total order) with add-one smoothing over an open vocabulary —
``p(t) = (c_t + 1) / (N + V + 1)`` for in-vocab tokens and
``p(oov) = 1 / (N + V + 1)``. Per document it emits the mean negative
log2 probability (bits/token), the OOV rate, and the perplexity.

Scale shape: token counting is one map-side-combinable hash aggregate;
the top-V selection is a distributed sort+limit (TakeOrderedAndProject,
NOT a single-partition global window); the model — V rows by contract —
then BROADCASTS to the scoring join, so scoring is one narrow pass plus
one per-document aggregate. The corpus is read twice (count pass +
score pass), the same shape as any fit/transform pipeline.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.text import normalize_ws
from .text_ops import _fan_out

__all__ = ["unigram_lm_score"]


def _tokens(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    staged = _fan_out(df).select(
        F.col(id_col), F.split(normalize_ws(text_col), " ").alias("_toks")
    )
    return staged.filter(
        ~((F.size("_toks") == 1) & (F.element_at("_toks", 1) == ""))
    ).select(id_col, F.explode("_toks").alias("token"))


def unigram_lm_score(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    vocab_size: int = 256,
) -> DataFrame:
    """Per-document ``(id, n_tokens, n_oov, oov_ratio, nll_bits, ppl)``.

    ``nll_bits`` is rounded to 4 dp before ``ppl = 2**nll_bits`` is
    derived from the ROUNDED value, so both columns are exactly
    reproducible from the integer count model (the only float step is
    one log2/pow pair over identical inputs in any engine).

    Empty documents (zero tokens after normalization) produce no token
    rows and are excluded — they carry no LM evidence; upstream quality
    filters drop them on length anyway.
    """
    toks = _tokens(df, text_col, id_col)
    counts = toks.groupBy("token").agg(F.count(F.lit(1)).alias("c"))
    # Distributed top-V: sort+limit fuses to TakeOrderedAndProject.
    vocab = counts.orderBy(F.desc("c"), F.asc("token")).limit(vocab_size)
    # Scalars as a 1-row broadcast (J9 idiom): N = corpus tokens,
    # v = |vocab| actually selected (< vocab_size on tiny corpora).
    scal = vocab.agg(F.count(F.lit(1)).alias("_v")).crossJoin(
        counts.agg(F.sum("c").alias("_n"))
    )
    scored = (
        toks.join(F.broadcast(vocab), "token", "left")
        .crossJoin(F.broadcast(scal))
        .select(
            id_col,
            F.col("c").isNull().cast("int").alias("_oov"),
            F.log2(
                (F.coalesce("c", F.lit(0)) + 1).cast("double")
                / (F.col("_n") + F.col("_v") + 1)
            ).alias("_lp"),
        )
    )
    per_doc = scored.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_tokens"),
        F.sum("_oov").alias("n_oov"),
        F.round(-F.avg("_lp"), 4).alias("nll_bits"),
    )
    return per_doc.select(
        id_col,
        "n_tokens",
        F.col("n_oov").cast("bigint").alias("n_oov"),
        F.round(F.col("n_oov") / F.col("n_tokens"), 4).alias("oov_ratio"),
        "nll_bits",
        F.round(F.pow(F.lit(2.0), F.col("nll_bits")), 2).alias("ppl"),
    )
