"""Benchmark-contamination check: word-n-gram overlap between a training
corpus and an evaluation set.

The standard pretraining hygiene step (GPT-3 appendix C / PaLM-style
"13-gram overlap"): a training document is contaminated when any of its
word n-grams also occurs in the evaluation set. Expressed Spark-first:

- n-gram construction is a narrow, whole-stage-codegen'd array expression
  (``split`` → ``transform`` + ``slice``) — no Python, no shuffle;
- the eval-set gram dictionary is DISTINCT-aggregated once and
  **broadcast** to the probe join (eval sets are tiny relative to a
  100 TB training corpus — benchmark suites are MBs, so the dictionary
  broadcast is the right plan at any corpus scale);
- the per-document overlap count is one hash aggregation on ``doc_id``
  (map-side combinable).

Exactly deterministic → full DuckDB oracle twin (q81).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.text import normalize_ws

__all__ = ["word_ngrams", "contamination_check"]


def word_ngrams(toks: Column, n: int) -> Column:
    """DISTINCT space-joined word ``n``-grams from a MATERIALIZED token
    array column.

    ``toks`` must be a staged (real) column, not an inline
    ``split(...)`` expression: HOF lambdas are interpreted, so an inline
    split would re-run the regex per array element (the staging
    discipline from ``rolling_fingerprint``). Documents with fewer than
    ``n`` tokens yield an empty array (they cannot be contaminated at
    this n — mirrors the reference hygiene rule of skipping too-short
    documents rather than padding them).
    """
    cnt = F.size(toks)
    grams = F.transform(
        # sequence(1, cnt-n+1) is ASCENDING only when cnt >= n; the
        # when() guard keeps the descending-sequence footgun out
        F.sequence(F.lit(1), cnt - n + 1),
        lambda i: F.concat_ws(" ", F.slice(toks, i, n)),
    )
    return F.when(cnt >= n, F.array_distinct(grams)).otherwise(
        F.array().cast("array<string>")
    )


def _gram_frame(df: DataFrame, text_col: str, id_col: str, n: int) -> DataFrame:
    """(id, grams) with the token array staged as a real column first."""
    staged = df.select(
        F.col(id_col), F.split(normalize_ws(text_col), " ").alias("_toks")
    )
    return staged.select(id_col, word_ngrams(F.col("_toks"), n).alias("_grams"))


def contamination_check(
    train: DataFrame,
    eval_df: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 8,
) -> DataFrame:
    """Flag training documents sharing any word ``n``-gram with the eval set.

    Output per training document:
    ``(id_col, n_grams, n_matched, overlap_frac, contaminated)`` where
    ``n_grams`` counts the document's distinct n-grams, ``n_matched`` how
    many of them occur anywhere in ``eval_df``, and ``contaminated`` is
    true when ``n_matched > 0``.
    """
    ev = (
        _gram_frame(eval_df, text_col, id_col, n)
        .select(F.explode("_grams").alias("_gram"))
        .distinct()
        .withColumn("_hit", F.lit(1))
    )
    tr = _gram_frame(train, text_col, id_col, n).select(
        F.col(id_col), F.explode_outer("_grams").alias("_gram")
    )
    per_doc = (
        tr.join(F.broadcast(ev), "_gram", "left")
        .groupBy(id_col)
        .agg(
            F.count("_gram").alias("n_grams"),
            F.count("_hit").alias("n_matched"),
        )
    )
    frac = F.when(F.col("n_grams") == 0, F.lit(0.0)).otherwise(
        F.col("n_matched").cast("double") / F.col("n_grams")
    )
    return per_doc.select(
        id_col,
        "n_grams",
        "n_matched",
        F.round(frac, 6).alias("overlap_frac"),
        (F.col("n_matched") > 0).alias("contaminated"),
    )
