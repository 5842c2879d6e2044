"""Text-analysis operators: quality scoring and language identification.

Pure built-in expression compositions over the ``documents`` table —
narrow (no shuffle), codegen'd, with exact DuckDB oracle twins.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.text import (
    STOPWORDS,
    fingerprint_md5,
    normalize_ws,
    punct_ratio,
    stopword_hits,
    token_count_bpe,
    token_count_ws,
)

__all__ = ["text_quality", "language_id", "rolling_fingerprint"]


def _fan_out(df: DataFrame) -> DataFrame:
    """A single parquet file arrives as ONE partition; these operators are
    narrow (no shuffle of their own), so an under-partitioned input would
    serialize the whole corpus onto one core. Fan out only when needed —
    an already-partitioned at-scale scan passes through untouched."""
    p = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() >= max(2, p // 2):
        return df
    return df.repartition(p)


def text_quality(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Per-document quality metrics + a composite score in [0, 1].

    Components mirror the standard pretraining-data heuristics: length
    band, mean token length band, punctuation-density penalty, stopword
    presence. Deterministic, rational arithmetic where possible.
    """
    n_chars = F.length(F.col(text_col))
    n_tok = token_count_ws(text_col)
    mean_tok_len = F.when(n_tok == 0, F.lit(0.0)).otherwise(
        F.length(F.regexp_replace(normalize_ws(text_col), " ", "")).cast("double")
        / n_tok
    )
    p_ratio = punct_ratio(text_col)
    sw = stopword_hits(text_col, "en")
    sw_ratio = F.when(n_tok == 0, F.lit(0.0)).otherwise(sw.cast("double") / n_tok)
    score = (
        F.when((n_chars >= 64) & (n_chars <= 4096), 0.25).otherwise(0.0)
        + F.when((mean_tok_len >= 3) & (mean_tok_len <= 12), 0.25).otherwise(0.0)
        + F.when(p_ratio <= 0.2, 0.25).otherwise(0.0)
        + F.when(sw_ratio >= 0.02, 0.25).otherwise(0.0)
    )
    return _fan_out(df).select(
        F.col(id_col),
        n_chars.alias("n_chars_obs"),
        n_tok.alias("n_tokens"),
        token_count_bpe(text_col).alias("n_bpe_tokens"),
        F.round(mean_tok_len, 4).alias("mean_token_len"),
        F.round(p_ratio, 4).alias("punct_ratio"),
        F.round(sw_ratio, 4).alias("stopword_ratio"),
        F.round(score, 2).alias("quality_score"),
        fingerprint_md5(text_col).alias("fingerprint"),
    )


def rolling_fingerprint(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 8,
    n_sketch: int = 4,
) -> DataFrame:
    """Rolling-window character-``k``-gram document fingerprint
    (winnowing / min-k sketch family — Schleimer et al., MOSS).

    Every char window ``[i, i+k)`` of the normalized text is hashed; the
    document keeps (a) the minimum window hash and (b) the ``n_sketch``
    smallest window hashes concatenated — a stable min-k sketch usable as
    a shift-robust near-dup key (unlike ``fingerprint_md5``, a one-char
    edit perturbs only the k windows covering it). In a columnar engine
    the "rolling" structure is the window *enumeration* (`sequence` +
    `substr`), evaluated entirely in JVM codegen — narrow per-row work,
    no shuffle, no Python. Docs shorter than ``k`` contribute their whole
    text as the single window so none vanish from the dedup universe.

    The normalized text and the hash array are each materialized ONCE per
    row via staged projections: inlining ``normalize_ws`` into the
    transform lambda would re-run the regex for every one of the ~|text|
    window positions (measured 30× slower at sf0.1).
    """
    staged = _fan_out(df).select(F.col(id_col), normalize_ws(text_col).alias("__norm"))
    m = F.greatest(F.length("__norm") - k + 1, F.lit(1))
    hs = F.transform(
        F.sequence(F.lit(1), m), lambda i: F.md5(F.col("__norm").substr(i, F.lit(k)))
    )
    hashed = staged.select(F.col(id_col), F.array_sort(hs).alias("__hs"))
    return hashed.select(
        F.col(id_col),
        F.size("__hs").alias("n_kgrams"),
        F.element_at("__hs", 1).alias("fp_min"),
        F.concat_ws("", F.slice("__hs", 1, n_sketch)).alias("fp_sketch"),
    )


def language_id(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Stopword-ratio language heuristic over {en, de, es, fr}.

    Emits one hit-ratio column per language plus the argmax label
    (ties → lexicographically-first language; 'und' when no stopwords
    hit at all). Narrow per-row computation — scales linearly.
    """
    n_tok = token_count_ws(text_col)
    ratios = {
        lang: F.when(n_tok == 0, F.lit(0.0)).otherwise(
            stopword_hits(text_col, lang).cast("double") / n_tok
        )
        for lang in sorted(STOPWORDS)
    }
    # argmax via greatest + chained when (deterministic tie-break: sorted langs)
    best = F.greatest(*ratios.values())
    label = F.lit("und")
    for lang in sorted(STOPWORDS, reverse=True):
        label = F.when((best > 0) & (ratios[lang] == best), lang).otherwise(label)
    sel = [F.col(id_col)]
    sel += [F.round(ratios[lang], 4).alias(f"ratio_{lang}") for lang in sorted(STOPWORDS)]
    sel.append(label.alias("lang_pred"))
    return _fan_out(df).select(*sel)
