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
    pii_count,
    pii_redact,
    punct_ratio,
    stopword_hits,
    token_count_bpe,
    token_count_ws,
)

__all__ = [
    "text_quality",
    "language_id",
    "rolling_fingerprint",
    "repetition_metrics",
    "pii_scrub",
]


def _fan_out(df: DataFrame) -> DataFrame:
    """A single parquet file arrives as ONE partition; these operators are
    narrow (no shuffle of their own), so an under-partitioned input would
    serialize the whole corpus onto one core. Fan out only when needed —
    an already-partitioned at-scale scan passes through untouched."""
    p = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() >= max(2, p // 2):
        return df
    return df.repartition(p)


def text_quality(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    keep_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Per-document quality metrics + a composite score in [0, 1].

    Components mirror the standard pretraining-data heuristics: length
    band, mean token length band, punctuation-density penalty, stopword
    presence. Deterministic, rational arithmetic where possible.
    ``keep_cols`` passes input columns through (e.g. ``source`` for a
    downstream per-source selection) without a join back on the id.
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
        *[F.col(c) for c in keep_cols],
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


def repetition_metrics(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Gopher-style within-document repetition signals.

    Per document: the fraction of tokens taken by the single most
    frequent unigram, the fraction of bigram occurrences taken by the
    most frequent bigram, and the fraction of trigram occurrences that
    are repeats (1 − distinct/total) — the standard "repetitious
    document" filters from the Gopher/MassiveText quality pipeline.

    Shapes: trigram dup-frac is a narrow array expression (codegen'd,
    zero shuffle). The two mode-style metrics (top unigram / top bigram)
    genuinely need a per-(doc, gram) count → explode + two hash
    aggregations, both map-side combinable and keyed by ``id_col`` so
    they scale linearly with corpus token count — the same cost class as
    shingling for dedup. No Python anywhere.
    """
    # STAGED projections: the token array materializes ONCE per row, and
    # the gram-building lambdas read the materialized column. Inlining
    # the split into the transform lambdas re-runs the regex+split per
    # array element in interpreted mode — measured 15× slower at sf0.1
    # (the HOF-inlining trap the verify notes document). CollapseProject
    # keeps multi-referenced non-cheap aliases staged.
    def _grams(toks_col: str, n: int):
        t = F.col(toks_col)
        return F.when(
            F.size(t) >= n,
            F.transform(
                F.sequence(F.lit(1), F.size(t) - n + 1),
                lambda i: F.concat_ws(" ", F.slice(t, i, n)),
            ),
        ).otherwise(F.array().cast("array<string>"))

    staged = _fan_out(df).select(
        F.col(id_col), F.split(normalize_ws(text_col), " ").alias("_toks")
    )
    # split('', ' ') yields [''] — normalize that to an empty token count
    staged = staged.select(
        id_col,
        "_toks",
        F.when(
            (F.size("_toks") == 1) & (F.element_at("_toks", 1) == ""), F.lit(0)
        )
        .otherwise(F.size("_toks"))
        .alias("n_tokens"),
    )
    with_grams = staged.select(
        id_col,
        "_toks",
        _grams("_toks", 2).alias("_bi"),
        _grams("_toks", 3).alias("_tri"),
    )

    # ONE tagged explode feeds every gram statistic — the per-doc gram
    # mode (top unigram/bigram count) and the trigram total/distinct
    # counts all come out of the same (doc, kind, gram) aggregation:
    # 2 shuffles + 1 join total, and the token array stays staged
    # (3 lambda references) instead of being re-inlined per branch.
    def _tag(arr: str, k: str):
        return F.transform(
            F.col(arr), lambda g: F.struct(F.lit(k).alias("k"), g.alias("g"))
        )

    longs = with_grams.select(
        F.col(id_col),
        F.explode(
            F.concat(_tag("_toks", "u"), _tag("_bi", "b"), _tag("_tri", "t"))
        ).alias("_s"),
    ).select(id_col, F.col("_s.k").alias("_k"), F.col("_s.g").alias("_g"))
    tops = (
        longs.groupBy(id_col, "_k", "_g")
        .agg(F.count(F.lit(1)).alias("_c"))
        .groupBy(id_col)
        .agg(
            F.max(F.when(F.col("_k") == "u", F.col("_c"))).alias("_top_uni"),
            F.max(F.when(F.col("_k") == "b", F.col("_c"))).alias("_top_bi"),
            F.coalesce(
                F.sum(F.when(F.col("_k") == "t", F.col("_c"))), F.lit(0)
            ).alias("_n_tri"),
            F.coalesce(
                F.sum(F.when(F.col("_k") == "t", 1)), F.lit(0)
            ).alias("_n_tri_d"),
        )
    )

    uni_frac = F.when(F.col("n_tokens") == 0, F.lit(0.0)).otherwise(
        F.coalesce(F.col("_top_uni"), F.lit(0)).cast("double") / F.col("n_tokens")
    )
    n_bi = F.greatest(F.col("n_tokens") - 1, F.lit(0))
    bi_frac = F.when(n_bi == 0, F.lit(0.0)).otherwise(
        F.coalesce(F.col("_top_bi"), F.lit(0)).cast("double") / n_bi
    )
    tri_frac = F.when(
        F.coalesce(F.col("_n_tri"), F.lit(0)) == 0, F.lit(0.0)
    ).otherwise(
        (F.col("_n_tri") - F.col("_n_tri_d")).cast("double") / F.col("_n_tri")
    )
    return (
        staged.drop("_toks")
        .join(tops, id_col, "left")
        .select(
            id_col,
            "n_tokens",
            F.round(uni_frac, 6).alias("top_unigram_frac"),
            F.round(bi_frac, 6).alias("top_bigram_frac"),
            F.round(tri_frac, 6).alias("dup_trigram_frac"),
            ((uni_frac > 0.2) | (tri_frac > 0.5)).alias("repetitive"),
        )
    )


def pii_scrub(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Count and redact PII patterns (email / phone / IPv4) per document.

    Narrow, codegen'd regex work — the redacted text itself is emitted as
    an md5 fingerprint (value-stable across engines) plus the per-kind
    match counts, so the full scrub is hash-checkable without shipping
    the scrubbed corpus through the comparator.
    """
    return _fan_out(df).select(
        F.col(id_col),
        pii_count(text_col, "email").alias("n_emails"),
        pii_count(text_col, "phone").alias("n_phones"),
        pii_count(text_col, "ipv4").alias("n_ips"),
        (
            pii_count(text_col, "email")
            + pii_count(text_col, "phone")
            + pii_count(text_col, "ipv4")
            > 0
        ).alias("pii_found"),
        F.md5(pii_redact(F.col(text_col))).alias("redacted_fp"),
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
