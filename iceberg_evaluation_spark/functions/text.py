"""Text-analysis column expressions for the training-data pipeline surface.

All pure built-in ``pyspark.sql.functions`` compositions (JVM-side,
whole-stage-codegen'd) — no Python UDFs in the hot path. Regex dialect is
kept to the ASCII subset shared by Java regex (Spark) and RE2 (DuckDB)
so each expression has an exact SQL oracle twin.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

__all__ = [
    "normalize_ws",
    "fingerprint_md5",
    "token_count_ws",
    "token_count_bpe",
    "punct_ratio",
    "stopword_hits",
    "STOPWORDS",
    "PII_PATTERNS",
    "pii_count",
    "pii_redact",
]

#: small per-language stopword lists for the n-gram/stopword lang-id heuristic
STOPWORDS: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "and", "of", "to", "in", "is", "it", "that", "for"),
    "de": ("der", "die", "das", "und", "ist", "nicht", "ein", "mit", "für", "auf"),
    "es": ("el", "la", "de", "que", "y", "en", "un", "es", "no", "por"),
    "fr": ("le", "la", "et", "les", "des", "un", "une", "est", "que", "pour"),
}

_WS = r"\s+"
# BPE-ish pre-tokenizer: word runs OR single non-word-non-space chars
_BPE = r"[A-Za-z0-9_]+|[^A-Za-z0-9_\s]"
_PUNCT = r"[^A-Za-z0-9\s]"


def normalize_ws(col: Column | str) -> Column:
    """Lowercase + collapse whitespace runs to single spaces + trim."""
    c = F.col(col) if isinstance(col, str) else col
    return F.trim(F.regexp_replace(F.lower(c), _WS, " "))


def fingerprint_md5(col: Column | str) -> Column:
    """Document fingerprint: md5 of the whitespace-normalized text.
    (The rolling-hash fingerprint for shingles lives in operators.dedup.)"""
    return F.md5(normalize_ws(col))


def token_count_ws(col: Column | str) -> Column:
    """Whitespace token count (0 for empty/blank strings)."""
    c = F.col(col) if isinstance(col, str) else col
    t = F.trim(c)
    return F.when(t == "", F.lit(0)).otherwise(F.size(F.split(t, _WS)))


def token_count_bpe(col: Column | str) -> Column:
    """BPE-ish pre-token count: word runs + individual punctuation marks."""
    c = F.col(col) if isinstance(col, str) else col
    return F.size(F.regexp_extract_all(c, F.lit(_BPE), F.lit(0)))


def punct_ratio(col: Column | str) -> Column:
    """Punctuation characters / total characters (0.0 for empty)."""
    c = F.col(col) if isinstance(col, str) else col
    n = F.length(c)
    npunct = F.size(F.regexp_extract_all(c, F.lit(_PUNCT), F.lit(0)))
    return F.when(n == 0, F.lit(0.0)).otherwise(npunct.cast("double") / n)


def stopword_hits(col: Column | str, lang: str) -> Column:
    """Number of whitespace tokens that are stopwords of ``lang``."""
    toks = F.split(normalize_ws(col), " ")
    return F.size(F.filter(toks, lambda t: t.isin(*STOPWORDS[lang])))


#: PII scrub patterns, ordered (applied first → last). Kept to the ASCII
#: regex subset shared by Java regex (Spark) and RE2 (DuckDB) — no
#: lookaround — so every pattern has an exact SQL oracle twin.
PII_PATTERNS: tuple[tuple[str, str, str], ...] = (
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("phone", r"\b[0-9]{3}-[0-9]{4}\b", "<PHONE>"),
    ("ipv4", r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b", "<IP>"),
)


def pii_count(col: Column | str, kind: str) -> Column:
    """Occurrences of one PII pattern kind in the raw text."""
    c = F.col(col) if isinstance(col, str) else col
    pat = next(p for k, p, _ in PII_PATTERNS if k == kind)
    return F.size(F.regexp_extract_all(c, F.lit(pat), F.lit(0)))


def pii_redact(col: Column | str) -> Column:
    """Text with every PII pattern replaced by its placeholder token.

    Patterns apply in ``PII_PATTERNS`` order (email before phone before
    ip), matching the oracle's chained ``regexp_replace(..., 'g')``.
    """
    c = F.col(col) if isinstance(col, str) else col
    for _, pat, repl in PII_PATTERNS:
        c = F.regexp_replace(c, pat, repl)
    return c
