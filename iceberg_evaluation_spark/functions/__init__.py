from .keys import composite_pk
from .text import (
    normalize_ws,
    fingerprint_md5,
    token_count_ws,
    token_count_bpe,
    punct_ratio,
    stopword_hits,
    STOPWORDS,
)

__all__ = [
    "composite_pk",
    "normalize_ws",
    "fingerprint_md5",
    "token_count_ws",
    "token_count_bpe",
    "punct_ratio",
    "stopword_hits",
    "STOPWORDS",
]
