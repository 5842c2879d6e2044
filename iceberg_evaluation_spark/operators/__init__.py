from .dedup import (
    exact_dedup,
    shingles,
    minhash_signature,
    minhash_lsh_candidates,
    minhash_near_duplicates,
    simhash64,
    simhash_near_duplicates,
    ngram_jaccard_pairs,
)
from .similarity import cosine_topk, cosine_pairs, ivf_cosine_topk
from .text_ops import text_quality, language_id

__all__ = [
    "exact_dedup",
    "shingles",
    "minhash_signature",
    "minhash_lsh_candidates",
    "minhash_near_duplicates",
    "simhash64",
    "simhash_near_duplicates",
    "ngram_jaccard_pairs",
    "cosine_topk",
    "cosine_pairs",
    "ivf_cosine_topk",
    "text_quality",
    "language_id",
]
