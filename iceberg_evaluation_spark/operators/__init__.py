from .bloom_dedup import bloom_prefiltered_anti_join
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
from .dsir import dsir_importance_weights
from .keywords import tfidf_top_terms
from .similarity import cosine_topk, cosine_pairs, ivf_cosine_topk
from .text_ops import text_quality, language_id

__all__ = [
    "bloom_prefiltered_anti_join",
    "exact_dedup",
    "shingles",
    "minhash_signature",
    "minhash_lsh_candidates",
    "minhash_near_duplicates",
    "simhash64",
    "simhash_near_duplicates",
    "ngram_jaccard_pairs",
    "dsir_importance_weights",
    "tfidf_top_terms",
    "cosine_topk",
    "cosine_pairs",
    "ivf_cosine_topk",
    "text_quality",
    "language_id",
]
