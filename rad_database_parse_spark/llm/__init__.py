from .dedup import (
    exact_dedup_by_hash,
    minhash_lsh_candidates,
    ngram_jaccard_pairs,
    simhash_signatures,
    tokenize,
)
from .similarity import brute_force_cosine_topk, lsh_bucketed_cosine_topk
from .text import language_id, quality_score, token_stats

__all__ = [
    "tokenize",
    "exact_dedup_by_hash",
    "ngram_jaccard_pairs",
    "minhash_lsh_candidates",
    "simhash_signatures",
    "brute_force_cosine_topk",
    "lsh_bucketed_cosine_topk",
    "language_id",
    "quality_score",
    "token_stats",
]
