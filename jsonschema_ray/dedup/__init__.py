from .exact import exact_dedup, exact_dedup_stats
from .minhash import (MinHashStage, incremental_minhash_neardup,
                      jaccard_shingles, minhash_near_duplicates,
                      verified_near_duplicates, write_minhash_signatures)
from .embedding import (embedding_near_duplicates, exact_cosine_pairs,
                        incremental_embedding_neardup,
                        write_embedding_index)
from .ngram import ngram_jaccard_pairs
from .simhash import simhash_near_duplicates
from .components import connected_components, union_find_components

__all__ = ["exact_dedup", "exact_dedup_stats", "MinHashStage",
           "minhash_near_duplicates", "verified_near_duplicates",
           "write_minhash_signatures", "incremental_minhash_neardup",
           "write_embedding_index", "incremental_embedding_neardup",
           "jaccard_shingles",
           "embedding_near_duplicates", "exact_cosine_pairs",
           "ngram_jaccard_pairs", "simhash_near_duplicates",
           "connected_components", "union_find_components"]
