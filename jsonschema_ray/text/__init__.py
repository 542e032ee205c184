from .analysis import (TextFeaturesStage, add_text_features, langid_batch,
                       simhash64_batch, token_counts)
from .fuzzy import blocked_fuzzy_pairs, levenshtein_many
from .packing import pack_sequences
from .passages import (char_entropy, decontaminate, duplicate_passages,
                       novelty_scores)
from .transform import chunk_text, normalize_text, term_frequency

__all__ = ["pack_sequences", "TextFeaturesStage", "add_text_features", "langid_batch",
           "simhash64_batch", "token_counts", "chunk_text",
           "normalize_text", "term_frequency", "char_entropy",
           "decontaminate", "duplicate_passages", "novelty_scores",
           "blocked_fuzzy_pairs", "levenshtein_many"]
