from .analysis import (TextFeaturesStage, add_text_features, langid_batch,
                       simhash64_batch, token_counts)

__all__ = ["TextFeaturesStage", "add_text_features", "langid_batch",
           "simhash64_batch", "token_counts"]
