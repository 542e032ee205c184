from .search import brute_force_topk, ivf_topk

__all__ = ["brute_force_topk", "ivf_topk"]
