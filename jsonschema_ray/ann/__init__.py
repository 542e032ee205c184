from .kmeans import distributed_kmeans
from .search import IvfIndex, brute_force_topk, embedding_matrix, ivf_topk

__all__ = ["IvfIndex", "brute_force_topk", "embedding_matrix", "ivf_topk",
           "distributed_kmeans"]
