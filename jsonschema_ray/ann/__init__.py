from .kmeans import distributed_kmeans
from .pca import covariance, distributed_pca, mahalanobis_scores
from .pca import project as pca_project
from .search import (IvfIndex, brute_force_topk, embedding_matrix,
                     hard_negative_topk, ivf_topk)

__all__ = ["IvfIndex", "brute_force_topk", "embedding_matrix",
           "hard_negative_topk", "ivf_topk",
           "distributed_kmeans", "distributed_pca", "pca_project",
           "covariance", "mahalanobis_scores"]
