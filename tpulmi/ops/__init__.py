from tpulmi.ops.distance import (
    exact_knn,
    pairwise_cosine,
    pairwise_cosine_threshold,
)
from tpulmi.ops.kmeans import kmeans, kmeans_assign

__all__ = [
    "pairwise_cosine",
    "pairwise_cosine_threshold",
    "exact_knn",
    "kmeans",
    "kmeans_assign",
]
