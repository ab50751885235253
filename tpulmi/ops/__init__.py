from tpulmi.ops.distance import pairwise_cosine, exact_knn
from tpulmi.ops.kmeans import kmeans, kmeans_assign

__all__ = ["pairwise_cosine", "exact_knn", "kmeans", "kmeans_assign"]
