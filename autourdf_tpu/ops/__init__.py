from .chamfer import chamfer_directional, chamfer_distance
from .fps import farthest_point_sample
from .kmeans import KMeansResult, assign, kmeans, kmeans_plusplus_init, lloyd
from .knn import nn_search

__all__ = [
    "chamfer_distance",
    "chamfer_directional",
    "nn_search",
    "farthest_point_sample",
    "kmeans",
    "lloyd",
    "assign",
    "kmeans_plusplus_init",
    "KMeansResult",
]
