from .knn import knn_points, nn_points

__all__ = ["nn_points", "knn_points"]
