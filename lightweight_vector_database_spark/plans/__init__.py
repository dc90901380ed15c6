from .grid_index import GridIndex, build_index, index_stats, knn_indexed

__all__ = ["GridIndex", "build_index", "index_stats", "knn_indexed"]
