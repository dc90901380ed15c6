from .asof import asof_join
from .knn import knn, knn_join
from .topk import topk_per_group

__all__ = ["asof_join", "knn", "knn_join", "topk_per_group"]
