from .distance import (
    METRICS,
    chebyshev,
    cosine_distance,
    dot,
    euclidean_sq,
    l2_norm,
    mahalanobis_diag,
    manhattan,
    metric_expr,
    register_metric,
    vec_lit,
)

__all__ = [
    "METRICS",
    "chebyshev",
    "cosine_distance",
    "dot",
    "euclidean_sq",
    "l2_norm",
    "mahalanobis_diag",
    "manhattan",
    "metric_expr",
    "register_metric",
    "vec_lit",
]
