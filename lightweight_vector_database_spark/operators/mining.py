"""Contrastive training-data mining: hard negatives.

For each anchor vector, the nearest base vector with a DIFFERENT
label — the "hard negative" used to build contrastive training pairs
(triplet / InfoNCE batches). The reference's kNN surface
(kd_tree_database.py:285-304) gives "nearest"; this adds the
label-disagreement predicate and the per-anchor reduction.

Scale shape: anchors broadcast (the anchor set is a sample — thousands
at most, never the corpus); the base side streams through ONE
partial-aggregating groupBy(anchor) min(struct(dist, id)) — no window,
no sort, no |base| x |anchors| shuffle: each map task reduces to
|anchors| rows before the exchange. The label-mismatch predicate is
applied in the join, so same-label pairs never materialize.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions import distance as D

__all__ = ["hard_negatives"]

_PAIR_METRICS = {
    "euclidean_sq": D.euclidean_sq,
    "manhattan": D.manhattan,
    "chebyshev": D.chebyshev,
    "cosine": D.cosine_distance,
}


def hard_negatives(
    anchors: DataFrame,
    base: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    label_col: str = "label",
    metric: str = "euclidean_sq",
) -> DataFrame:
    """Per anchor: the single nearest base row whose label differs
    (ties to the smallest base id). Returns (anchor_id, anchor_label,
    neg_id, neg_label, dist)."""
    if metric not in _PAIR_METRICS:
        raise KeyError(
            f"unknown pair metric {metric!r}; one of {sorted(_PAIR_METRICS)}"
        )
    a = anchors.select(
        F.col(id_col).alias("anchor_id"),
        F.col(label_col).alias("anchor_label"),
        F.col(vec_col).alias("__av"),
    )
    pairs = base.join(
        F.broadcast(a), F.col(label_col) != F.col("anchor_label")
    )
    dist: Column = _PAIR_METRICS[metric](F.col(vec_col), F.col("__av"))
    best = pairs.groupBy("anchor_id", "anchor_label").agg(
        F.min(
            F.struct(
                dist.alias("dist"),
                F.col(id_col).alias("neg_id"),
                F.col(label_col).alias("neg_label"),
            )
        ).alias("b")
    )
    return best.select(
        "anchor_id",
        "anchor_label",
        F.col("b.neg_id").alias("neg_id"),
        F.col("b.neg_label").alias("neg_label"),
        F.col("b.dist").alias("dist"),
    )
