"""Distributed linear-model training by full-batch gradient descent.

The quality-classifier step of a curation pipeline (CCNet/fasttext
style: a linear probe over cheap text features deciding keep/drop) as
pure dataflow: each GD step is ONE partial-aggregating job computing
the exact full-batch gradient, synchronized to the driver as
O(#features) scalars — the same sync pattern as operators/kmeans.py
and Spark MLlib's own iterative optimizers.

Engine-portable on purpose (the whole training run replays in
unrolled SQL CTEs):

- predictions are left-associated literal-weight dot products;
- per-row gradient terms are quantized to integer micro-units before
  the sum (order-independent), then the weight update
  ``w - lr * (((s / 1e6) / n) * 2)`` applies the same two divisions
  and multiply in the same order on both engines;
- plain squared loss (no sigmoid/exp — libm transcendentals are not
  bit-identical across engines; ln is the only transcendental the
  oracle suite relies on).

Scale shape: per step one scan + one agg whose shuffle carries
#features longs per map task. Nothing but the weight vector ever
reaches the driver.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["train_linear_gd", "prediction_expr"]


def prediction_expr(
    weights: list[float], feature_cols: list[str]
) -> Column:
    """Left-associated literal-weight dot product:
    ((w0*x0 + w1*x1) + w2*x2) + ... — the association order is part of
    the cross-engine contract."""
    pred: Column | None = None
    for w, c in zip(weights, feature_cols):
        term = F.lit(float(w)) * F.col(c)
        pred = term if pred is None else pred + term
    return pred


def train_linear_gd(
    features: DataFrame,
    feature_cols: list[str],
    label_col: str,
    iters: int,
    lr: float,
) -> list[float]:
    """Minimize mean squared error of a linear model by ``iters``
    full-batch GD steps from w=0. ``features`` must already have one
    double column per feature (include a literal 1.0 column for the
    bias) plus the label. Returns the trained weight list."""
    if iters < 1 or not feature_cols:
        raise ValueError("need iters >= 1 and at least one feature")
    w = [0.0] * len(feature_cols)
    for _ in range(iters):
        pred = prediction_expr(w, feature_cols)
        resid = pred - F.col(label_col)
        row = features.agg(
            F.count(F.lit(1)).alias("n"),
            *[
                F.sum(
                    F.floor((resid * F.col(c)) * F.lit(1e6)).cast("long")
                ).alias(f"s_{j}")
                for j, c in enumerate(feature_cols)
            ],
        ).collect()[0]
        n = int(row["n"])
        if n == 0:
            raise ValueError("empty training set")
        w = [
            wj - lr * (((int(row[f"s_{j}"]) / 1e6) / n) * 2.0)
            for j, wj in enumerate(w)
        ]
    return w
