"""IVF centroid-drift maintenance (VERDICT r7 item 5).

An IVF / IVF-PQ serving snapshot is trained once (centroids +
codebooks are deploy-time artifacts) while ingestion keeps appending
(streaming/ingest.VectorIngest). Inserts drawn from a distribution the
coarse quantizer never saw land in whichever old Voronoi cells happen
to be nearest: cells bloat and straddle the new mass, nprobe cell
choice stops covering true neighbors, and recall degrades with NO
error anywhere — the silent-failure mode this module instruments.

The metric (the standard one production vector stores track): the
fraction of NEW rows whose nearest-centroid squared distance exceeds
the train-time distance profile — here the q-quantile taken as an
ORDER STATISTIC (the ceil(q*n)-th smallest), not an interpolated
percentile, so the threshold replays exactly in SQL on any engine.
Rows past that threshold would have been training outliers; when most
new rows look like outliers, the quantizer no longer describes the
data and a retrain is due.

Scale shape: the threshold is one TakeOrdered over the training-era
snapshot (computed once at train time and stored as serving metadata
next to the codebook); the per-batch staleness check is a single
codegen min-of-folds projection + one count aggregation over the BATCH
— O(batch), no shuffle, cheap enough to run inside every ingest
maintenance step. Only the trigger decision (a boolean against the
configured limit) is driver-side.

Usage with ingestion::

    mon = DriftMonitor(centroids, threshold, stale_limit=0.5)
    # inside foreachBatch, after commit:
    if mon.observe(batch_df).stale_frac > mon.stale_limit:
        cents = train_centroids(store.read(), sample_id_col="vec_id")
        ... re-encode / re-partition the serving snapshot ...

The registered ``ann_ivf_staleness`` query exposes the report with an
exact SQL oracle; tests/test_drift.py pins the full loop: planted
drifted inserts degrade measured nprobe recall, the trigger fires,
retraining restores recall.
"""

from __future__ import annotations

from collections.abc import Sequence
from dataclasses import dataclass

import numpy as np
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.distance import euclidean_sq


def nearest_centroid_dist(
    centroids: np.ndarray | Sequence[Sequence[float]],
    vec_col: str = "embedding",
) -> Column:
    """min_c ||v - centroid_c||^2 as one codegen expression
    (list_min of per-centroid left folds — the same construction as
    similarity.ivf_assign, keeping only the distance)."""
    cents = [[float(x) for x in c] for c in np.asarray(centroids, dtype=np.float64)]
    return F.array_min(F.array(*[euclidean_sq(vec_col, c) for c in cents]))


def staleness_threshold(
    df: DataFrame,
    centroids: np.ndarray | Sequence[Sequence[float]],
    q: float = 0.95,
    vec_col: str = "embedding",
) -> float:
    """Train-time distance profile: the ceil(q*n)-th smallest
    nearest-centroid distance over ``df`` (the data the quantizer was
    trained to describe). An order statistic — deterministic, engine-
    portable (ORDER BY d LIMIT r -> max), no interpolation. One
    TakeOrdered job; the returned float is serving metadata stored
    beside the codebook."""
    if not 0.0 < q <= 1.0:
        raise ValueError("q must be in (0, 1]")
    n = df.count()
    if n == 0:
        raise ValueError("empty training frame")
    # rank via integer ppm arithmetic: ceil(n * q) computed as
    # (n * q_ppm + 999999) // 1e6 — float ceil(n * q) is off-by-one
    # whenever n*q is an exact integer the double rounds up
    # (400 * 0.95 -> 380.00000000000006), and the SQL oracle mirrors
    # this exact integer rule
    q_ppm = round(q * 1_000_000)
    r = (n * q_ppm + 999_999) // 1_000_000
    r = max(1, min(n, r))
    d = nearest_centroid_dist(centroids, vec_col)
    row = (
        df.select(d.alias("__d"))
        .orderBy(F.col("__d").asc())
        .limit(r)
        .agg(F.max("__d"))
        .first()
    )
    return float(row[0])


def staleness_report(
    new_df: DataFrame,
    centroids: np.ndarray | Sequence[Sequence[float]],
    threshold: float,
    stale_limit: float = 0.5,
    vec_col: str = "embedding",
) -> DataFrame:
    """One-row report over the NEW rows: (n_new, n_stale, stale_frac,
    retrain_needed). stale = nearest-centroid distance strictly above
    ``threshold``; retrain_needed = stale_frac > stale_limit."""
    d = nearest_centroid_dist(centroids, vec_col)
    return new_df.agg(
        F.count(F.lit(1)).cast("long").alias("n_new"),
        F.sum((d > F.lit(float(threshold))).cast("long")).alias("n_stale"),
    ).select(
        "n_new",
        F.coalesce(F.col("n_stale"), F.lit(0)).cast("long").alias("n_stale"),
        F.round(
            F.coalesce(F.col("n_stale"), F.lit(0))
            / F.greatest(F.col("n_new"), F.lit(1)),
            6,
        ).alias("stale_frac"),
        (
            F.coalesce(F.col("n_stale"), F.lit(0))
            / F.greatest(F.col("n_new"), F.lit(1))
            > F.lit(float(stale_limit))
        ).alias("retrain_needed"),
    )


@dataclass
class DriftMonitor:
    """Accumulating drift tracker for an ingest loop: feed each
    committed batch to ``observe``; ``should_retrain`` flips when the
    stale fraction across observed batches crosses ``stale_limit``.
    State is two counters — trivially checkpointable next to the
    ingest epoch."""

    centroids: object
    threshold: float
    stale_limit: float = 0.5
    n_new: int = 0
    n_stale: int = 0

    def observe(self, batch_df: DataFrame, vec_col: str = "embedding"):
        row = staleness_report(
            batch_df, self.centroids, self.threshold,
            stale_limit=self.stale_limit, vec_col=vec_col,
        ).first()
        self.n_new += int(row["n_new"])
        self.n_stale += int(row["n_stale"])
        return row

    @property
    def stale_frac(self) -> float:
        return self.n_stale / self.n_new if self.n_new else 0.0

    @property
    def should_retrain(self) -> bool:
        return self.stale_frac > self.stale_limit

    def reset(self, centroids, threshold: float) -> None:
        """Call after retraining + re-encoding the serving snapshot."""
        self.centroids = centroids
        self.threshold = float(threshold)
        self.n_new = 0
        self.n_stale = 0
