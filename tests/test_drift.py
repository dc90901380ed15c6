"""IVF drift maintenance (operators/drift, VERDICT r7 item 5).

The full failure->trigger->repair loop, pinned end to end:
streamed inserts from a cluster the coarse quantizer never saw scatter
across old Voronoi cells, nprobe recall degrades SILENTLY, the
staleness trigger fires, retraining on current data restores recall.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from lightweight_vector_database_spark.operators.drift import (
    DriftMonitor,
    staleness_report,
    staleness_threshold,
)
from lightweight_vector_database_spark.operators.knn import knn
from lightweight_vector_database_spark.operators.similarity import (
    ivf_assign,
    ivf_search,
    train_centroids,
)

DIM = 64
N_BASE = 4000
N_NEW = 400


def _cluster_df(spark, start_id: int, n: int, center_expr, amp: float = 0.05):
    noise = F.transform(
        F.sequence(F.lit(1), F.lit(DIM)),
        lambda i: amp * F.sin((F.col("vec_id") + 1) * i.cast("double") * 0.7),
    )
    return (
        spark.range(start_id, start_id + n)
        .select(F.col("id").alias("vec_id"))
        .select(
            "vec_id",
            F.zip_with(center_expr, noise, lambda c, nz: c + nz).alias(
                "embedding"
            ),
        )
    )


@pytest.fixture(scope="module")
def drifted_world(spark):
    """Base: 4 tight clusters at sign-pattern corners (the quantizer's
    training world). Drift: a 5th cluster at the ORIGIN — equidistant
    from every trained centroid, so noise scatters its members across
    all 4 old Voronoi cells (the geometry where nprobe cell choice
    breaks)."""
    corners = [
        [0.8] * DIM,
        [-0.8] * DIM,
        [(0.8 if i % 2 == 0 else -0.8) for i in range(DIM)],
        [(-0.8 if i % 2 == 0 else 0.8) for i in range(DIM)],
    ]
    parts = []
    per = N_BASE // 4
    for ci, c in enumerate(corners):
        parts.append(
            _cluster_df(
                spark, ci * per, per, F.array(*[F.lit(float(x)) for x in c])
            )
        )
    base = parts[0]
    for p in parts[1:]:
        base = base.unionByName(p)
    # the origin is equidistant from every corner centroid, so even
    # base-scale noise decides the argmin: members straddle all four
    # old Voronoi cells (measured scatter ~74/76/83/167)
    new = _cluster_df(spark, N_BASE, N_NEW, F.array(*[F.lit(0.0)] * DIM))
    base, new = base.cache(), new.cache()
    cents = train_centroids(
        base, n_centroids=4, iters=5, sample_rows=2048, sample_id_col="vec_id"
    )
    thr = staleness_threshold(base, cents, q=0.95)
    return base, new, cents, thr


def _mean_recall_at10(spark, table, cents, probes, nprobe):
    """Mean recall@10 over sampled drifted probes: the honest metric —
    single probes vary 0.3..0.8 with this scatter, the mean is stable."""
    from lightweight_vector_database_spark.operators.knn import knn_join

    want: dict[int, set] = {}
    for r in knn_join(probes, table, 10, strategy="window").collect():
        want.setdefault(r.probe_id, set()).add(r.vec_id)
    assigned = ivf_assign(table, cents).cache()
    recs = []
    for pid, vec in sorted(
        (r.probe_id, [float(x) for x in r.probe_vec])
        for r in probes.collect()
    ):
        got = {
            r.vec_id
            for r in ivf_search(assigned, cents, vec, k=10, nprobe=nprobe).collect()
        }
        recs.append(len(got & want[pid]) / 10)
    assigned.unpersist()
    return sum(recs) / len(recs)


def test_drift_degrades_trigger_fires_retrain_restores(spark, drifted_world):
    base, new, cents, thr = drifted_world
    union = base.unionByName(new).cache()
    probes = new.filter(F.col("vec_id") % 20 == 0).select(
        F.col("vec_id").alias("probe_id"),
        F.col("embedding").alias("probe_vec"),
    )

    # 1. drifted inserts degrade nprobe recall (silently: no error) —
    # the new cluster scatters ~evenly across all 4 old Voronoi cells,
    # so nprobe=1 sees roughly a quarter of each probe's neighborhood
    degraded = _mean_recall_at10(spark, union, cents, probes, nprobe=1)
    assert degraded < 0.6, f"expected degraded recall, got {degraded}"

    # 2. the staleness trigger fires on the drifted batch
    mon = DriftMonitor(cents, thr, stale_limit=0.5)
    row = mon.observe(new)
    assert row["retrain_needed"]
    assert mon.should_retrain and mon.stale_frac > 0.9

    # 3. retrain on current data restores recall. n_centroids=8: with
    # exactly 5 the seeded init can start two centroids in one corner
    # and Lloyd then merges the origin cluster into a corner cell
    # (measured: threshold blows up 250x and the monitor never goes
    # quiet) — over-provisioning centroids is the standard fix
    new_cents = train_centroids(
        union, n_centroids=8, iters=5, sample_rows=2048,
        sample_id_col="vec_id",
    )
    restored = _mean_recall_at10(spark, union, new_cents, probes, nprobe=1)
    assert restored >= 0.9, f"retrain did not restore recall: {restored}"
    # and the refreshed monitor goes quiet on the same batch
    mon.reset(new_cents, staleness_threshold(union, new_cents, q=0.95))
    mon.observe(new)
    assert not mon.should_retrain


def test_base_batches_do_not_trigger(spark, drifted_world):
    base, _, cents, thr = drifted_world
    rep = staleness_report(
        base.filter(F.col("vec_id") % 7 == 0), cents, thr, stale_limit=0.5
    ).first()
    # in-distribution rows: ~5% past the p95 threshold by construction
    assert rep["stale_frac"] < 0.15 and not rep["retrain_needed"]


def test_threshold_is_order_statistic(spark):
    df = spark.createDataFrame(
        [(i, [float(i)] + [0.0] * (DIM - 1)) for i in range(100)],
        "vec_id long, embedding array<double>",
    )
    cents = [[0.0] * DIM]
    # nearest-centroid dist of row i is i^2; ceil(0.95*100)=95th
    # smallest -> i=94 -> 8836.0
    thr = staleness_threshold(df, cents, q=0.95)
    assert thr == 94.0**2
    with pytest.raises(ValueError, match="q must be"):
        staleness_threshold(df, cents, q=0.0)
