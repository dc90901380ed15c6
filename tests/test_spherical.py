"""Spherical-kmeans coarse layer for the cosine serving contract
(operators/similarity.spherical_kmeans_np / train_spherical_ivfpq —
VERDICT r11 item 3's "(or spherical k-means)" half).

The contract: every trained coarse centroid is UNIT NORM, so argmin
squared-euclidean (the unchanged serve/encode/oracle kernel) IS argmax
cosine; plain Lloyd on the same normalized sample leaves interior
(norm < 1) centroids on spread clusters; the model is deterministic;
zero rows pass through without NaN; and the end-to-end serve through
``ann_join_topk(metric='cosine')`` at exhaustive nprobe reproduces the
brute-force true-cosine top-k exactly.

Reference contract: pluggable metric per kNN call (database.py:31-48)
served through a coarse layer trained in the served metric's geometry.
"""

from __future__ import annotations

import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from lightweight_vector_database_spark.operators.similarity import (
    ivfpq_encode,
    spherical_kmeans_np,
    train_centroids_np,
    train_spherical_ivfpq,
    train_spherical_ivfpq_np,
)
from lightweight_vector_database_spark.plans.ann_join import ann_join_topk


def _cones(n=3000, dim=16, k=6, spread=0.6, seed=7):
    """k cones of unit vectors: cluster directions drawn once, members
    are direction + gaussian noise, renormalized — wide `spread` makes
    plain Lloyd's mean centroids visibly interior."""
    rng = np.random.RandomState(seed)
    dirs = rng.randn(k, dim)
    dirs /= np.sqrt((dirs**2).sum(axis=1))[:, None]
    X = dirs[rng.randint(0, k, n)] + spread * rng.randn(n, dim)
    X /= np.sqrt((X**2).sum(axis=1))[:, None]
    return X


def test_spherical_centroids_are_unit_norm():
    X = _cones()
    cents = spherical_kmeans_np(X, n_centroids=8, iters=4)
    norms = np.sqrt((cents**2).sum(axis=1))
    assert np.allclose(norms, 1.0, atol=1e-12)


def test_plain_lloyd_drifts_interior_spherical_does_not():
    # the geometric motivation, measured: on wide cones plain Lloyd's
    # unconstrained means land strictly inside the ball
    X = _cones(spread=0.8)
    plain = train_centroids_np(X, n_centroids=8, iters=4)
    plain_norms = np.sqrt((plain**2).sum(axis=1))
    assert plain_norms.min() < 0.95  # interior centroids exist
    sph = spherical_kmeans_np(X, n_centroids=8, iters=4)
    assert np.allclose(np.sqrt((sph**2).sum(axis=1)), 1.0, atol=1e-12)


def test_spherical_model_deterministic():
    X = _cones()
    a = train_spherical_ivfpq_np(X, n_centroids=8, m=4, ksub=16, iters=3)
    b = train_spherical_ivfpq_np(X, n_centroids=8, m=4, ksub=16, iters=3)
    assert np.array_equal(a[0], b[0]) and np.array_equal(a[1], b[1])


def test_spherical_trainer_accepts_raw_unnormalized_rows():
    # the trainer normalizes internally (left-fold norm); scaling the
    # input rows must not change the model
    X = _cones()
    scales = np.linspace(0.5, 20.0, len(X))[:, None]
    a = train_spherical_ivfpq_np(X, n_centroids=8, m=4, ksub=16, iters=3)
    b = train_spherical_ivfpq_np(
        X * scales, n_centroids=8, m=4, ksub=16, iters=3
    )
    # scaled rows normalize to ALMOST the same unit rows (x*s/|x*s| ==
    # x/|x| exactly in real arithmetic; IEEE division reorders the
    # rounding, so allow float-eps drift in the trained model)
    assert np.allclose(a[0], b[0], atol=1e-9)


def test_zero_rows_pass_without_nan():
    X = _cones(n=500)
    X[0] = 0.0
    cents, books = train_spherical_ivfpq_np(
        X, n_centroids=4, m=4, ksub=8, iters=2
    )
    assert np.isfinite(cents).all() and np.isfinite(books).all()


def test_empty_cells_keep_previous_centroid():
    # more centroids than distinct directions: duplicated points leave
    # most cells empty after the first assignment; the update must not
    # produce NaN or zero centroids
    X = np.tile(_cones(n=4, k=2, spread=0.0, seed=1), (50, 1))
    cents = spherical_kmeans_np(X, n_centroids=8, iters=3)
    norms = np.sqrt((cents**2).sum(axis=1))
    assert np.allclose(norms, 1.0, atol=1e-12)


@pytest.mark.parametrize("nprobe_exhaustive", [True])
def test_spherical_serve_exhaustive_equals_brute_cosine(
    spark, sf_dir, nprobe_exhaustive
):
    """End-to-end: spherical model -> normalized codes snapshot ->
    ann_join_topk(metric='cosine') at nprobe == n_centroids and
    refine >> k reproduces brute-force true-cosine top-k exactly
    (tie-broken by vec_id, like the kernel's total order)."""
    from lightweight_vector_database_spark.sources import load_table
    from lightweight_vector_database_spark.suite.pipeline_suite12 import (
        _norm_emb,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    n_cents, m, ksub, k = 4, 4, 16, 5
    cents, books = train_spherical_ivfpq(
        emb, n_centroids=n_cents, m=m, ksub=ksub, iters=3,
        sample_rows=256, sample_id_col="vec_id",
    )
    codes = ivfpq_encode(_norm_emb(emb), cents, books).select(
        "vec_id", "cell", "pq_code"
    )
    probes = (
        emb.filter(F.col("vec_id") < 8)
        .select(
            F.col("vec_id").alias("probe_id"),
            F.col("embedding").cast("array<double>").alias("probe_vec"),
        )
    )
    got = (
        ann_join_topk(
            codes, cents, books, probes, raw=emb, k=k,
            nprobe=n_cents, refine=10**6, metric="cosine",
        )
        .select("probe_id", "vec_id", "rank")
        .collect()
    )
    # brute truth: true cosine with the kernel's EXACT left-fold
    # arithmetic (functions/distance.cosine_distance: 1 - num/(na*nb),
    # each sum a 0.0-seeded left fold), (dist, vec_id) total order —
    # bit-identical, so rank equality is deterministic
    def fold(vals):
        acc = 0.0
        for x in vals:
            acc = acc + x
        return acc

    def cosd(a, b):
        num = fold([float(x) * float(y) for x, y in zip(a, b)])
        na = math.sqrt(fold([float(x) * float(x) for x in a]))
        nb = math.sqrt(fold([float(y) * float(y) for y in b]))
        return 1.0 - num / (na * nb)

    base = {r["vec_id"]: list(r["embedding"]) for r in emb.collect()}
    want = []
    for p in probes.collect():
        pv = [float(x) for x in p["probe_vec"]]
        scored = sorted(
            ((cosd(v, pv), vid) for vid, v in base.items()),
        )[:k]
        want += [
            (p["probe_id"], vid, i + 1) for i, (_, vid) in enumerate(scored)
        ]
    assert sorted((r[0], r[1], r[2]) for r in got) == sorted(want)


def test_spherical_fixture_operating_point_resolution():
    """r12: ann_join_spherical resolves its (nprobe, refine) from the
    spherical build's OWN recorded frontier (FRONTIER_sf001_sph.json,
    tools/fixture_frontier --shape spherical) at the 0.95 floor —
    the evidence-only governance every serving shape follows. The
    suite constants must equal the recording's resolution, and an
    unclippable floor must fall back (refusal contract)."""
    from pathlib import Path

    from lightweight_vector_database_spark.operators.tiering import (
        fixture_operating_point,
    )
    from lightweight_vector_database_spark.suite.pipeline_suite16 import (
        _SPH_FLOOR,
        _SPH_NPROBE,
        _SPH_REFINE,
    )

    path = str(
        Path(__file__).resolve().parent.parent / "FRONTIER_sf001_sph.json"
    )
    if not Path(path).exists():
        pytest.skip("spherical fixture frontier recording absent")

    assert (_SPH_NPROBE, _SPH_REFINE) == fixture_operating_point(
        path, _SPH_FLOOR, (4, 8)
    )
    # the resolved point is recorded, not the fallback
    assert (_SPH_NPROBE, _SPH_REFINE) != (4, 8)
    # a floor no recorded point clears serves the fallback, never an
    # invented knob
    assert fixture_operating_point(path, 1.01, (4, 8)) == (4, 8)


def test_spherical_model_composes_with_codes_maintenance(spark, tmp_path):
    """The spherical model is the plain (cents, books) form, so the
    incremental maintenance loop (plans/ann_maintenance.CodesSnapshot)
    serves it unchanged: maintained == from-scratch encode after a
    mixed CDC history over the NORMALIZED corpus (the cosine
    contract's encode space), and a plain-Lloyd model refuses to
    resume into the spherical store (value-based fingerprint — the
    two trainings differ only in centroid values)."""
    from lightweight_vector_database_spark.operators.similarity import (
        train_ivfpq_np,
    )
    from lightweight_vector_database_spark.plans.ann_maintenance import (
        CodesSnapshot,
    )
    from lightweight_vector_database_spark.sources.delta_snapshots import (
        DeltaSnapshotStore,
    )

    dim = 16

    def rows(ids):
        data = []
        for i in ids:
            v = np.array(
                [0.3 * np.cos(0.7 * (i + 1) * (t + 1)) for t in range(dim)]
            )
            v = v / np.sqrt((v * v).sum())  # unit rows: the encode space
            data.append((int(i), [float(x) for x in v]))
        return spark.createDataFrame(data, "vec_id long, embedding array<double>")

    sample = np.stack([r.embedding for r in rows(range(200)).collect()])
    cents, books = train_spherical_ivfpq_np(
        sample, n_centroids=4, m=4, ksub=16, iters=3
    )
    plain_cents, plain_books = train_ivfpq_np(
        sample, n_centroids=4, m=4, ksub=16, iters=3
    )
    assert not np.array_equal(cents, plain_cents)  # distinct builds

    base = DeltaSnapshotStore(spark, str(tmp_path / "base"))
    view = DeltaSnapshotStore(spark, str(tmp_path / "codes"))
    cs = CodesSnapshot(base, view, cents, books)
    base.commit_full(rows(range(80)), partition_by=None)
    cs.refresh()
    base.commit_mutation(
        append_df=rows(range(100, 120)),
        delete_ids=spark.createDataFrame(
            [(int(i),) for i in range(10)], "vec_id long"
        ),
    )
    cs.refresh()
    assert cs.last_refresh_mode == "incremental"
    fresh = CodesSnapshot(
        DeltaSnapshotStore(spark, str(tmp_path / "base")),
        DeltaSnapshotStore(spark, str(tmp_path / "codes_fresh")),
        cents, books,
    )
    fresh.refresh()

    def canon(df):
        return sorted(
            (r.vec_id, r.cell, tuple(r.pq_code)) for r in df.collect()
        )

    assert canon(cs.codes()) == canon(fresh.codes())
    # plain-Lloyd model (different centroid values) refuses to resume
    with pytest.raises(ValueError, match="different model"):
        CodesSnapshot(base, view, plain_cents, plain_books)
