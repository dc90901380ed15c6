"""Anisotropy-aware coarse layer: ZCA whitening in front of IVF-PQ
(operators/similarity.zca_whitening_np / train_whitened_ivfpq,
ivfpq_encode(whiten=), ann_join_topk(whiten=) — VERDICT r11 item 3).

The serving contract: candidate-selection GEOMETRY moves into the
whitened space (assignment + residual ADC), the exact re-rank stays on
the raw vectors — so whiten=identity must be BIT-IDENTICAL to the
plain pipeline, the whitened sample covariance must be ~I, an
anisotropic corpus must recover live coarse cells, and the refusal
matrix (imi, mixed-model view resume) must fire loudly.

Reference contract: find_k_nearest_neighbors
(kd_tree_database.py:285-304) served through a covariance-conditioned
coarse partition.
"""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from lightweight_vector_database_spark.operators.similarity import (
    fold_matvec,
    ivfpq_encode,
    train_ivfpq,
    train_ivfpq_np,
    train_whitened_ivfpq,
    train_whitened_ivfpq_np,
    zca_whitening_np,
)
from lightweight_vector_database_spark.plans.ann_join import ann_join_topk
from lightweight_vector_database_spark.sources import load_table

SF001 = "/root/testdata/sf0.01"


def _aniso_clusters(n=6000, dim=16, k=12, seed=3):
    """Clustered corpus through an anisotropic mix (the r11 sweep
    generator's shape): per-dim geometric scale ladder spanning 16x
    variance, spread by a random orthogonal matrix so no coordinate
    subset sees balanced variance."""
    rng = np.random.RandomState(seed)
    centers = rng.uniform(-0.5, 0.5, size=(k, dim))
    X = centers[rng.randint(0, k, n)] + rng.normal(0, 0.08, size=(n, dim))
    s = rng.permutation(np.geomspace(0.25, 4.0, dim))
    Q, _ = np.linalg.qr(rng.normal(size=(dim, dim)))
    return X @ (Q * s[None, :]).T


def test_zca_whitens_the_sample_covariance():
    X = _aniso_clusters()
    W = zca_whitening_np(X)
    Xw = fold_matvec(X, W)
    C = np.cov(Xw.T)
    # unit spectrum restored (eps keeps it slightly under 1)
    assert np.abs(np.diag(C) - 1.0).max() < 0.05
    off = C - np.diag(np.diag(C))
    assert np.abs(off).max() < 0.05
    # ZCA is symmetric (the closest-to-identity whitening)
    assert np.allclose(W, W.T)


def test_whitened_coarse_layer_stays_fully_allocated_on_aniso():
    """Coarse-layer allocation on the anisotropic mix, measured.

    The r11 note claimed the aniso mix collapses Lloyd to 11 live
    cells of 64; re-measured in r12 with the actual encode path at 1M
    (ROUND12_NOTES), plain Lloyd keeps 62/64 live with balanced mass
    (cells_for_90pct=46) — the collapse does NOT reproduce, and at
    matched nprobe the whitened partition does not beat the raw one
    for RAW-euclidean serving (the raw Voronoi partition is
    metric-matched; whitening helps only when coarse TRAINING itself
    degenerates). This test pins the invariant that holds: whitened
    training never allocates fewer live cells than plain, and keeps
    the full budget live on this corpus."""
    X = _aniso_clusters()
    n_cents = 24
    cents, _books = train_ivfpq_np(X, n_centroids=n_cents, m=4, ksub=16,
                                   iters=4)
    plain_live = len(
        set(((X[:, None, :] - cents[None]) ** 2).sum(2).argmin(1).tolist())
    )
    W, wcents, _wbooks = train_whitened_ivfpq_np(
        X, n_centroids=n_cents, m=4, ksub=16, iters=4
    )
    Xw = fold_matvec(X, W)
    wh_live = len(
        set(((Xw[:, None, :] - wcents[None]) ** 2).sum(2).argmin(1).tolist())
    )
    assert wh_live >= plain_live, (plain_live, wh_live)
    assert wh_live == n_cents, (plain_live, wh_live)


def test_identity_whitening_is_bit_identical(spark):
    """whiten=I must serve bit-identically to whiten=None: the fold
    matvec against an identity matrix reproduces each coordinate
    exactly (0.0 + ... + 1.0*x + ... IEEE-exact), so this pins that
    the whitened code path adds no arithmetic of its own."""
    emb = load_table(spark, SF001, "embeddings").select(
        "vec_id", "label", "embedding"
    )
    cents, books = train_ivfpq(
        emb, n_centroids=8, m=8, ksub=16, iters=2, sample_id_col="vec_id"
    )
    dim = cents.shape[1]
    eye = np.eye(dim)
    probes = emb.filter(F.col("vec_id") % 29 == 0).select(
        F.col("vec_id").alias("probe_id"),
        F.col("embedding").cast("array<double>").alias("probe_vec"),
    )

    def canon(codes_df, whiten):
        out = ann_join_topk(
            codes_df, cents, books, probes, raw=emb, k=5, nprobe=3,
            refine=4, whiten=whiten,
        )
        return sorted(
            (r.probe_id, r.vec_id, r.dist, r["rank"]) for r in out.collect()
        )

    plain_codes = ivfpq_encode(emb, cents, books).select(
        "vec_id", "cell", "pq_code"
    ).cache()
    ident_codes = ivfpq_encode(emb, cents, books, whiten=eye).select(
        "vec_id", "cell", "pq_code"
    ).cache()
    enc_a = sorted(
        (r.vec_id, r.cell, tuple(r.pq_code)) for r in plain_codes.collect()
    )
    enc_b = sorted(
        (r.vec_id, r.cell, tuple(r.pq_code)) for r in ident_codes.collect()
    )
    assert enc_a == enc_b
    assert canon(plain_codes, None) == canon(ident_codes, eye)
    plain_codes.unpersist(), ident_codes.unpersist()


@pytest.fixture(scope="module")
def wh_model(spark):
    emb = load_table(spark, SF001, "embeddings").select(
        "vec_id", "label", "embedding"
    )
    W, cents, books = train_whitened_ivfpq(
        emb, n_centroids=8, m=16, ksub=16, iters=2, sample_id_col="vec_id"
    )
    return emb, W, cents, books


def test_pack4_composes_with_whitening_bit_identically(spark, wh_model):
    """pack4 is storage-only UNDER whitening too: the packed whitened
    snapshot serves bit-identically to the byte-code whitened
    snapshot."""
    emb, W, cents, books = wh_model
    probes = emb.filter(F.col("vec_id") % 31 == 0).select(
        F.col("vec_id").alias("probe_id"),
        F.col("embedding").cast("array<double>").alias("probe_vec"),
    )
    byte_codes = ivfpq_encode(emb, cents, books, whiten=W).select(
        "vec_id", "cell", "pq_code"
    )
    packed = ivfpq_encode(emb, cents, books, whiten=W, pack4=True).select(
        "vec_id", "cell", "pq_code"
    )

    def canon(codes_df):
        out = ann_join_topk(
            codes_df, cents, books, probes, raw=emb, k=5, nprobe=3,
            refine=4, whiten=W,
        )
        return sorted(
            (r.probe_id, r.vec_id, r.dist, r["rank"]) for r in out.collect()
        )

    assert canon(byte_codes) == canon(packed)


def test_whiten_refusals(spark, wh_model, tmp_path):
    emb, W, cents, books = wh_model
    dim = cents.shape[1]
    probes = emb.limit(2).select(
        F.col("vec_id").alias("probe_id"),
        F.col("embedding").cast("array<double>").alias("probe_vec"),
    )
    codes = ivfpq_encode(emb, cents, books, whiten=W).select(
        "vec_id", "cell", "pq_code"
    )
    # whiten x imi: no whitened training path for the product model
    halves = (np.zeros((2, dim // 2)), np.zeros((2, dim // 2)))
    with pytest.raises(ValueError, match="whiten does not compose"):
        ann_join_topk(
            codes, None, books, probes, raw=emb, imi=halves, whiten=W
        )
    # shape guards on both encode and serve
    with pytest.raises(ValueError, match="codebooks cover dim"):
        ivfpq_encode(emb, cents, books, whiten=np.eye(dim - 1))
    with pytest.raises(ValueError, match="codebooks cover dim"):
        ann_join_topk(
            codes, cents, books, probes, raw=emb, whiten=np.eye(dim - 1)
        )


def test_codes_snapshot_whiten_is_model_identity(spark, wh_model, tmp_path):
    """The whitening matrix is model state: a view bootstrapped under
    W must refuse an unwhitened resume (and vice versa) exactly like a
    retrained model — mixed-geometry codes would serve silently wrong
    ADC values."""
    from lightweight_vector_database_spark.plans.ann_maintenance import (
        CodesSnapshot,
    )
    from lightweight_vector_database_spark.sources.delta_snapshots import (
        DeltaSnapshotStore,
    )

    emb, W, cents, books = wh_model
    base = DeltaSnapshotStore(spark, str(tmp_path / "base"))
    base.commit_full(emb.filter(F.col("vec_id") < 200))
    view = DeltaSnapshotStore(spark, str(tmp_path / "codes"))
    cs = CodesSnapshot(base, view, cents, books, whiten=W)
    cs.refresh()
    # same model + same W resumes fine
    CodesSnapshot(base, view, cents, books, whiten=W)
    with pytest.raises(ValueError, match="different model"):
        CodesSnapshot(base, view, cents, books)  # W dropped
    with pytest.raises(ValueError, match="whiten does not compose"):
        dim = cents.shape[1]
        CodesSnapshot(
            base, DeltaSnapshotStore(spark, str(tmp_path / "c2")),
            None, books,
            imi=(np.zeros((2, dim // 2)), np.zeros((2, dim // 2))),
            whiten=W,
        )
