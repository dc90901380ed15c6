"""Metric expressions vs numpy on random vectors (property-style,
seeded), the custom-metric registry, and the full-matrix Mahalanobis
pandas_udf escape hatch."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from lightweight_vector_database_spark.functions import distance as dist


@pytest.fixture(scope="module")
def vec_df(spark):
    rng = np.random.RandomState(7)
    rows = [(i, rng.uniform(-1, 1, 16).astype(np.float32).tolist()) for i in range(50)]
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>"), rows


PROBE16 = [round(x, 6) for x in np.random.RandomState(9).uniform(-1, 1, 16)]


@pytest.mark.parametrize(
    "name,np_fn",
    [
        ("euclidean_sq", lambda v, p: ((v - p) ** 2).sum()),
        ("manhattan", lambda v, p: np.abs(v - p).sum()),
        ("chebyshev", lambda v, p: np.abs(v - p).max()),
        ("dot", lambda v, p: (v * p).sum()),
        (
            "cosine",
            lambda v, p: 1.0
            - (v * p).sum() / (np.sqrt((v * v).sum()) * np.sqrt((p * p).sum())),
        ),
    ],
)
def test_metric_matches_numpy(vec_df, name, np_fn):
    df, rows = vec_df
    out = {
        r.vec_id: r.d
        for r in df.select(
            "vec_id", dist.metric_expr(name, "embedding", PROBE16).alias("d")
        ).collect()
    }
    p = np.asarray(PROBE16)
    for i, emb in rows:
        v = np.asarray(emb, dtype=np.float64)
        np.testing.assert_allclose(out[i], np_fn(v, p), rtol=1e-6)


def test_mahalanobis_diag_matches_numpy(vec_df):
    df, rows = vec_df
    w = [1.0 + (i % 3) * 0.25 for i in range(16)]
    out = {
        r.vec_id: r.d
        for r in df.select(
            "vec_id",
            dist.mahalanobis_diag("embedding", PROBE16, w).alias("d"),
        ).collect()
    }
    p, wv = np.asarray(PROBE16), np.asarray(w)
    for i, emb in rows:
        v = np.asarray(emb, dtype=np.float64)
        np.testing.assert_allclose(out[i], (((v - p) ** 2) * wv).sum(), rtol=1e-6)


def test_mahalanobis_full_udf(vec_df):
    df, rows = vec_df
    rng = np.random.RandomState(3)
    a = rng.uniform(-1, 1, (16, 16))
    cov = a @ a.T + 16 * np.eye(16)
    inv = np.linalg.inv(cov)
    builder = dist.mahalanobis_full_udf(inv)
    out = {
        r.vec_id: r.d
        for r in df.select("vec_id", builder("embedding", PROBE16).alias("d")).collect()
    }
    p = np.asarray(PROBE16)
    for i, emb in rows[:10]:
        v = np.asarray(emb, dtype=np.float64)
        d = v - p
        np.testing.assert_allclose(out[i], d @ inv @ d, rtol=1e-6)


def test_mahalanobis_factor_expr(vec_df):
    # codegen factor path == numpy d^T S^-1 d for an arbitrary dense
    # inverse covariance, factored once on the driver: inv = C C^T
    # (numpy Cholesky) and dist = ||C^T d||^2
    df, rows = vec_df
    rng = np.random.RandomState(3)
    a = rng.uniform(-1, 1, (16, 16))
    cov = a @ a.T + 16 * np.eye(16)
    inv = np.linalg.inv(cov)
    factor = np.linalg.cholesky(inv).T.tolist()
    out = {
        r.vec_id: r.d
        for r in df.select(
            "vec_id",
            dist.mahalanobis_factor("embedding", PROBE16, factor).alias("d"),
        ).collect()
    }
    p = np.asarray(PROBE16)
    for i, emb in rows[:10]:
        v = np.asarray(emb, dtype=np.float64)
        d = v - p
        np.testing.assert_allclose(out[i], d @ inv @ d, rtol=1e-6)


def test_mahalanobis_factor_diag_reduction(vec_df):
    # L = diag(sqrt(w))  =>  factor metric == diagonal metric exactly
    df, _ = vec_df
    w = [1.0 + (i % 4) * 0.5 for i in range(16)]
    factor = np.diag(np.sqrt(w)).tolist()
    out = df.select(
        dist.mahalanobis_factor("embedding", PROBE16, factor).alias("f"),
        dist.mahalanobis_diag("embedding", PROBE16, w).alias("d"),
    ).collect()
    for r in out:
        np.testing.assert_allclose(r.f, r.d, rtol=1e-12)


def test_custom_metric_registration(vec_df):
    df, rows = vec_df

    def hamming_signs(a, b):
        # custom metric: count of coordinates with differing sign
        signs = F.zip_with(
            dist._as_double(a),
            dist._coerce(b),
            lambda x, y: F.when((x > 0) != (y > 0), 1.0).otherwise(0.0),
        )
        return F.aggregate(signs, F.lit(0.0), lambda acc, v: acc + v)

    dist.register_metric("sign_hamming", hamming_signs)
    try:
        out = df.select(
            "vec_id", dist.metric_expr("sign_hamming", "embedding", PROBE16).alias("d")
        ).collect()
        p = np.asarray(PROBE16)
        got = {r.vec_id: r.d for r in out}
        for i, emb in rows[:10]:
            v = np.asarray(emb, dtype=np.float64)
            assert got[i] == float(((v > 0) != (p > 0)).sum())
    finally:
        dist.METRICS.pop("sign_hamming", None)
