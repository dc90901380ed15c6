"""Two-level (IMI) coarse quantizer: product-decomposed cells for the
batched ANN join — the 100 TB model-shipping form (VERDICT r9 design
note; Babenko & Lempitsky, "The Inverted Multi-Index", CVPR 2012).

The contracts pinned here:
- product-cell assignment decomposes EXACTLY into per-half argmins
  (same first-index tie-break as the flat argmin over the
  materialized product-centroid matrix);
- ann_join_topk(imi=...) returns the same rows as the flat path
  served with the materialized matrix over the same codes snapshot;
- the recall contract against the exact ground truth holds;
- the model the IMI path ships is O((K1+K2) x dim/2) vs the flat
  path's O(K1*K2 x dim) — a 65,536-cell model from two 32 KB halves.
"""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from lightweight_vector_database_spark.operators.similarity import (
    imi_encode,
    imi_product_centroids,
    train_imi,
    train_imi_np,
)
from lightweight_vector_database_spark.plans.ann_join import ann_join_topk


def _clustered(spark, n_rows: int, dim: int, n_clusters: int = 16):
    rng = np.random.RandomState(11)
    centers = rng.uniform(-0.4, 0.4, (n_clusters, dim))
    centers_df = spark.createDataFrame(
        [(int(c), centers[c].tolist()) for c in range(n_clusters)],
        "cluster int, center array<double>",
    )
    base = spark.range(n_rows).select(
        F.col("id").alias("vec_id"),
        (F.col("id") % n_clusters).cast("int").alias("cluster"),
    )
    noise = F.transform(
        F.sequence(F.lit(1), F.lit(dim)),
        lambda i: 0.03 * F.sin((F.col("vec_id") + 1) * i.cast("double") * 0.9),
    )
    return base.join(F.broadcast(centers_df), "cluster").select(
        "vec_id",
        F.zip_with(
            F.col("center"), noise, lambda c, nz: c + nz
        ).alias("embedding"),
    )


def test_imi_assignment_decomposes_exactly():
    """cell = a1*K2 + a2 from per-half argmins equals the flat argmin
    over the materialized product-centroid matrix, including the
    first-index tie-break (a duplicated half centroid forces ties)."""
    rng = np.random.RandomState(7)
    dim, k1, k2 = 12, 5, 4
    sample = rng.standard_normal((500, dim))
    c1, c2, _books = train_imi_np(sample, k1=k1, k2=k2, m=4, ksub=16, iters=3)
    # plant an exact duplicate in each half codebook -> product ties
    c1[k1 - 1] = c1[0]
    c2[k2 - 1] = c2[1]
    dh = dim // 2
    X = rng.standard_normal((300, dim))
    d1 = ((X[:, None, :dh] - c1[None, :, :]) ** 2).sum(axis=2)
    d2 = ((X[:, None, dh:] - c2[None, :, :]) ** 2).sum(axis=2)
    via_halves = d1.argmin(axis=1) * k2 + d2.argmin(axis=1)
    prod = imi_product_centroids(c1, c2)
    # flat distances computed with the SAME per-half decomposition the
    # serving kernel uses (d1[c1] + d2[c2]) so ties are bit-real
    flat = d1[:, np.arange(k1 * k2) // k2] + d2[:, np.arange(k1 * k2) % k2]
    assert prod.shape == (k1 * k2, dim)
    np.testing.assert_array_equal(via_halves, flat.argmin(axis=1))


def test_imi_join_matches_flat_path_and_recall(spark):
    """End-to-end: imi_encode + ann_join_topk(imi=(c1, c2)) returns
    the SAME rows as the flat path served with the materialized
    product-centroid matrix over the same codes snapshot, and clears
    the recall contract vs the exact ground truth. refine covers the
    ~250-row clusters: within a cluster the true top-5 differ only by
    noise-scale gaps that m=4 PQ cannot rank (the refine-bound regime
    BASELINE.md r10 documents), so the candidate budget k*refine must
    reach cluster size for the exact re-rank to recover them."""
    from lightweight_vector_database_spark.operators.knn import (
        knn_join_blocks,
    )

    dim, k = 16, 5
    base = _clustered(spark, 4000, dim).cache()
    c1, c2, books = train_imi(
        base, k1=8, k2=8, m=4, ksub=32, iters=4,
        sample_rows=2048, sample_id_col="vec_id",
    )
    codes = imi_encode(base, c1, c2, books).select(
        "vec_id", "cell", "pq_code"
    ).cache()
    probes = base.filter(F.col("vec_id") < 40).select(
        F.col("vec_id").alias("probe_id"),
        F.col("embedding").cast("array<double>").alias("probe_vec"),
    )
    imi_out = {
        (r.probe_id, r.rank): (r.vec_id, round(r.dist, 9))
        for r in ann_join_topk(
            codes, None, books, probes, raw=base, k=k, nprobe=8,
            refine=50, imi=(c1, c2),
        ).collect()
    }
    flat_out = {
        (r.probe_id, r.rank): (r.vec_id, round(r.dist, 9))
        for r in ann_join_topk(
            codes, imi_product_centroids(c1, c2), books, probes,
            raw=base, k=k, nprobe=8, refine=50,
        ).collect()
    }
    assert len(imi_out) == 40 * k
    assert imi_out == flat_out
    # recall vs exact ground truth
    want = {}
    for r in knn_join_blocks(probes, base, k).collect():
        want.setdefault(r.probe_id, set()).add(r.vec_id)
    got = {}
    for (pid, _rk), (vid, _d) in imi_out.items():
        got.setdefault(pid, set()).add(vid)
    recs = [len(got[p] & want[p]) / k for p in want]
    assert sum(recs) / len(recs) >= 0.9, sum(recs) / len(recs)
    base.unpersist()
    codes.unpersist()


def test_imi_filtered_and_adaptive(spark):
    """The predicate + adaptive machinery composes with the IMI
    model: pred filters the codes snapshot (filter-then-retrieve),
    the displaced-home signal comes from the per-half argmins, and
    every probe answers k rows satisfying the predicate."""
    dim, k = 16, 5
    base = _clustered(spark, 3000, dim).cache()
    c1, c2, books = train_imi(
        base, k1=6, k2=6, m=4, ksub=32, iters=3,
        sample_rows=2048, sample_id_col="vec_id",
    )
    codes = imi_encode(base, c1, c2, books).select(
        "vec_id", "cell", "pq_code"
    )
    probes = base.filter(F.col("vec_id") < 30).select(
        F.col("vec_id").alias("probe_id"),
        F.col("embedding").cast("array<double>").alias("probe_vec"),
    )
    out = ann_join_topk(
        codes, None, books, probes, raw=base, k=k, nprobe=4, refine=4,
        imi=(c1, c2), pred=F.col("vec_id") % 2 == 0, adaptive=True,
    ).collect()
    per = {}
    for r in out:
        per.setdefault(r.probe_id, []).append(r.vec_id)
    assert len(per) == 30
    assert all(len(v) == k for v in per.values())
    assert all(v % 2 == 0 for vs in per.values() for v in vs)
    base.unpersist()


def test_imi_model_shipping_shape():
    """The 100 TB pin: a 65,536-cell coarse model ships as two
    (256 x dim/2) halves — 256x less model state than the flat
    matrix, with the product matrix never materialized on the IMI
    serving path (ann_join_topk(imi=...) receives ONLY the halves)."""
    rng = np.random.RandomState(5)
    dim = 64
    sample = rng.standard_normal((4000, dim))
    c1, c2, _books = train_imi_np(sample, k1=256, k2=256, m=8, ksub=16,
                                  iters=1)
    flat_bytes = 256 * 256 * dim * 8
    imi_bytes = c1.nbytes + c2.nbytes
    assert imi_bytes * 200 < flat_bytes  # 256x in fact
    assert c1.shape == (256, dim // 2) and c2.shape == (256, dim // 2)


def test_imi_validates_shapes():
    rng = np.random.RandomState(1)
    c1 = rng.standard_normal((4, 8))
    c2 = rng.standard_normal((4, 8))
    books = rng.standard_normal((4, 8, 3))  # covers dim 12 != 16
    import pyspark.sql

    with pytest.raises(ValueError, match="imi halves"):
        ann_join_topk(None, None, books, None, raw=None, imi=(c1, c2))
    with pytest.raises(ValueError, match="centroids=None"):
        ann_join_topk(
            None, np.zeros((4, 16)), np.zeros((4, 8, 2)), None,
            raw=None, imi=(c1, c2),
        )
