"""Round-7 pipeline ops, tenth batch: plain + filtered IVF serving."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from lightweight_vector_database_spark.operators.knn import knn
from lightweight_vector_database_spark.operators.similarity import (
    ivf_assign,
    ivf_search,
    train_centroids,
)


@pytest.fixture(scope="module")
def emb(spark):
    from lightweight_vector_database_spark.sources import load_table

    return load_table(spark, "/root/testdata/sf0.001", "embeddings")


@pytest.fixture(scope="module")
def assigned(spark, emb):
    cents = train_centroids(
        emb, n_centroids=8, iters=5, sample_rows=2048, sample_id_col="vec_id"
    )
    return ivf_assign(emb, cents), cents


def test_ivf_filtered_matches_brute_at_full_nprobe(spark, emb, assigned):
    """With nprobe covering every cell, filtered IVF == filtered brute
    kNN exactly (pre-filter semantics on both paths)."""
    adf, cents = assigned
    probe = [((i * 5) % 13 - 6) / 7.0 for i in range(64)]
    got = [
        (r["vec_id"], round(r["dist"], 6))
        for r in ivf_search(
            adf, cents, probe, k=5, nprobe=len(cents),
            pred=F.col("label") < 5,
        ).collect()
    ]
    want = [
        (r["vec_id"], round(r["dist"], 6))
        for r in knn(
            emb, probe, 5, metric="euclidean_sq", pred=F.col("label") < 5
        ).collect()
    ]
    assert got == want


def test_ivf_filtered_results_all_satisfy_pred(spark, assigned):
    adf, cents = assigned
    probe = [((i * 11) % 7 - 3) / 5.0 for i in range(64)]
    rows = ivf_search(
        adf, cents, probe, k=10, nprobe=2, pred=F.col("label") < 3
    ).collect()
    assert rows and all(r["label"] < 3 for r in rows)


def test_ivf_subset_of_probed_cells(spark, assigned):
    adf, cents = assigned
    probe = [0.0] * 64
    rows = ivf_search(adf, cents, probe, k=20, nprobe=2).collect()
    assert len({r["cell"] for r in rows}) <= 2


def test_ivf_filtered_routes_to_qualifying_cells(spark):
    """A predicate CORRELATED with the cell geometry empties the
    probe's nearest cells entirely — every matching row lives in the
    FARTHEST cell. Qualifying-cell routing (r9) must find them; the
    pre-r9 inside-the-probed-cells filter starves."""
    import numpy as np

    cents = np.array([[0.0, 0.0], [10.0, 0.0], [0.0, 10.0], [10.0, 10.0]])
    rows = []
    for c, (cx, cy) in enumerate(cents):
        for j in range(5):
            rows.append(
                (c * 5 + j, 1 if c == 3 else 0,
                 [float(cx + 0.1 * j), float(cy)])
            )
    df = spark.createDataFrame(
        rows, "vec_id long, label int, embedding array<float>"
    )
    adf = ivf_assign(df, cents)
    probe = [0.0, 0.0]
    pred = F.col("label") == 1

    got = [
        (r["vec_id"], round(r["dist"], 6))
        for r in ivf_search(adf, cents, probe, k=3, nprobe=1, pred=pred).collect()
    ]
    want = [
        (r["vec_id"], round(r["dist"], 6))
        for r in knn(df, probe, 3, metric="euclidean_sq", pred=pred).collect()
    ]
    assert got == want and len(got) == 3

    # the pre-r9 hole, kept reachable for comparison: the single
    # nearest cell holds no matching row, so the search returns nothing
    assert (
        ivf_search(
            adf, cents, probe, k=3, nprobe=1, pred=pred, qualify=False
        ).collect()
        == []
    )

    # precomputed per-predicate stats (the serving path) skip the
    # qualification aggregate and route identically
    got_stats = [
        (r["vec_id"], round(r["dist"], 6))
        for r in ivf_search(
            adf, cents, probe, k=3, nprobe=1, pred=pred,
            filtered_cell_counts={0: 0, 1: 0, 2: 0, 3: 5},
        ).collect()
    ]
    assert got_stats == got


def test_knn_by_id_excludes_self_and_matches_probe_form(spark, emb):
    """Query-by-id == query-by-that-row's-vector, minus the row."""
    from lightweight_vector_database_spark.suite.pipeline_suite10 import (
        _MLT_ID,
        _knn_by_id,
    )

    out = _knn_by_id(spark, "/root/testdata/sf0.001").collect()
    assert all(r["vec_id"] != _MLT_ID for r in out)
    probe = [
        float(x)
        for x in emb.filter(F.col("vec_id") == _MLT_ID).collect()[0][
            "embedding"
        ]
    ]
    want = [
        r["vec_id"]
        for r in knn(
            emb, probe, 10, pred=F.col("vec_id") != _MLT_ID
        ).collect()
    ]
    assert [r["vec_id"] for r in out] == want


def test_knn_boosted_prefers_boosted_label_on_ties(spark):
    """Two equidistant vectors: the boosted label wins the ranking."""
    from lightweight_vector_database_spark.functions.distance import (
        metric_expr,
    )

    df = spark.createDataFrame(
        [
            (1, 9, [1.0, 0.0]),
            (2, 3, [-1.0, 0.0]),  # same distance, boosted label
        ],
        "vec_id long, label int, embedding array<float>",
    )
    dist = metric_expr("euclidean_sq", "embedding", [0.0, 0.0])
    score = dist - F.when(F.col("label") == 3, F.lit(0.25)).otherwise(
        F.lit(0.0)
    )
    top = (
        df.withColumn("s", score)
        .orderBy(F.col("s").asc(), F.col("vec_id").asc())
        .first()
    )
    assert top["vec_id"] == 2
