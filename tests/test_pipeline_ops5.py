"""Round-7 pipeline ops, fifth batch: k-means, MaxSim,
decontamination."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from lightweight_vector_database_spark.operators.kmeans import (
    assign_clusters,
    kmeans_fixed,
)
from lightweight_vector_database_spark.operators.retrieval import maxsim_score
from lightweight_vector_database_spark.operators.substring_dedup import (
    decontaminate_by_windows,
)


# --- k-means -------------------------------------------------------------------


def _vec_df(spark, rows):
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


def test_kmeans_separates_planted_clusters(spark):
    """Two tight planted blobs: 3 rounds land one centroid per blob
    with the right sizes regardless of the id-ordered init."""
    near_a = [[0.0 + i * 0.01, 0.0] for i in range(5)]
    near_b = [[10.0 + i * 0.01, 10.0] for i in range(4)]
    rows = [(i, v + [0.0] * 62) for i, v in enumerate(near_a + near_b)]
    out = kmeans_fixed(_vec_df(spark, rows), k=2, iters=3, dim=64).collect()
    sizes = sorted(r["n"] for r in out)
    assert sizes == [4, 5]
    norms = sorted(r["cnorm"] for r in out)
    assert norms[0] == pytest.approx(0.02, abs=0.01)      # blob at origin
    assert norms[1] == pytest.approx(14.16, abs=0.05)     # blob at (10,10)


def test_assign_clusters_tie_breaks_to_smaller_label(spark):
    df = _vec_df(spark, [(1, [0.5, 0.0] + [0.0] * 62)])
    cents = [(0, [0.0] * 64), (1, [1.0] + [0.0] * 63)]
    assert assign_clusters(df, cents).collect()[0]["j"] == 0


def test_kmeans_validates_args(spark):
    df = _vec_df(spark, [(1, [0.0] * 64)])
    with pytest.raises(ValueError):
        kmeans_fixed(df, k=0, iters=1)
    with pytest.raises(ValueError):
        kmeans_fixed(df, k=5, iters=1)  # k > row count


def test_kmeans_sizes_sum_to_input(spark):
    rows = [(i, [float((i * 7) % 5), float(i % 3)] + [0.0] * 62)
            for i in range(30)]
    out = kmeans_fixed(_vec_df(spark, rows), k=4, iters=2, dim=64).collect()
    assert sum(r["n"] for r in out) == 30
    assert len({r["j"] for r in out}) == len(out)


# --- MaxSim ---------------------------------------------------------------------


def test_maxsim_hand_computed(spark):
    rows = [
        (1, "g1", [1.0, 0.0]),
        (2, "g1", [0.0, 1.0]),
        (3, "g2", [0.5, 0.5]),
    ]
    df = spark.createDataFrame(
        rows, "vec_id long, label string, embedding array<float>"
    )
    q = [[2.0, 0.0], [0.0, 4.0]]
    out = {r["label"]: r["maxsim"] for r in maxsim_score(df, q, "label").collect()}
    # g1: max dot(q1)=2 (row1), max dot(q2)=4 (row2) -> 6
    # g2: dot(q1)=1, dot(q2)=2 -> 3
    assert out == {"g1": pytest.approx(6.0), "g2": pytest.approx(3.0)}


def test_maxsim_requires_queries(spark):
    df = spark.createDataFrame(
        [(1, "g", [0.0])], "vec_id long, label string, embedding array<float>"
    )
    with pytest.raises(ValueError):
        maxsim_score(df, [], "label")


# --- decontamination --------------------------------------------------------------


def test_decontaminate_flags_only_overlapping_docs(spark):
    held = spark.createDataFrame(
        [(100, "the quick brown fox jumps over dogs")],
        "doc_id long, text string",
    )
    corpus = spark.createDataFrame(
        [
            (1, "prefix the quick brown fox jumps over dogs suffix"),  # hit
            (2, "quick brown fox but then it diverges entirely here"),  # no 4-window
            (3, "completely unrelated text with no overlap at all"),
        ],
        "doc_id long, text string",
    )
    out = {
        r["doc_id"]: (r["n_hits"], r["n_windows"])
        for r in decontaminate_by_windows(corpus, held, 4).collect()
    }
    assert set(out) == {1}
    # held doc has 4 windows of width 4; corpus doc 1 contains all of them
    assert out[1] == (4, 6)


def test_decontaminate_ratio_and_full_containment(spark):
    held = spark.createDataFrame(
        [(9, "a b c d")], "doc_id long, text string"
    )
    corpus = spark.createDataFrame(
        [(1, "a b c d")], "doc_id long, text string"
    )
    r = decontaminate_by_windows(corpus, held, 4).collect()[0]
    assert (r["n_hits"], r["n_windows"], r["hit_ratio"]) == (1, 1, 1.0)
