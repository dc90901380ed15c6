"""Round-7 pipeline ops, eighth batch: MMR diversified retrieval."""

from __future__ import annotations

import pytest

from lightweight_vector_database_spark.operators.knn import knn
from lightweight_vector_database_spark.operators.retrieval import mmr_select


def _emb(spark, rows):
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


def test_mmr_first_pick_is_nearest_and_rest_diversify(spark):
    """Probe at origin; a tight clump of near-duplicates right next to
    it plus one farther-but-distinct point. Plain top-3 is the clump;
    MMR keeps the nearest clump member then jumps to the distinct
    point."""
    rows = [
        (1, [0.10, 0.0]),
        (2, [0.11, 0.0]),   # near-duplicate of 1
        (3, [0.12, 0.0]),   # near-duplicate of 1
        (4, [0.0, 2.0]),    # farther, but diverse
    ]
    df = _emb(spark, rows)
    probe = [0.0, 0.0]
    plain = [r["vec_id"] for r in knn(df, probe, 3, metric="euclidean_sq").collect()]
    assert plain == [1, 2, 3]
    out = sorted(
        (r["step"], r["vec_id"])
        for r in mmr_select(
            df, probe, 3, pool=4,
            relevance_weight=0.3, diversity_weight=0.7,
        ).collect()
    )
    assert out[0] == (1, 1)          # step 1 = plain nearest
    assert out[1][1] == 4            # step 2 jumps to the diverse point


def test_mmr_pure_relevance_when_diversity_zero(spark):
    rows = [(i, [float(i), 0.0]) for i in range(1, 7)]
    df = _emb(spark, rows)
    out = mmr_select(
        df, [0.0, 0.0], 3, pool=6,
        relevance_weight=1.0, diversity_weight=0.0,
    ).collect()
    assert sorted((r["step"], r["vec_id"]) for r in out) == [
        (1, 1), (2, 2), (3, 3)
    ]


def test_mmr_validates_pool(spark):
    df = _emb(spark, [(1, [0.0])])
    with pytest.raises(ValueError):
        mmr_select(df, [0.0], k=3, pool=2)


def test_mmr_returns_k_distinct_steps(spark):
    rows = [(i, [float(i % 5), float(i % 3)]) for i in range(1, 21)]
    out = mmr_select(_emb(spark, rows), [0.0, 0.0], 5, pool=10).collect()
    assert sorted(r["step"] for r in out) == [1, 2, 3, 4, 5]
    assert len({r["vec_id"] for r in out}) == 5
