"""ANN tier guard (operators/tiering, VERDICT r7 item 2).

The r7 baseline measured the failure: tight UNNORMALIZED clusters make
every cluster member share one sign pattern, so the 1-bit Hamming
tier's recall collapses while SQ8 holds. The guard must turn that
measurement into refusal — on the clustered fixture Hamming is
refused and SQ8 selected; on geometry where no tier clears the floor
the guard returns "exact" instead of silently serving garbage.
"""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from lightweight_vector_database_spark.operators.tiering import (
    TIER_PREFERENCE,
    choose_ann_tier,
    seeded_probe_rows,
    tier_report,
)
from lightweight_vector_database_spark.sources import load_table

DIM = 64
N_CLUSTERS = 16


@pytest.fixture(scope="module")
def clustered(spark):
    """The r7 baseline's hard fixture shape (tools/scale_test.generate
    at test size): tight clusters around random unnormalized centers —
    the geometry where 1-bit sign quantization cannot separate
    neighbors within a cluster."""
    rng = np.random.RandomState(5)
    centers = rng.uniform(-0.35, 0.35, (N_CLUSTERS, DIM))
    centers_df = spark.createDataFrame(
        [(int(c), centers[c].tolist()) for c in range(N_CLUSTERS)],
        "cluster int, center array<double>",
    )
    base = spark.range(20_000).select(
        F.col("id").alias("vec_id"),
        (F.col("id") % N_CLUSTERS).cast("int").alias("cluster"),
    )
    noise = F.transform(
        F.sequence(F.lit(1), F.lit(DIM)),
        lambda i: 0.05 * F.sin((F.col("vec_id") + 1) * i.cast("double") * 0.7),
    )
    joined = base.join(F.broadcast(centers_df), "cluster")
    vec = F.zip_with(F.col("center"), noise, lambda c, nz: c + nz).cast(
        "array<float>"
    )
    return joined.select("vec_id", vec.alias("embedding")).cache()


def test_guard_refuses_hamming_on_clustered_fixture(spark, clustered):
    rep = {r["tier"]: r for r in tier_report(clustered, floor=0.8).collect()}
    assert set(rep) == set(TIER_PREFERENCE)
    # the r7 measurement, reproduced: 1-bit recall collapses, SQ8 holds
    assert rep["hamming"]["recall"] < 0.5
    assert rep["sq8"]["recall"] >= 0.8
    assert not rep["hamming"]["chosen"]
    assert rep["sq8"]["chosen"]
    assert choose_ann_tier(clustered, floor=0.8) == "sq8"


def test_guard_falls_back_to_exact_when_nothing_clears(spark, clustered):
    # an impossible floor: every quantized tier refused -> exact
    assert choose_ann_tier(clustered, floor=1.01) == "exact"
    rep = tier_report(clustered, floor=1.01).collect()
    assert not any(r["chosen"] for r in rep)


def test_guard_prefers_cheapest_passing_tier(spark, sf_dir):
    """On the uniform embeddings fixture both tiers clear a modest
    floor; the guard must pick the FIRST preference (hamming — the
    16x-smaller candidate scan), not the best recall."""
    emb = load_table(spark, sf_dir, "embeddings")
    rep = {r["tier"]: r for r in tier_report(emb, floor=0.5).collect()}
    if rep["hamming"]["recall"] >= 0.5:  # fixture-dependent guard
        assert rep["hamming"]["chosen"] and not rep["sq8"]["chosen"]
        assert choose_ann_tier(emb, floor=0.5) == "hamming"


def test_seeded_probes_deterministic_and_validation(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    a = seeded_probe_rows(emb, 5)
    b = seeded_probe_rows(emb, 5)
    assert [p for p, _ in a] == [p for p, _ in b] and len(a) == 5
    with pytest.raises(ValueError, match="candidates >= k"):
        tier_report(emb, k=10, candidates=5)
