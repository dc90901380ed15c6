"""Plan-shape regression locks: the properties that make queries
scale are asserted here so a refactor can't silently lose them.
PLANS.md documents the full audit; these are the load-bearing few.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from lightweight_vector_database_spark.suite import QUERIES


def _plan(spark, sf_dir, name: str) -> str:
    return (
        QUERIES[name](spark, sf_dir)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )


def test_knn_filtered_pushes_predicate_and_prunes_columns(spark, sf_dir):
    plan = _plan(spark, sf_dir, "knn_filtered")
    # metadata predicate reaches the parquet scan
    assert "PushedFilters: [" in plan and "label" in plan.split("PushedFilters")[1][:200]
    # top-k is TakeOrderedAndProject, not a global sort
    assert "TakeOrderedAndProject" in plan
    # JVM-only: no Python boundary in the flagship path
    assert "Python" not in plan and "Arrow" not in plan


def test_q1_aggregation_is_partial_then_final(spark, sf_dir):
    plan = _plan(spark, sf_dir, "q1_pricing_summary")
    # map-side combine: two HashAggregates around one Exchange
    assert plan.count("HashAggregate") >= 2
    assert plan.count("Exchange") == 1
    assert "PushedFilters" in plan  # shipdate filter at the scan


def test_q3_broadcasts_dimensions(spark, sf_dir):
    plan = _plan(spark, sf_dir, "q3_top_revenue_orders")
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan  # dims are broadcast at this scale
    assert "TakeOrderedAndProject" in plan


def test_contamination_join_stays_jvm_side(spark, sf_dir):
    plan = _plan(spark, sf_dir, "curation_contamination")
    assert "Python" not in plan and "Arrow" not in plan
    assert "BroadcastHashJoin" in plan  # test side broadcast


def test_scan_reads_only_needed_columns(spark, sf_dir):
    # column pruning: q1 reads lineitem but must not read l_partkey /
    # l_suppkey / l_orderkey (not referenced by the query)
    plan = _plan(spark, sf_dir, "q1_pricing_summary")
    read_schema = plan.split("ReadSchema:")[1].splitlines()[0]
    for unused in ("l_partkey", "l_suppkey", "l_orderkey"):
        assert unused not in read_schema
    for used in ("l_quantity", "l_extendedprice", "l_discount"):
        assert used in read_schema
