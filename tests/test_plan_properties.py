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


def test_q9_broadcasts_all_dimensions(spark, sf_dir):
    # part / supplier / nation are broadcast; only lineitem-keyed joins
    # may shuffle — no cartesian anywhere
    plan = _plan(spark, sf_dir, "q9_product_profit")
    assert plan.count("BroadcastHashJoin") >= 3
    assert "CartesianProduct" not in plan
    assert "Python" not in plan and "Arrow" not in plan


def test_q21_exists_becomes_count_aggregates(spark, sf_dir):
    # the double-correlated EXISTS / NOT EXISTS is rewritten to
    # per-order counts: no self-join of the pair set survives in the
    # plan (no semi/anti, no cartesian), and the pair aggregate runs
    # with a map-side partial (single-execution of the fact join is
    # asserted separately via ReusedExchange below)
    plan = _plan(spark, sf_dir, "q21_waiting_suppliers")
    assert "LeftSemi" not in plan
    assert "LeftAnti" not in plan
    assert "CartesianProduct" not in plan
    assert "partial_max" in plan or "partial_count" in plan


def test_q16_not_in_is_broadcast_anti_join(spark, sf_dir):
    # the negative-balance supplier exclusion is a tiny broadcast anti
    # join, not a shuffle
    plan = _plan(spark, sf_dir, "q16_supplier_part_counts")
    assert "BroadcastHashJoin" in plan and "LeftAnti" in plan


def test_random_projection_is_map_only(spark, sf_dir):
    # the JL projection must not shuffle and must stay JVM-side: it is
    # a pure per-row expression over the embedding column
    plan = _plan(spark, sf_dir, "embedding_random_projection")
    assert "Exchange" not in plan
    assert "Python" not in plan and "Arrow" not in plan


def test_grid_serving_scan_prunes_on_partition_column(spark, sf_dir):
    # the indexed snapshot is partitioned by cell_id, so the serving
    # scan must carry a partition filter (candidate IN-list), and the
    # depth-6 quantization expression must not appear in the plan
    from lightweight_vector_database_spark.suite.index_suite import (
        _indexed_snapshot,
        _INDEX,
        _PROBE,
    )
    from lightweight_vector_database_spark.plans.grid_index import knn_indexed

    snap, stats = _indexed_snapshot(spark, sf_dir)
    out = knn_indexed(snap, _INDEX, _PROBE, k=10, stats=stats)
    # serving collects eagerly and returns a local DataFrame; assert on
    # the scan it performed instead: candidate filter prunes partitions
    cand_scan = snap.filter(F.col("cell_id").isin(list(stats)[:3]))
    plan = cand_scan._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [" in plan and "cell_id" in plan.split(
        "PartitionFilters"
    )[1][:200]
    assert "floor" not in plan  # no quantization expression at serving


def test_q21_single_pass_window_counts(spark, sf_dir):
    # r8: the per-order counts are WINDOW aggregates over the pair
    # relation, not a groupBy + join-back. The previous form leaned on
    # ReusedExchange to dedupe the fact join, but the post-shuffle
    # aggregation and the pairs x per_order join still ran twice —
    # 53.3s at sf10 (60M lineitems); the window form is 9.8s. Pin the
    # shape: exactly ONE lineitem scan, a Window node, and no
    # self-join of the pair relation.
    df = QUERIES["q21_waiting_suppliers"](spark, sf_dir)
    df.collect()  # AQE finalizes the executed plan
    plan = df._jdf.queryExecution().executedPlan().toString()
    # AdaptiveSparkPlan prints the final AND the initial plan; count
    # scans in the final section only
    final = plan.split("== Initial Plan ==")[0]
    assert "Window" in final
    assert final.count("lineitem") == 1, final.count("lineitem")
    assert "ReusedExchange" not in final  # nothing left to duplicate


def test_salted_agg_is_two_level(spark, sf_dir):
    """agg_salted_customer_totals: the salted plan must show TWO
    aggregation levels — partial+final on (custkey, salt), then
    partial+final on custkey (4 HashAggregates, 2 Exchanges) — so the
    first shuffle hashes on (key, salt) and a hot key spreads over the
    salt buckets instead of landing on one reducer."""
    plan = _plan(spark, sf_dir, "agg_salted_customer_totals")
    assert plan.count("HashAggregate") >= 4
    assert plan.count("Exchange") >= 2
    assert "__salt" in plan  # the salt key participates in the first agg
    assert "Python" not in plan and "Arrow" not in plan


def test_resample_ffill_two_exchanges_no_join(spark, sf_dir):
    """The lead-span formulation must not regress to the naive
    grid-explode + join + fill shape (3rd exchange)."""
    plan = _plan(spark, sf_dir, "timeseries_resample_ffill")
    assert plan.count("Exchange") == 2
    assert "Join" not in plan
    assert "Python" not in plan


def test_profile_is_single_scan(spark, sf_dir):
    """ANALYZE-style profiler: one pass over the table — the exact
    multi-column distinct goes through Expand, never a scan per
    column."""
    plan = _plan(spark, sf_dir, "profile_lineitem")
    assert plan.count("Scan parquet") == 1
    assert "Expand" in plan
    assert "Python" not in plan


def test_zorder_box_read_pushes_ranges_to_stored_column(spark, sf_dir):
    """The z-range disjunction must reach the snapshot scan as pushed
    filters on the STORED zval column (the CollapseProject inlining
    regression recomputed it per comparison instead)."""
    plan = _plan(spark, sf_dir, "zorder_box_read")
    pushed = plan.split("PushedFilters")[1][:400] if "PushedFilters" in plan else ""
    assert "zval" in pushed
    assert "Python" not in plan


def test_bm25_filters_terms_before_shuffle(spark, sf_dir):
    """The exploded token stream is cut to the |Q| query terms on the
    MAP side: every term IN-filter must sit DIRECTLY on the explode
    (its child line is the Generate), i.e. before any shuffle of the
    token stream — not after an Exchange."""
    plan = _plan(spark, sf_dir, "bm25_top_docs")
    lines = plan.splitlines()
    hits = [
        i for i, ln in enumerate(lines)
        if "IN (vector,hash,broadcast,shuffle)" in ln
    ]
    assert hits, "term IN-filter not found in the plan"
    for i in hits:
        assert "Generate explode" in lines[i + 1], lines[i : i + 2]
    assert "Python" not in plan


def test_generate_filter_inference_stays_excluded(spark, sf_dir):
    """session.py excludes InferFiltersFromGenerate session-wide: the
    rule synthesizes `size(e) > 0 AND isnotnull(e)` from every
    explode(e) with the generator expression INLINED into both
    conjuncts — for the text operators e is the full n-gram/tokenize
    HOF pipeline, so the most expensive expression in the query ran up
    to twice more per row (OPTIMIZATION_r12.md measured bigram-LM
    7.8s -> 2.4s from the exclusion). This pins the tradeoff so a
    Spark upgrade or session refactor that silently re-enables the
    rule fails a test instead of re-paying the double evaluation."""
    assert "InferFiltersFromGenerate" in spark.conf.get(
        "spark.sql.optimizer.excludedRules", ""
    )
    # the observable plan shape: no inferred size(...) FILTER conjunct
    # under the bigram/tfidf Generates (size( appears legitimately in
    # the word_ngrams projection; the rule's signature is a Filter
    # node whose predicate inlines it)
    for name in ("text_bigram_perplexity", "tfidf_top_terms"):
        plan = (
            QUERIES[name](spark, sf_dir)
            ._jdf.queryExecution()
            .optimizedPlan()
            .toString()
        )
        offending = [
            ln
            for ln in plan.splitlines()
            if "Filter" in ln and "size(" in ln
        ]
        assert not offending, (name, offending[:2])
