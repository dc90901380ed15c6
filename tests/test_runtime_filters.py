"""Runtime scan-reduction machinery: dynamic partition pruning (DPP)
and runtime bloom-filter join pruning.

Neither changes results — both are pure scan reducers that only matter
at scale, so the tests assert on the PLAN (the pruning operators are
present) and on result equality with the unpruned query. At 100 TB
these are the difference between scanning a partition's worth of a
fact table and scanning all of it.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from lightweight_vector_database_spark.sources import load_table


@pytest.fixture(scope="module")
def tmp(tmp_path_factory):
    return str(tmp_path_factory.mktemp("rtf"))


def test_dynamic_partition_pruning(spark, sf_dir, tmp):
    # fact table partitioned by a date column; join against a filtered
    # dim must prune fact partitions at RUNTIME via the dim's join keys
    # (the filter is on the dim, so static pruning can't see it).
    ev = load_table(spark, sf_dir, "events").withColumn(
        "day", F.date_format(F.col("ts"), "yyyy-MM-dd")
    )
    fact_path = f"{tmp}/events_by_day"
    ev.write.mode("overwrite").partitionBy("day").parquet(fact_path)
    fact = spark.read.parquet(fact_path)

    all_days = [r.day for r in fact.select("day").distinct().orderBy("day").collect()]
    dim = spark.createDataFrame(
        [(d, "keep" if i < 2 else "drop") for i, d in enumerate(all_days)],
        "day string, tag string",
    )

    joined = fact.join(dim.filter(F.col("tag") == "keep"), "day").groupBy(
        "day"
    ).agg(F.count(F.lit(1)).alias("n"))

    plan = joined._jdf.queryExecution().executedPlan().toString()
    assert "dynamicpruning" in plan.lower(), plan[:2000]

    # pruning must not change results: equal to a manual IN-filter
    keep = set(all_days[:2])
    expected = {
        (r.day, r.n)
        for r in fact.filter(F.col("day").isin(sorted(keep)))
        .groupBy("day")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert {(r.day, r.n) for r in joined.collect()} == expected
    assert len(expected) == 2


def test_runtime_bloom_filter_join(spark, sf_dir):
    # a selective non-broadcast join should inject a bloom filter on
    # the probe side (thresholds lowered so the local fixture triggers
    # the same path a TB-scale join takes by default).
    confs = {
        "spark.sql.optimizer.runtime.bloomFilter.enabled": "true",
        "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold": "10MB",
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "0",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.autoBroadcastJoinThreshold": "-1",
    }
    old = {k: spark.conf.get(k, None) for k in confs}
    try:
        for k, v in confs.items():
            spark.conf.set(k, v)
        li = load_table(spark, sf_dir, "lineitem")
        orders = load_table(spark, sf_dir, "orders").filter(
            F.col("o_totalprice") > 400000
        )
        joined = li.join(orders, li.l_orderkey == orders.o_orderkey).groupBy(
            "o_orderpriority"
        ).agg(F.count(F.lit(1)).alias("n"))
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "bloom" in plan.lower(), plan[:2000]
        # and it's a pure optimization: equal to the unfiltered-path result
        n_bloom = {(r.o_orderpriority, r.n) for r in joined.collect()}
    finally:
        for k, v in old.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_totalprice") > 400000
    )
    base = li.join(orders, li.l_orderkey == orders.o_orderkey).groupBy(
        "o_orderpriority"
    ).agg(F.count(F.lit(1)).alias("n"))
    assert {(r.o_orderpriority, r.n) for r in base.collect()} == n_bloom
