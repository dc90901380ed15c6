"""Skew operators: salted plans must equal their unsalted twins on a
deliberately skewed dataset (one key owning 90% of rows)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def skewed(spark):
    # key 0 gets 9000 rows, keys 1..100 get 10 each
    hot = spark.range(9000).select(
        F.lit(0).alias("k"), (F.col("id") % 97).cast("double").alias("v")
    )
    cold = spark.range(1000).select(
        (F.col("id") % 100 + 1).alias("k"), (F.col("id") % 31).cast("double").alias("v")
    )
    return hot.unionByName(cold).cache()


def test_salted_agg_equals_plain(skewed):
    from lightweight_vector_database_spark.operators.skew import salted_agg

    plain = {
        (r.k): (r.n, r.total, r.mx)
        for r in skewed.groupBy("k")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("v").alias("total"),
            F.max("v").alias("mx"),
        )
        .collect()
    }
    salted = {
        (r.k): (r.n, r.total, r.mx)
        for r in salted_agg(
            skewed,
            ["k"],
            {
                "n": (F.count(F.lit(1)), F.sum("n")),
                "total": (F.sum("v"), F.sum("total")),
                "mx": (F.max("v"), F.max("mx")),
            },
        ).collect()
    }
    assert plain == salted


def test_salted_join_equals_plain(spark, skewed):
    from lightweight_vector_database_spark.operators.skew import salted_join

    dims = spark.range(101).select(
        F.col("id").alias("k"), F.concat(F.lit("dim_"), F.col("id")).alias("name")
    )
    plain = {
        (r.k, r.v, r.name)
        for r in skewed.join(dims, "k").collect()
    }
    salted = {
        (r.k, r.v, r.name)
        for r in salted_join(skewed, dims, ["k"], salt_buckets=4).collect()
    }
    assert plain == salted


def test_top_frequent_keys_finds_hot_key(skewed):
    from lightweight_vector_database_spark.operators.skew import top_frequent_keys

    hot = top_frequent_keys(skewed, "k", min_share=0.5, sample_fraction=0.2)
    assert hot == [0]


def test_salted_join_rejects_right_and_full(spark, skewed):
    # right/full would surface unmatched right rows once per salt bucket
    from lightweight_vector_database_spark.operators.skew import salted_join

    dims = spark.range(5).select(F.col("id").alias("k"))
    for how in ("right", "full", "full_outer", "right_outer"):
        with pytest.raises(ValueError, match="salted_join supports"):
            salted_join(skewed, dims, ["k"], how=how)


def test_salted_join_left_preserves_unmatched_left(spark, skewed):
    from lightweight_vector_database_spark.operators.skew import salted_join

    dims = spark.range(3).select(
        F.col("id").alias("k"), F.lit("d").alias("name")
    )
    plain = {(r.k, r.v, r.name) for r in skewed.join(dims, "k", "left").collect()}
    salted = {
        (r.k, r.v, r.name)
        for r in salted_join(skewed, dims, ["k"], salt_buckets=4, how="left").collect()
    }
    assert plain == salted


def _pairs(df):
    return sorted((r.k, r.v, r.tag) for r in df.collect())


@pytest.fixture(scope="module")
def dim(spark):
    # build side: keys 0..50 tagged, so half the cold keys are unmatched
    return spark.range(51).select(
        F.col("id").alias("k"), F.concat(F.lit("t"), F.col("id")).alias("tag")
    ).cache()


def test_hot_cold_join_equals_plain_inner(spark, skewed, dim):
    from lightweight_vector_database_spark.operators.skew import hot_cold_join

    plain = _pairs(skewed.join(dim, ["k"]))
    split = _pairs(hot_cold_join(skewed, dim, ["k"], hot_keys=[0]))
    auto = _pairs(hot_cold_join(skewed, dim, ["k"]))  # detect via sample
    assert split == plain and auto == plain


def test_hot_cold_join_left_keeps_unmatched_and_nulls(spark, dim):
    from lightweight_vector_database_spark.operators.skew import hot_cold_join

    left = spark.createDataFrame(
        [(0, 1.0), (0, 2.0), (99, 3.0), (None, 4.0)], "k long, v double"
    )
    key = lambda r: (r.k is None, r.k, r.v, r.tag or "")  # noqa: E731
    plain = sorted(
        ((r.k, r.v, r.tag) for r in left.join(dim, ["k"], "left").collect()),
        key=lambda t: (t[0] is None, t[0] or 0, t[1], t[2] or ""),
    )
    split = sorted(
        ((r.k, r.v, r.tag)
         for r in hot_cold_join(left, dim, ["k"], hot_keys=[0], how="left").collect()),
        key=lambda t: (t[0] is None, t[0] or 0, t[1], t[2] or ""),
    )
    assert split == plain  # unmatched key 99 and the NULL key both kept


def test_hot_cold_join_plan_broadcasts_hot_branch(spark, skewed, dim):
    from lightweight_vector_database_spark.operators.skew import hot_cold_join

    plan = (
        hot_cold_join(skewed, dim, ["k"], hot_keys=[0])
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastHashJoin" in plan  # the hot branch never shuffles


def test_hot_cold_join_rejects_bad_args(spark, skewed, dim):
    from lightweight_vector_database_spark.operators.skew import hot_cold_join

    with pytest.raises(ValueError, match="supports"):
        hot_cold_join(skewed, dim, ["k"], hot_keys=[0], how="full")
    with pytest.raises(ValueError, match="one key"):
        hot_cold_join(skewed, dim, ["k", "v"], hot_keys=[0])
