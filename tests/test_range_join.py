"""Banded range join: exact equality with the theta join it replaces,
and the plan property that justifies it (hash/sort-merge join on the
band key, never a nested-loop over both sides)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from lightweight_vector_database_spark.operators.range_join import (
    banded_range_join,
)
from lightweight_vector_database_spark.sources import load_table


def _theta(cust, supp):
    cond = (cust.c_acctbal >= supp.s_acctbal - 500) & (
        cust.c_acctbal <= supp.s_acctbal
    )
    return cust.join(supp, cond)


def test_banded_equals_theta_join(spark, sf_dir):
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_acctbal")
    supp = (
        load_table(spark, sf_dir, "supplier")
        .select("s_suppkey", "s_acctbal")
        .withColumn("lo", F.col("s_acctbal") - 500)
    )
    plain = {
        (r.c_custkey, r.s_suppkey)
        for r in _theta(cust, supp.drop("lo")).collect()
    }
    assert plain  # fixture sanity
    for width in (100.0, 500.0, 2000.0):  # result must be width-invariant
        banded = {
            (r.c_custkey, r.s_suppkey)
            for r in banded_range_join(
                cust, supp, "c_acctbal", "lo", "s_acctbal", band_width=width
            ).collect()
        }
        assert banded == plain, f"width={width}"


def test_banded_semi_and_guards(spark, sf_dir):
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_acctbal")
    supp = (
        load_table(spark, sf_dir, "supplier")
        .select("s_suppkey", "s_acctbal")
        .withColumn("lo", F.col("s_acctbal") - 500)
    )
    plain_semi = {
        r.c_custkey
        for r in cust.join(
            supp,
            (cust.c_acctbal >= supp.lo) & (cust.c_acctbal <= supp.s_acctbal),
            "left_semi",
        ).collect()
    }
    got = {
        r.c_custkey
        for r in banded_range_join(
            cust, supp, "c_acctbal", "lo", "s_acctbal",
            band_width=500.0, how="left_semi",
        ).collect()
    }
    assert got == plain_semi

    with pytest.raises(ValueError, match="positive"):
        banded_range_join(cust, supp, "c_acctbal", "lo", "s_acctbal", 0.0)
    with pytest.raises(ValueError, match="inner/left_semi"):
        banded_range_join(
            cust, supp, "c_acctbal", "lo", "s_acctbal", 500.0, how="left"
        )


def test_empty_intervals_match_nothing(spark):
    left = spark.createDataFrame([(1, 5.0), (2, 50.0)], "id long, v double")
    right = spark.createDataFrame(
        [(10, 0.0, 10.0), (11, 100.0, 90.0)], "rid long, lo double, hi double"
    )  # rid=11 is an empty interval (hi < lo)
    out = banded_range_join(left, right, "v", "lo", "hi", band_width=8.0)
    assert {(r.id, r.rid) for r in out.collect()} == {(1, 10)}


def test_banded_plan_avoids_nested_loop(spark, sf_dir):
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_acctbal")
    supp = (
        load_table(spark, sf_dir, "supplier")
        .select("s_suppkey", "s_acctbal")
        .withColumn("lo", F.col("s_acctbal") - 500)
    )
    out = banded_range_join(
        cust, supp, "c_acctbal", "lo", "s_acctbal", band_width=500.0
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "NestedLoop" not in plan and "CartesianProduct" not in plan


def test_shared_column_names_bind_to_owning_side(spark):
    # ADVICE r5: string column args whose names exist on BOTH sides
    # must resolve against their owning input — a bare F.col in the
    # residual would be ambiguous or silently bind to the wrong side.
    # Here every column name exists on both inputs.
    left = spark.createDataFrame(
        [(1, 5.0, 0.0, 0.0), (2, 15.0, 0.0, 0.0), (3, 25.0, 0.0, 0.0)],
        "id long, val double, lo double, hi double",
    )
    right = spark.createDataFrame(
        [(10, 99.0, 0.0, 10.0), (11, 99.0, 10.0, 20.0)],
        "id long, val double, lo double, hi double",
    )
    expect_pairs = {(1, 10), (2, 11)}  # 5 in [0,10], 15 in [10,20]

    inner = banded_range_join(left, right, "val", "lo", "hi", band_width=8.0)
    # inner join keeps both ids; left's columns come first in the schema
    got = {(r[0], r[4]) for r in inner.collect()}
    assert got == expect_pairs

    semi = banded_range_join(
        left, right, "val", "lo", "hi", band_width=8.0, how="left_semi"
    )
    assert {r.id for r in semi.collect()} == {1, 2}
