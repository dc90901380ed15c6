"""Generic per-group top-k: window and partial strategies agree."""

from __future__ import annotations

from pyspark.sql import functions as F

from lightweight_vector_database_spark.operators.topk import topk_per_group
from lightweight_vector_database_spark.sources import load_table


def test_topk_strategies_agree(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    args = dict(
        keys=["l_suppkey"],
        order_col="l_extendedprice",
        k=3,
        tiebreak=["l_orderkey", "l_linenumber"],
    )
    w = {
        (r.l_suppkey, r.rank, r.l_orderkey, r.l_linenumber)
        for r in topk_per_group(li, strategy="window", **args).collect()
    }
    p = {
        (r.l_suppkey, r.rank, r.l_orderkey, r.l_linenumber)
        for r in topk_per_group(li.repartition(16), strategy="partial", **args).collect()
    }
    assert w == p
    assert len(w) == li.select("l_suppkey").distinct().count() * 3


def test_topk_ascending(spark, sf_dir):
    orders = load_table(spark, sf_dir, "orders")
    out = topk_per_group(
        orders, ["o_orderpriority"], "o_totalprice", k=1,
        ascending=True, tiebreak="o_orderkey",
    ).collect()
    mins = {
        r.o_orderpriority: r.m
        for r in orders.groupBy("o_orderpriority")
        .agg(F.min("o_totalprice").alias("m"))
        .collect()
    }
    for r in out:
        assert r.o_totalprice == mins[r.o_orderpriority]
