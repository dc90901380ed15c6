"""Relational-path scale stress: 10M-row lineitem-like fact table
through Q1-style aggregation, a dimension join + top-k, and a window
rank — the shapes that dominate warehouse workloads.

Data is generated Spark-side (deterministic hash-derived columns, no
driver materialization). Usage: python tools/scale_relational_test.py [n_rows]
"""

from __future__ import annotations

import sys
import time

from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import Window
from pyspark.sql import functions as F

from lightweight_vector_database_spark.session import get_spark

N_ORDERS_PER_ROWS = 4  # ~rows/4 distinct orders


def generate(spark, n_rows: int):
    h = lambda *cols: F.pmod(F.xxhash64(*cols), F.lit(10_000))  # noqa: E731
    df = spark.range(n_rows).select(
        (F.col("id") / N_ORDERS_PER_ROWS).cast("long").alias("l_orderkey"),
        F.pmod(F.col("id"), F.lit(2000)).alias("l_partkey"),
        F.pmod(F.col("id"), F.lit(100)).alias("l_suppkey"),
        (F.pmod(F.xxhash64(F.col("id")), F.lit(50)) + 1).cast("double").alias("l_quantity"),
        (h(F.col("id")) / 10.0 + 900.0).alias("l_extendedprice"),
        (F.pmod(F.xxhash64(F.col("id"), F.lit(1)), F.lit(11)) / 100.0).alias("l_discount"),
        F.element_at(
            F.array(F.lit("A"), F.lit("N"), F.lit("R")),
            (F.pmod(F.xxhash64(F.col("id"), F.lit(2)), F.lit(3)) + 1).cast("int"),
        ).alias("l_returnflag"),
    )
    return df


def main() -> None:
    n_rows = int(sys.argv[1]) if len(sys.argv) > 1 else 10_000_000
    spark = get_spark("scale-rel")
    spark.sparkContext.setLogLevel("ERROR")

    path = "/tmp/lvdb_scale_lineitem"
    t0 = time.time()
    generate(spark, n_rows).write.mode("overwrite").parquet(path)
    li = spark.read.parquet(path)
    print(f"generate+write: {time.time()-t0:.1f}s ({n_rows} rows)")

    # Q1-style aggregation (floor-quantized exact sums)
    def q(col, s=100.0):
        return (F.sum(F.floor(col * s).cast("long")).cast("double") / F.lit(s))

    for trial in range(2):
        t0 = time.time()
        out = (
            li.groupBy("l_returnflag")
            .agg(
                q(F.col("l_quantity")).alias("sum_qty"),
                q(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("rev"),
                F.count(F.lit(1)).alias("n"),
            )
            .collect()
        )
        print(f"Q1-style agg trial{trial}: {time.time()-t0:.2f}s ({len(out)} groups)")

    # dim join + top-k
    dim = spark.range(2000).select(
        F.col("id").alias("l_partkey"),
        F.concat(F.lit("part_"), F.col("id")).alias("p_name"),
    )
    for trial in range(2):
        t0 = time.time()
        top = (
            li.join(F.broadcast(dim), "l_partkey")
            .groupBy("p_name")
            .agg(q(F.col("l_extendedprice")).alias("total"))
            .orderBy(F.col("total").desc(), F.col("p_name"))
            .limit(10)
            .collect()
        )
        print(f"broadcast join + agg + top-10 trial{trial}: {time.time()-t0:.2f}s")

    # window rank per supplier (shuffle-heavy)
    t0 = time.time()
    w = Window.partitionBy("l_suppkey").orderBy(
        F.col("l_extendedprice").desc(), F.col("l_orderkey")
    )
    n = (
        li.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= 3)
        .count()
    )
    print(f"window top-3 per supplier: {time.time()-t0:.2f}s ({n} rows)")

    # Q21-shaped EXISTS / NOT EXISTS: dedup to (orderkey, suppkey)
    # pairs first so the semi/anti self-joins shuffle pairs, not lines
    t0 = time.time()
    pairs = li.select("l_orderkey", "l_suppkey").distinct()
    late = (
        li.filter(F.pmod(F.xxhash64("l_orderkey", "l_suppkey"), F.lit(3)) == 0)
        .select("l_orderkey", "l_suppkey")
        .distinct()
    )
    other = pairs.select(
        F.col("l_orderkey").alias("o_key"), F.col("l_suppkey").alias("o_supp")
    )
    other_late = late.select(
        F.col("l_orderkey").alias("o_key"), F.col("l_suppkey").alias("o_supp")
    )
    waiting = (
        late.join(
            other,
            (late.l_orderkey == other.o_key) & (late.l_suppkey != other.o_supp),
            "left_semi",
        )
        .join(
            other_late,
            (late.l_orderkey == other_late.o_key)
            & (late.l_suppkey != other_late.o_supp),
            "left_anti",
        )
        .groupBy("l_suppkey")
        .count()
    )
    n = waiting.count()
    print(f"Q21-shaped semi+anti self-join: {time.time()-t0:.2f}s ({n} suppliers)")


if __name__ == "__main__":
    main()
