"""Concurrent-writer worker for the delta-store race test (run as a
separate OS process by tests/test_delta_race.py — NOT a pytest module).

Usage: python tests/_delta_race_worker.py <store_path> <writer_id> <go_file>

Writer 0 appends ids [0, 800) in 8 batches of 100 and, on batches 3
and 6, commits a MUTATION (append + delete of 10 earlier own rows) —
exercising commit_mutation's tombstone path under contention. Writer 1
appends ids [10000, 10800) in 8 pure-append batches. Every commit
carries (writer, batch) metadata so the test can assert that no
concurrent commit was lost or duplicated.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    store_path, wid, go_file = sys.argv[1], int(sys.argv[2]), sys.argv[3]
    from pyspark.sql import SparkSession, functions as F

    from lightweight_vector_database_spark.sources.delta_snapshots import (
        DeltaSnapshotStore,
    )

    spark = (
        SparkSession.builder.master("local[2]")
        .appName(f"delta-race-{wid}-{os.getpid()}")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.shuffle.partitions", "2")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    store = DeltaSnapshotStore(spark, store_path)

    # start barrier: signal readiness (session booted), then spin until
    # the test — which waits for BOTH ready files — drops the go file,
    # so the two commit loops begin within milliseconds of each other
    # regardless of JVM boot skew and the interleaving is guaranteed
    with open(f"{go_file}.ready.{wid}", "w") as f:
        f.write("ready")
    deadline = time.time() + 120
    while not os.path.exists(go_file):
        if time.time() > deadline:
            raise RuntimeError("go file never appeared")
        time.sleep(0.01)

    base = 0 if wid == 0 else 10_000
    for b in range(8):
        lo = base + b * 100
        df = spark.range(lo, lo + 100).select(
            F.col("id").alias("vec_id"),
            (F.col("id") % 7).cast("int").alias("val"),
        )
        meta = {"writer": wid, "batch": b}
        if wid == 0 and b in (3, 6):
            dlo = base + (b - 2) * 100
            dels = spark.range(dlo, dlo + 10).select(
                F.col("id").alias("vec_id")
            )
            store.commit_mutation(
                append_df=df, delete_ids=dels, metadata=meta
            )
        else:
            store.commit_append(df, metadata=meta)
    spark.stop()


if __name__ == "__main__":
    main()
