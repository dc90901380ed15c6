"""Micro-benchmark registered queries: N timed reps through the noop
sink (bench.py methodology) with per-rep /proc/stat steal deltas.

Usage:
    python tools/microbench.py [--reps N] <query> [<query> ...]

Prints one line per (query, rep) plus a median summary. Unlike
bench.py this re-runs each query several times, so it separates cold
(first-execution codegen/compile) from warm execution — use it to
evaluate a candidate optimization before re-recording the full bench.
"""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import _Contention  # noqa: E402


def main() -> None:
    args = sys.argv[1:]
    reps = 3
    if args and args[0] == "--reps":
        reps = int(args[1])
        args = args[2:]
    names = args
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from lightweight_vector_database_spark.operators.dedup import (
        unpersist_caches,
    )
    from lightweight_vector_database_spark.session import get_spark
    from lightweight_vector_database_spark.suite import QUERIES

    spark = get_spark("lvdb-microbench")
    spark.sparkContext.setLogLevel("ERROR")
    # same warmers as bench.py
    QUERIES["knn_euclidean_sq"](spark, sf_dir).collect()
    spark.range(32).mapInPandas(lambda it: it, "id long").count()
    QUERIES["dedup_exact_summary"](spark, sf_dir).collect()
    spark.range(32).write.format("noop").mode("overwrite").save()
    unpersist_caches()

    for name in names:
        vals = []
        for i in range(reps):
            ctn = _Contention()
            t0 = time.perf_counter()
            df = QUERIES[name](spark, sf_dir)
            spark.sparkContext.setJobDescription(f"microbench:{name}:{i}")
            df.write.format("noop").mode("overwrite").save()
            dt = time.perf_counter() - t0
            vals.append(dt)
            unpersist_caches()
            print(
                f"{name} rep{i}: {dt:.3f}s steal {ctn.delta()[2]:.1f}%",
                flush=True,
            )
        print(
            f"== {name}: median {statistics.median(vals):.3f}s "
            f"min {min(vals):.3f}s cold {vals[0]:.3f}s",
            flush=True,
        )


if __name__ == "__main__":
    main()
