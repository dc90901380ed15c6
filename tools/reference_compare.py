"""Head-to-head throughput: the reference implementation (run as-is
from /root/reference, read-only) vs this engine, same data, same
machine.

Measures, at N vectors x dim D:
- build: reference per-row insert loop vs engine parquet write +
  index build
- query: k=10 squared-Euclidean kNN, single-query latency and
  throughput over Q sequential probes (reference call loop vs engine
  brute-force and grid-indexed paths)

Results go to BASELINE.md. Usage:
  python tools/reference_compare.py [n_rows] [dim] [n_queries]
"""

from __future__ import annotations

import sys
import time

import numpy as np

from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
sys.path.insert(0, "/root/reference")  # run the reference as published


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 50_000
    dim = int(sys.argv[2]) if len(sys.argv) > 2 else 64
    n_q = int(sys.argv[3]) if len(sys.argv) > 3 else 20

    rng = np.random.RandomState(42)
    data = rng.random((n, dim)).astype(np.float32)
    probes = rng.random((n_q, dim)).astype(np.float32)

    # --- reference ----------------------------------------------------
    from vectordb.kd_tree_database import KDTreeDatabase

    ref = KDTreeDatabase(
        dim=dim,
        lower_bound=np.zeros(dim, dtype=np.float32),
        upper_bound=np.ones(dim, dtype=np.float32),
        num_splits_per_dimension=2,
        max_leaf_size=64,
    )
    t0 = time.time()
    for i in range(n):
        ref.insert(data[i], i)
    t_ref_build = time.time() - t0
    print(f"reference build ({n} inserts): {t_ref_build:.1f}s")

    t0 = time.time()
    for p in probes:
        ref.find_k_nearest_neighbors(p, 10)
    t_ref_q = (time.time() - t0) / n_q
    print(f"reference kNN: {t_ref_q*1000:.1f} ms/query ({1/t_ref_q:.1f} q/s)")

    # --- engine -------------------------------------------------------
    from pyspark.sql import functions as F

    from lightweight_vector_database_spark.operators.knn import knn
    from lightweight_vector_database_spark.plans.grid_index import (
        GridIndex,
        build_index,
        index_stats,
        knn_indexed,
    )
    from lightweight_vector_database_spark.session import get_spark

    spark = get_spark("ref-compare")
    spark.sparkContext.setLogLevel("ERROR")

    t0 = time.time()
    df = spark.createDataFrame(
        [(i, data[i].tolist()) for i in range(n)], "vec_id long, embedding array<float>"
    )
    path = "/tmp/lvdb_refcmp"
    df.write.mode("overwrite").parquet(path)
    base = spark.read.parquet(path)
    index = GridIndex.for_table([0.0] * dim, [1.0] * dim, n, target_cell_rows=4096)
    assigned = build_index(base, index).cache()
    stats = index_stats(assigned)
    t_eng_build = time.time() - t0
    print(f"engine build (write + index + stats): {t_eng_build:.1f}s")

    knn(base, probes[0].tolist(), 10).collect()  # warm
    t0 = time.time()
    for p in probes:
        knn(base, p.tolist(), 10).collect()
    t_eng_brute = (time.time() - t0) / n_q
    print(f"engine brute kNN: {t_eng_brute*1000:.1f} ms/query ({1/t_eng_brute:.1f} q/s)")

    t0 = time.time()
    for p in probes:
        knn_indexed(assigned, index, p.tolist(), 10, stats=stats).collect()
    t_eng_idx = (time.time() - t0) / n_q
    print(f"engine indexed kNN: {t_eng_idx*1000:.1f} ms/query ({1/t_eng_idx:.1f} q/s)")

    # batched probes — the engine's native query mode
    from lightweight_vector_database_spark.operators.knn import knn_join

    probes_df = spark.createDataFrame(
        [(int(i), probes[i].tolist()) for i in range(n_q)],
        "probe_id long, probe_vec array<float>",
    )
    knn_join(probes_df, base, k=10).count()  # warm
    t0 = time.time()
    rows = knn_join(probes_df, base, k=10).count()
    t_batch = (time.time() - t0) / n_q
    print(
        f"engine BATCHED kNN ({n_q} probes, one job): "
        f"{t_batch*1000:.1f} ms/query amortized ({1/t_batch:.1f} q/s, {rows} rows)"
    )

    # results parity spot check
    ref_ids = [e.metadata for e, _ in ref.find_k_nearest_neighbors(probes[0], 10)]
    eng = [r.vec_id for r in knn(base, probes[0].tolist(), 10).collect()]
    print(f"same results as reference: {ref_ids == eng}")


if __name__ == "__main__":
    main()
