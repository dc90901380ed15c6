"""Scale stress test: 500k x 64d clustered vectors through the full
index path — brute-force kNN vs grid-index pruning (with and without a
partitioned snapshot) vs IVF.

Generates data Spark-side (deterministic: 32 Gaussian-ish clusters via
sin-noise, no driver materialization), writes both a plain and a
cell-partitioned parquet snapshot under /tmp, and times the query
paths. Usage: python tools/scale_test.py [n_rows]
"""

from __future__ import annotations

import sys
import time

import numpy as np

from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F

from lightweight_vector_database_spark.operators.knn import knn
from lightweight_vector_database_spark.operators.similarity import (
    ivf_assign,
    ivf_search,
    train_centroids,
)
from lightweight_vector_database_spark.plans.grid_index import (
    GridIndex,
    build_index,
    index_stats,
    knn_indexed,
)
from lightweight_vector_database_spark.session import get_spark
from lightweight_vector_database_spark.sources.sinks import write_indexed_snapshot

DIM = 64
N_CLUSTERS = 32


def generate(spark, n_rows: int):
    rng = np.random.RandomState(5)
    centers = rng.uniform(-0.35, 0.35, (N_CLUSTERS, DIM))
    centers_df = spark.createDataFrame(
        [(int(c), centers[c].tolist()) for c in range(N_CLUSTERS)],
        "cluster int, center array<double>",
    )
    base = spark.range(n_rows).select(
        F.col("id").alias("vec_id"),
        (F.col("id") % N_CLUSTERS).cast("int").alias("cluster"),
    )
    noise = F.transform(
        F.sequence(F.lit(1), F.lit(DIM)),
        lambda i: 0.05 * F.sin((F.col("vec_id") + 1) * i.cast("double") * 0.7),
    )
    joined = base.join(F.broadcast(centers_df), "cluster")
    vec = F.zip_with(F.col("center"), noise, lambda c, nz: c + nz).cast("array<float>")
    return (
        joined.select(
            "vec_id", vec.alias("embedding"), F.col("cluster").alias("label")
        ),
        centers,
    )


def main() -> None:
    n_rows = int(sys.argv[1]) if len(sys.argv) > 1 else 500_000
    spark = get_spark("scale-test")
    spark.sparkContext.setLogLevel("ERROR")

    df, centers = generate(spark, n_rows)
    plain_path = "/tmp/lvdb_scale_plain"
    idx_path = "/tmp/lvdb_scale_indexed"

    t0 = time.time()
    df.write.mode("overwrite").parquet(plain_path)
    print(f"generate+write plain: {time.time()-t0:.1f}s ({n_rows} rows)")

    base = spark.read.parquet(plain_path)
    index = GridIndex.for_table(
        [-0.5] * DIM, [0.5] * DIM, n_rows, target_cell_rows=4096
    )
    print(f"grid depth={index.depth} (bins=3 -> {3**index.depth} cells)")

    t0 = time.time()
    assigned = build_index(base, index)
    write_indexed_snapshot(assigned, idx_path)
    print(f"index build + partitioned write: {time.time()-t0:.1f}s")

    indexed = spark.read.parquet(idx_path)
    t0 = time.time()
    stats = index_stats(indexed)
    print(f"index stats: {time.time()-t0:.1f}s ({len(stats)} non-empty cells)")

    probe = [float(x) for x in centers[7] + 0.01]

    for trial in range(2):
        t0 = time.time()
        exact = [(r.vec_id, r.dist) for r in knn(base, probe, 10).collect()]
        t_brute = time.time() - t0
        t0 = time.time()
        got = [
            (r.vec_id, r.dist)
            for r in knn_indexed(indexed, index, probe, 10, stats=stats).collect()
        ]
        t_idx = time.time() - t0
        match = [v for v, _ in got] == [v for v, _ in exact]
        print(
            f"trial{trial}: brute={t_brute:.2f}s indexed={t_idx:.2f}s "
            f"speedup={t_brute / t_idx:.1f}x exact_match={match}"
        )

    # IVF
    t0 = time.time()
    cents = train_centroids(base, n_centroids=N_CLUSTERS, iters=3)
    ivf = ivf_assign(base, cents, method="arrow").cache()  # bulk-build path
    ivf.count()
    print(f"ivf train+assign (arrow): {time.time()-t0:.1f}s")
    exact_ids = {r.vec_id for r in knn(base, probe, 10).collect()}
    for nprobe in (2, 4):
        t0 = time.time()
        got_ids = {
            r.vec_id for r in ivf_search(ivf, cents, probe, k=10, nprobe=nprobe).collect()
        }
        print(
            f"ivf nprobe={nprobe}: {time.time()-t0:.2f}s "
            f"recall={len(got_ids & exact_ids)/10:.2f}"
        )

    # PQ: encode once (arrow bulk path), then ADC + exact refine
    from lightweight_vector_database_spark.operators.similarity import (
        pq_encode,
        pq_search,
        train_pq_codebooks,
    )

    t0 = time.time()
    books = train_pq_codebooks(base, m=8, ksub=256, iters=4, sample_rows=8192)
    codes_path = "/tmp/lvdb_scale_pq"
    pq_encode(base, books, method="arrow").select("vec_id", "pq_code").write.mode(
        "overwrite"
    ).parquet(codes_path)
    codes = spark.read.parquet(codes_path)
    print(f"pq train+encode+write codes (arrow): {time.time()-t0:.1f}s")
    for refine in (4, 16):
        t0 = time.time()
        got_ids = {
            r.vec_id
            for r in pq_search(
                codes, books, probe, k=10, refine=refine, raw=base
            ).collect()
        }
        print(
            f"pq refine={refine} (code-only scan + join-back): {time.time()-t0:.2f}s "
            f"recall={len(got_ids & exact_ids)/10:.2f}"
        )

    # residual IVF-PQ: coarse cells + PQ(residual), partitioned codes
    from lightweight_vector_database_spark.operators.similarity import (
        ivfpq_encode,
        ivfpq_search,
        train_ivfpq,
    )

    t0 = time.time()
    cents2, books2 = train_ivfpq(base, n_centroids=N_CLUSTERS, m=8, ksub=256)
    ivfpq_path = "/tmp/lvdb_scale_ivfpq"
    ivfpq_encode(base, cents2, books2).select(
        "vec_id", "cell", "pq_code"
    ).write.mode("overwrite").partitionBy("cell").parquet(ivfpq_path)
    ivfpq_codes = spark.read.parquet(ivfpq_path)
    print(f"ivfpq train+encode+write (partitioned by cell): {time.time()-t0:.1f}s")
    for nprobe, refine in ((2, 8), (4, 16)):
        t0 = time.time()
        got_ids = {
            r.vec_id
            for r in ivfpq_search(
                ivfpq_codes, cents2, books2, probe,
                k=10, nprobe=nprobe, refine=refine, raw=base,
            ).collect()
        }
        print(
            f"ivfpq nprobe={nprobe} refine={refine}: {time.time()-t0:.2f}s "
            f"recall={len(got_ids & exact_ids)/10:.2f}"
        )


if __name__ == "__main__":
    main()
