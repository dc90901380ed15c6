"""Freshness vs latency: serve ann_join_topk against the maintained
codes view WHILE streaming ingest commits batches (VERDICT r10 item 7).

The ingest loop (streaming/ingest.VectorIngest(codes_view=)) keeps the
IVF-PQ codes table current after every committed micro-batch — an
O(batch) incremental encode + one atomic tombstone+append commit. The
open question this bench answers with a recording: what does that
concurrent maintenance cost the SERVING path? A real Structured
Streaming query (parquet file source, one file per trigger) commits
batches on a fixed interval while the driver's main thread serves a
1000-probe ann_join_topk loop against the live view; every serve
records its wall latency and its freshness (how many base versions the
served codes trail the store by). After the stream drains, the same
serve runs quiet — the no-write baseline column.

Usage: python tools/stream_serve_bench.py [n_init] [--batches N]
         [--batch-rows N] [--interval SEC] [--json out.json]
"""

from __future__ import annotations

import json
import sys
import time

from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F

from bench import _Contention, _loadavg
from lightweight_vector_database_spark.caching import unpersist_caches
from lightweight_vector_database_spark.operators.similarity import train_ivfpq
from lightweight_vector_database_spark.plans.ann_join import ann_join_topk
from lightweight_vector_database_spark.plans.ann_maintenance import (
    CodesSnapshot,
)
from lightweight_vector_database_spark.plans.grid_index import GridIndex
from lightweight_vector_database_spark.session import get_spark
from lightweight_vector_database_spark.sources.delta_snapshots import (
    DeltaSnapshotStore,
)
from lightweight_vector_database_spark.streaming.ingest import VectorIngest
from scale_test import DIM, generate

K = 10
NPROBE = 4
REFINE = 4
N_PROBES = 1_000


def main() -> None:
    n_init = (
        int(sys.argv[1])
        if len(sys.argv) > 1 and sys.argv[1].isdigit()
        else 200_000
    )
    argv = sys.argv

    def opt(name, default, cast):
        return cast(argv[argv.index(name) + 1]) if name in argv else default

    n_batches = opt("--batches", 12, int)
    batch_rows = opt("--batch-rows", 5_000, int)
    interval = opt("--interval", 2.5, float)
    depth = opt("--depth", 8, int)
    out_json = opt("--json", None, str)
    # --pool: run the session under the FAIR scheduler with the
    # maintenance stream and the serve loop in separate pools (equal
    # weight -> each side gets a fair share of task slots while both
    # are busy), vs the default FIFO where a maintenance stage at the
    # queue head blocks every serve task behind it. The r11 FIFO
    # recording (STREAM_SERVE_r11_d8) measured live serves 1.7x quiet;
    # this flag records the isolated column.
    pooled = "--pool" in argv

    spark = get_spark(
        "stream-serve-bench",
        extra_conf={"spark.scheduler.mode": "FAIR"} if pooled else None,
    )
    spark.sparkContext.setLogLevel("ERROR")
    if pooled:
        # the main thread IS the serve thread; the stream's micro-batch
        # thread gets its pool at ingest.start(scheduler_pool=)
        spark.sparkContext.setLocalProperty("spark.scheduler.pool", "serve")

    import tempfile

    tmp = tempfile.mkdtemp(prefix="stream_serve_")
    total = n_init + n_batches * batch_rows
    corpus, _ = generate(spark, total)
    corpus = corpus.select(
        "vec_id", "label",
        F.col("embedding").cast("array<float>").alias("embedding"),
    )
    # one parquet file per micro-batch: file 0 is the bootstrap corpus,
    # files 1..N are the deltas — maxFilesPerTrigger=1 + processingTime
    # makes the stream commit exactly one batch per interval
    incoming = f"{tmp}/incoming"
    v = F.col("vec_id")
    corpus.filter(v < n_init).drop("vec_id").coalesce(1).write.mode(
        "append"
    ).parquet(incoming)
    for i in range(n_batches):
        lo = n_init + i * batch_rows
        corpus.filter((v >= lo) & (v < lo + batch_rows)).drop(
            "vec_id"
        ).coalesce(1).write.mode("append").parquet(incoming)

    # model trained on the initial corpus (deploy-time artifact)
    cents, books = train_ivfpq(
        corpus.filter(v < n_init), n_centroids=64, m=8, ksub=256, iters=4,
        sample_rows=8192, sample_id_col="vec_id",
    )

    store = DeltaSnapshotStore(spark, f"{tmp}/snap")
    # the VIEW carries its own read-amplification ceiling: every serve
    # scans the codes table, so unbounded delta fan-in would make this
    # bench measure log growth instead of write contention (first
    # recording without it: serve latency GREW from 7.9s to 12.4s over
    # 13 commits — CDC_READAMP_sf1.json at serving scale). The BASE
    # store's compaction stays on the ingest cadence (compact_every)
    # because the sink must advance the view pointer past each fold —
    # a store-level auto-fold there would force full re-encodes.
    view = DeltaSnapshotStore(
        spark, f"{tmp}/codes", auto_compact_depth=depth
    )
    cs = CodesSnapshot(store, view, cents, books, keep_cols=("label",))
    index = GridIndex([-0.5] * DIM, [0.5] * DIM, num_splits=2, depth=3)
    ingest = VectorIngest(store, index, compact_every=8, codes_view=cs)

    # fixed probe table (1000 seeds of the initial corpus, re-used
    # every serve; EAGER so probe construction is outside every timing)
    probes = (
        corpus.filter(v % max(1, n_init // N_PROBES) == 0)
        .filter(v < n_init)
        .select(
            F.col("vec_id").alias("probe_id"),
            F.col("embedding").cast("array<double>").alias("probe_vec"),
        )
        .repartition(16)
        .cache()
    )
    n_probe_rows = probes.count()

    stream = (
        spark.readStream.schema("label int, embedding array<float>")
        .option("maxFilesPerTrigger", 1)
        .parquet(incoming)
    )
    ctn = _Contention()
    load0 = _loadavg()
    q = ingest.start(
        stream, checkpoint=f"{tmp}/ckpt",
        scheduler_pool="maintenance" if pooled else None,
        processingTime=f"{interval} seconds",
    )

    # wait for the bootstrap encode (view version 0) before serving
    t_wait = time.time()
    while view.latest_metadata().get("base_version") is None:
        if time.time() - t_wait > 600:
            raise TimeoutError("bootstrap encode never landed")
        time.sleep(0.2)

    def one_serve() -> dict:
        lag_before = store.latest_version() - int(
            view.latest_metadata()["base_version"]
        )
        t0 = time.perf_counter()
        out = ann_join_topk(
            cs.codes(), cents, books, probes, raw=store.read(),
            k=K, nprobe=NPROBE, refine=REFINE,
        )
        out.write.format("noop").mode("overwrite").save()
        dt = time.perf_counter() - t0
        # free the per-serve model broadcast + spilled candidate table
        # (the same between-query hook every sweep tool runs) — without
        # it 13+ serves accumulate broadcasts/disk spill and the loop
        # measures memory pressure, not serving
        unpersist_caches()
        return {
            "latency_sec": round(dt, 3),
            "version_lag_at_start": lag_before,
        }

    live_serves = []
    while store.latest_version() < n_batches and q.isActive:
        live_serves.append(one_serve())
        print(f"live  {live_serves[-1]}", flush=True)
    q.stop()
    q.awaitTermination(60)

    quiet_serves = [one_serve() for _ in range(5)]
    for s in quiet_serves:
        print(f"quiet {s}", flush=True)

    # fresh-rebuild baseline: one full encode of the FINAL corpus into
    # a virgin store, served quiet — separates residual view fan-in
    # (quiet vs fresh) from write contention (live vs quiet)
    fresh = CodesSnapshot(
        store, DeltaSnapshotStore(spark, f"{tmp}/codes_fresh"),
        cents, books, keep_cols=("label",),
    )
    fresh.refresh()
    fresh_serves = []
    for _ in range(3):
        t0 = time.perf_counter()
        ann_join_topk(
            fresh.codes(), cents, books, probes, raw=store.read(),
            k=K, nprobe=NPROBE, refine=REFINE,
        ).write.format("noop").mode("overwrite").save()
        fresh_serves.append(round(time.perf_counter() - t0, 3))
    print(f"fresh {fresh_serves}", flush=True)

    ds, dt_j, steal_pct = ctn.delta()
    med = lambda xs: sorted(xs)[len(xs) // 2] if xs else None
    doc = {
        "n_init": n_init,
        "scheduler": "fair-pooled" if pooled else "fifo",
        "n_batches": n_batches,
        "batch_rows": batch_rows,
        "interval_sec": interval,
        "view_compact_depth": depth,
        "n_probes": n_probe_rows,
        "k": K,
        "nprobe": NPROBE,
        "refine": REFINE,
        "live_serves": live_serves,
        "quiet_serves": quiet_serves,
        "fresh_rebuild_serves_sec": fresh_serves,
        "median_fresh_latency_sec": med(fresh_serves),
        "median_live_latency_sec": med(
            [s["latency_sec"] for s in live_serves]
        ),
        "median_quiet_latency_sec": med(
            [s["latency_sec"] for s in quiet_serves]
        ),
        "max_version_lag": max(
            (s["version_lag_at_start"] for s in live_serves), default=None
        ),
        "contention": {
            "steal_pct": steal_pct,
            "load_start": load0,
            "load_end": _loadavg(),
        },
    }
    print(json.dumps({k: doc[k] for k in (
        "median_live_latency_sec", "median_quiet_latency_sec",
        "max_version_lag", "interval_sec",
    )}), flush=True)
    if out_json:
        with open(out_json, "w") as f:
            json.dump(doc, f, indent=1)
    spark.stop()


if __name__ == "__main__":
    main()
