"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line:
{"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def _cpu_jiffies() -> tuple[int, int]:
    """(steal, total) jiffies from the aggregate /proc/stat cpu line.

    Steal measures hypervisor time stolen by co-tenants on the shared
    host — the contention that in-VM load average cannot see (the r10
    bench elevation showed >1M steal jiffies at zero local load).
    Returns (0, 0) on platforms without /proc.
    """
    try:
        with open("/proc/stat") as f:
            parts = f.readline().split()
        vals = [int(x) for x in parts[1:]]
        steal = vals[7] if len(vals) > 7 else 0
        # first 8 fields only (user..steal): guest/guest_nice are
        # already folded into user/nice by the kernel, so summing them
        # would double-count and understate steal_pct
        return steal, sum(vals[:8])
    except Exception:
        return 0, 0


def _loadavg() -> float:
    try:
        return os.getloadavg()[0]
    except Exception:
        return -1.0


class _Contention:
    """Frames a timed region with steal/total jiffy deltas.

    steal_pct is steal time as a share of total cpu time over the
    region: ~0 on a quiet host; the r10 contaminated runs would have
    shown double digits. Recorded per query AND per suite so a single
    contaminated row is detectable without re-running anything.
    """

    def __init__(self) -> None:
        self.s0, self.t0 = _cpu_jiffies()

    def delta(self) -> tuple[int, int, float]:
        s1, t1 = _cpu_jiffies()
        ds, dt = s1 - self.s0, t1 - self.t0
        return ds, dt, round(100.0 * ds / dt, 2) if dt > 0 else 0.0


def _calibration_probe(spark) -> float:
    """Fixed synthetic work item (BASELINE.md round-5 methodology):
    range(1M) groupBy(id % 101) count through the noop sink. Pure-JVM
    codegen with one tiny shuffle — its runtime moves only with host
    state, so comparing start/end values against the quiet band
    (0.45-0.65s warm, measured across the r11 quiet runs; the round-5
    contended-day reference was 0.92s) dates contamination within the
    run."""
    from pyspark.sql import functions as F

    t0 = time.perf_counter()
    (
        spark.range(1_000_000)
        .groupBy((F.col("id") % F.lit(101)).alias("g"))
        .count()
        .write.format("noop")
        .mode("overwrite")
        .save()
    )
    return round(time.perf_counter() - t0, 3)

HEADLINE = [
    "knn_euclidean_sq",
    "knn_filtered",
    "knn_join_topk",
    "knn_grid_indexed",
    "q1_pricing_summary",
    "q3_top_revenue_orders",
    "q5_revenue_by_nation",
    "tfidf_top_terms",
    "asof_join_purchase_click",
    "window_rank_orders",
    "agg_rollup_lineitem",
    "dedup_exact_summary",
    "dedup_minhash_candidates",
    "text_stats_docs",
    "stream_tumbling_1h",
    "stream_session_30m",
    "multimodal_features",
    "q8_market_share",
    "q9_product_profit",
    "q21_waiting_suppliers",
    "curation_pii_redact",
    "curation_contamination",
    "ann_pq_refined",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").split("sf")[-1]
    try:
        sf_val: float | str = float(sf)
    except ValueError:
        sf_val = sf

    from lightweight_vector_database_spark.session import get_spark
    from lightweight_vector_database_spark.suite import QUERIES

    spark = get_spark("lvdb-bench")
    spark.sparkContext.setLogLevel("ERROR")

    # warm the JVM + parquet footers + Python/Arrow workers once so
    # per-query times measure execution, not process startup
    QUERIES["knn_euclidean_sq"](spark, sf_dir).collect()
    spark.range(32).mapInPandas(lambda it: it, "id long").count()
    # warm the content-hash aggregate shape: the first sha2 +
    # distinct-agg stage pays ~1.1s of one-time JVM cost (whole-stage
    # codegen compile + MessageDigest provider init across the 32 task
    # threads) that otherwise lands on whichever hashing query runs
    # first mid-suite (profiled r10: 1.36s first run vs 0.23s steady
    # state; the 0.26s BASELINE row was recorded under the r1 harness
    # where the same costs fell outside this row's timed window)
    QUERIES["dedup_exact_summary"](spark, sf_dir).collect()
    # warm the noop sink (first V2 write pays datasource resolution)
    spark.range(32).write.format("noop").mode("overwrite").save()
    # index stats are a build-time artifact (shipped with the indexed
    # snapshot); build them here so knn_grid_indexed times serving
    from lightweight_vector_database_spark.suite.index_suite import warm_index
    warm_index(spark, sf_dir)

    # contention self-evidence (VERDICT r10 item 1): frame the suite
    # and every query with /proc/stat steal deltas + a calibration
    # probe at both ends, so a contaminated run is detectable from the
    # artifact alone instead of via post-hoc A/B forensics.
    _calibration_probe(spark)  # warm the calibration shape itself
    suite_ctn = _Contention()
    load_start = _loadavg()
    calib_start = _calibration_probe(spark)

    times: dict[str, float] = {}
    steal_pct: dict[str, float] = {}
    for name in HEADLINE:
        fn = QUERIES[name]
        qctn = _Contention()
        t0 = time.perf_counter()
        df = fn(spark, sf_dir)
        # noop sink, not count(): count() lets Catalyst prune every
        # column, so map-only queries (redact, text stats, features)
        # would under-report; the noop write materializes all columns
        # at full width — the honest cost of producing the result.
        df.write.format("noop").mode("overwrite").save()
        times[name] = round(time.perf_counter() - t0, 3)
        steal_pct[name] = qctn.delta()[2]
        n = df.count()  # diagnostics only — outside the timed window
        print(
            f"# {name}: {times[name]:.3f}s ({n} rows,"
            f" steal {steal_pct[name]:.1f}%)",
            file=sys.stderr,
        )

    total = round(sum(times.values()), 3)

    # --- batched-serving regression gate (VERDICT r7 item 8): a small
    # probe-count ladder through knn_join_bulk with DEFAULT routing, so
    # a future change that re-materializes probe tables on the driver
    # or mis-routes the futility fallback moves a recorded bench number
    # instead of hiding until the next code-read. NOT part of the
    # headline total (BASELINE.md comparability); reported under its
    # own key with its own BASELINE.md band.
    ladder = {}
    try:
        from pyspark.sql import functions as F

        from lightweight_vector_database_spark.plans.bulk_knn import (
            knn_join_bulk,
        )
        from lightweight_vector_database_spark.suite.index_suite import (
            _INDEX,
            _indexed_snapshot,
        )

        assigned, stats = _indexed_snapshot(spark, sf_dir)
        n_base = sum(stats.values())
        for label, n_probes in (("bulk_1e2", 100), ("bulk_1e4", 10_000)):
            reps = -(-n_probes // n_base)
            rep_df = F.broadcast(
                spark.range(reps).select(F.col("id").alias("rep"))
            )
            probes = (
                assigned.select(
                    "vec_id",
                    F.col("embedding").cast("array<double>").alias("v"),
                )
                .crossJoin(rep_df)
                .select(
                    (F.col("vec_id") * reps + F.col("rep")).alias("probe_id"),
                    F.transform(
                        "v",
                        lambda x: x
                        * (F.lit(1.0) + F.col("rep").cast("double") * F.lit(1e-4)),
                    ).alias("probe_vec"),
                )
                .limit(n_probes)
                .repartition(16)
            )
            t0 = time.perf_counter()
            out = knn_join_bulk(assigned, _INDEX, probes, k=2, stats=stats)
            out.write.format("noop").mode("overwrite").save()
            ladder[label] = round(time.perf_counter() - t0, 3)
            print(f"# probe_ladder {label}: {ladder[label]:.3f}s", file=sys.stderr)
    except Exception as e:  # the gate must never break the bench line
        print(f"# probe_ladder failed: {e}", file=sys.stderr)

    # --- ANN-tier regression gate (VERDICT r8 item 6): ann_join_topk at
    # 10^4 probes over the fixed suite model snapshot, so an ANN
    # routing/kernel regression moves a recorded number the way bulk
    # regressions do. Snapshot build + model training happen OUTSIDE the
    # timed window (they are deploy-time artifacts).
    try:
        from pyspark.sql import functions as F

        from lightweight_vector_database_spark.operators.dedup import (
            unpersist_caches,
        )
        from lightweight_vector_database_spark.plans.ann_join import (
            ann_join_topk,
        )
        from lightweight_vector_database_spark.sources import load_table
        from lightweight_vector_database_spark.suite.pipeline_suite11 import (
            _AJ_NPROBE,
            _AJ_REFINE,
            _aj_codes,
            _aj_model,
        )

        cents, books = _aj_model(spark, sf_dir)
        codes = _aj_codes(spark, sf_dir)
        codes.count()  # snapshot built/read before the clock starts
        emb = load_table(spark, sf_dir, "embeddings")
        n_base = emb.count()
        n_probes = 10_000
        reps = -(-n_probes // n_base)
        rep_df = F.broadcast(spark.range(reps).select(F.col("id").alias("rep")))
        probes = (
            emb.select(
                "vec_id", F.col("embedding").cast("array<double>").alias("v")
            )
            .crossJoin(rep_df)
            .select(
                (F.col("vec_id") * reps + F.col("rep")).alias("probe_id"),
                F.transform(
                    "v",
                    lambda x: x
                    * (F.lit(1.0) + F.col("rep").cast("double") * F.lit(1e-4)),
                ).alias("probe_vec"),
            )
            .limit(n_probes)
            .repartition(16)
        )
        t0 = time.perf_counter()
        out = ann_join_topk(
            codes, cents, books, probes, raw=emb, k=2,
            nprobe=_AJ_NPROBE, refine=_AJ_REFINE,
        )
        out.write.format("noop").mode("overwrite").save()
        ladder["ann_1e4"] = round(time.perf_counter() - t0, 3)
        unpersist_caches()
        print(f"# probe_ladder ann_1e4: {ladder['ann_1e4']:.3f}s", file=sys.stderr)

        # --- pq4 ladder row (VERDICT r11 item 5): the same 10^4-probe
        # serve over the NIBBLE-PACKED snapshot, so a regression in the
        # packed kernel (unpack_codes4 / the binary-column ADC branch)
        # moves a recorded number the way the byte path's does. Same
        # probes, suite pq4 model (m=16/ksub=16), build outside the
        # clock.
        from lightweight_vector_database_spark.suite.pipeline_suite14 import (
            _PQ4_NPROBE,
            _PQ4_REFINE,
            _pq4_codes,
            _pq4_model,
        )

        p4_cents, p4_books = _pq4_model(spark, sf_dir)
        p4_codes = _pq4_codes(spark, sf_dir)
        p4_codes.count()
        t0 = time.perf_counter()
        out = ann_join_topk(
            p4_codes, p4_cents, p4_books, probes, raw=emb, k=2,
            nprobe=_PQ4_NPROBE, refine=_PQ4_REFINE,
        )
        out.write.format("noop").mode("overwrite").save()
        ladder["pq4_1e4"] = round(time.perf_counter() - t0, 3)
        unpersist_caches()
        print(f"# probe_ladder pq4_1e4: {ladder['pq4_1e4']:.3f}s", file=sys.stderr)
    except Exception as e:
        print(f"# ann ladder failed: {e}", file=sys.stderr)

    calib_end = _calibration_probe(spark)
    ds, dt, suite_steal = suite_ctn.delta()
    contention = {
        "steal_jiffies_delta": ds,
        "total_jiffies_delta": dt,
        "steal_pct": suite_steal,
        "load_start": load_start,
        "load_end": _loadavg(),
        "calib_start_sec": calib_start,
        "calib_end_sec": calib_end,
    }
    print(f"# contention: {json.dumps(contention)}", file=sys.stderr)

    print(
        json.dumps(
            {
                "metric": "headline_suite_total",
                "value": total,
                "unit": "sec",
                "queries": times,
                "query_steal_pct": steal_pct,
                "probe_ladder": ladder,
                "contention": contention,
                "sf": sf_val,
            }
        )
    )


if __name__ == "__main__":
    main()
