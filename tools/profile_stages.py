"""Stage-level profile of one bench region via the Spark event log.

Usage:
    python tools/profile_stages.py ann_1e4|bulk_1e4|pq4_1e4|<query_name>

Runs the target once (bench.py construction for ladder rows, registered
query otherwise) in a session with eventLog enabled, then prints each
job/stage with wall time and task count — the guide §1/§7 empirical
loop without the UI (disabled in this environment).
"""

from __future__ import annotations

import glob
import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

EVT_DIR = "/tmp/spark-events"


def main() -> None:
    target = sys.argv[1]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    os.makedirs(EVT_DIR, exist_ok=True)
    for f in glob.glob(EVT_DIR + "/*"):
        shutil.rmtree(f) if os.path.isdir(f) else os.remove(f)

    from pyspark.sql import functions as F

    from lightweight_vector_database_spark.session import get_spark
    from lightweight_vector_database_spark.suite import QUERIES

    spark = get_spark(
        "lvdb-profile",
        extra_conf={
            "spark.eventLog.enabled": "true",
            "spark.eventLog.dir": EVT_DIR,
            "spark.eventLog.compress": "false",
            "spark.eventLog.rolling.enabled": "false",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    QUERIES["knn_euclidean_sq"](spark, sf_dir).collect()
    spark.range(32).mapInPandas(lambda it: it, "id long").count()
    spark.range(32).write.format("noop").mode("overwrite").save()

    if target in ("ann_1e4", "pq4_1e4"):
        from lightweight_vector_database_spark.plans.ann_join import ann_join_topk
        from lightweight_vector_database_spark.sources import load_table

        if target == "ann_1e4":
            from lightweight_vector_database_spark.suite.pipeline_suite11 import (
                _AJ_NPROBE as NPROBE, _AJ_REFINE as REFINE,
                _aj_codes as codes_fn, _aj_model as model_fn,
            )
        else:
            from lightweight_vector_database_spark.suite.pipeline_suite14 import (
                _PQ4_NPROBE as NPROBE, _PQ4_REFINE as REFINE,
                _pq4_codes as codes_fn, _pq4_model as model_fn,
            )
        cents, books = model_fn(spark, sf_dir)
        codes = codes_fn(spark, sf_dir)
        codes.count()
        emb = load_table(spark, sf_dir, "embeddings")
        n_base = emb.count()
        n_probes = 10_000
        reps = -(-n_probes // n_base)
        rep_df = F.broadcast(spark.range(reps).select(F.col("id").alias("rep")))
        probes = (
            emb.select("vec_id", F.col("embedding").cast("array<double>").alias("v"))
            .crossJoin(rep_df)
            .select(
                (F.col("vec_id") * reps + F.col("rep")).alias("probe_id"),
                F.transform(
                    "v",
                    lambda x: x * (F.lit(1.0) + F.col("rep").cast("double") * F.lit(1e-4)),
                ).alias("probe_vec"),
            )
            .limit(n_probes)
            .repartition(16)
        )
        spark.sparkContext.setJobDescription(f"profile:{target}")
        t0 = time.perf_counter()
        out = ann_join_topk(codes, cents, books, probes, raw=emb, k=2,
                            nprobe=NPROBE, refine=REFINE)
        out.write.format("noop").mode("overwrite").save()
        print(f"# total {time.perf_counter() - t0:.3f}s", file=sys.stderr)
    elif target == "bulk_1e4":
        from lightweight_vector_database_spark.plans.bulk_knn import knn_join_bulk
        from lightweight_vector_database_spark.suite.index_suite import (
            _INDEX, _indexed_snapshot,
        )

        assigned, stats = _indexed_snapshot(spark, sf_dir)
        n_base = sum(stats.values())
        n_probes = 10_000
        reps = -(-n_probes // n_base)
        rep_df = F.broadcast(spark.range(reps).select(F.col("id").alias("rep")))
        probes = (
            assigned.select(
                "vec_id", F.col("embedding").cast("array<double>").alias("v")
            )
            .crossJoin(rep_df)
            .select(
                (F.col("vec_id") * reps + F.col("rep")).alias("probe_id"),
                F.transform(
                    "v",
                    lambda x: x * (F.lit(1.0) + F.col("rep").cast("double") * F.lit(1e-4)),
                ).alias("probe_vec"),
            )
            .limit(n_probes)
            .repartition(16)
        )
        spark.sparkContext.setJobDescription(f"profile:{target}")
        t0 = time.perf_counter()
        out = knn_join_bulk(assigned, _INDEX, probes, k=2, stats=stats)
        out.write.format("noop").mode("overwrite").save()
        print(f"# total {time.perf_counter() - t0:.3f}s", file=sys.stderr)
    else:
        spark.sparkContext.setJobDescription(f"profile:{target}")
        t0 = time.perf_counter()
        QUERIES[target](spark, sf_dir).write.format("noop").mode("overwrite").save()
        print(f"# total {time.perf_counter() - t0:.3f}s", file=sys.stderr)

    app_id = spark.sparkContext.applicationId
    spark.stop()

    # ---- parse the event log -------------------------------------------------
    path = os.path.join(EVT_DIR, app_id)
    if not os.path.exists(path):
        cands = glob.glob(os.path.join(EVT_DIR, f"*{app_id}*"))
        path = cands[0] if cands else path
    if os.path.isdir(path):  # Spark 4 rolling event log directory
        parts = sorted(glob.glob(os.path.join(path, "events_*")))
        lines = (line for p in parts for line in open(p))
    else:
        lines = iter(open(path))
    jobs: dict[int, dict] = {}
    stages: dict[int, dict] = {}
    for line in lines:
        try:
            ev = json.loads(line)
        except json.JSONDecodeError:
            continue
        e = ev.get("Event")
        if e == "SparkListenerJobStart":
            jobs[ev["Job ID"]] = {
                "t0": ev["Submission Time"],
                "desc": (ev.get("Properties") or {}).get(
                    "spark.job.description", ""
                ),
                "stages": [s["Stage ID"] for s in ev["Stage Infos"]],
            }
        elif e == "SparkListenerJobEnd":
            jobs[ev["Job ID"]]["t1"] = ev["Completion Time"]
        elif e == "SparkListenerStageCompleted":
            si = ev["Stage Info"]
            stages[si["Stage ID"]] = {
                "name": si["Stage Name"].split("\n")[0],
                "tasks": si["Number of Tasks"],
                "ms": si.get("Completion Time", 0) - si.get("Submission Time", 0),
            }
    for jid in sorted(jobs):
        j = jobs[jid]
        if "t1" not in j:
            continue
        wall = (j["t1"] - j["t0"]) / 1000.0
        if wall < 0.02 or not j["desc"].startswith("profile:"):
            continue
        print(f"job {jid}: {wall:7.3f}s  {j['desc']}")
        for sid in sorted(j["stages"]):
            s = stages.get(sid)
            if s:
                print(
                    f"   stage {sid:4d} {s['ms']/1000.0:7.3f}s "
                    f"tasks={s['tasks']:3d}  {s['name']}"
                )


if __name__ == "__main__":
    main()
