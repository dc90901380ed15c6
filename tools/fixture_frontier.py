"""Record the semantic-ANN dedup operating-point frontier at fixture
scale (VERDICT r8 item 7).

For each candidate (nprobe, refine) point this measures the
dedup_semantic_ann shape at sf0.01 — the corpus probing ITSELF through
the IVF-PQ tier — against the brute within-threshold pair set, and
records PAIR recall (the semantic-dedup contract, stricter than
kNN recall) plus wall seconds. The output JSON's ``results`` are
frontier records consumable directly by
operators/tiering.ann_operating_point; suite/pipeline_suite11 resolves
the registered query's (nprobe, refine) from this recording instead of
hard-coding it.

Usage: python tools/fixture_frontier.py [--json FRONTIER_sf001.json]
"""

from __future__ import annotations

import json
import sys
import time

from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F

SF_DIR = "/root/testdata/sf0.01"
POINTS = [(1, 2), (2, 2), (2, 4), (4, 4), (8, 4), (8, 8)]


def main() -> None:
    out_json = (
        sys.argv[sys.argv.index("--json") + 1]
        if "--json" in sys.argv
        else "FRONTIER_sf001.json"
    )
    from lightweight_vector_database_spark.functions.distance import (
        euclidean_sq,
    )
    from lightweight_vector_database_spark.operators.dedup import (
        unpersist_caches,
    )
    from lightweight_vector_database_spark.plans.ann_join import ann_join_topk
    from lightweight_vector_database_spark.session import get_spark
    from lightweight_vector_database_spark.sources import load_table
    from lightweight_vector_database_spark.suite.pipeline_suite11 import (
        _SD_K,
        _SD_TAU,
        _aj_codes,
        _aj_model,
    )

    spark = get_spark("fixture-frontier")
    spark.sparkContext.setLogLevel("ERROR")
    emb = load_table(spark, SF_DIR, "embeddings")
    cents, books = _aj_model(spark, SF_DIR)
    codes = _aj_codes(spark, SF_DIR)
    codes.count()
    n = emb.count()

    # brute within-threshold pair set (the ground truth)
    a = emb.select(F.col("vec_id").alias("id1"), F.col("embedding").alias("va"))
    b = emb.select(F.col("vec_id").alias("id2"), F.col("embedding").alias("vb"))
    want = {
        (r.id1, r.id2)
        for r in a.join(b, F.col("id1") < F.col("id2"))
        .withColumn("d", euclidean_sq(F.col("va"), F.col("vb")))
        .filter(F.col("d") <= _SD_TAU)
        .select("id1", "id2")
        .collect()
    }
    probes = emb.select(
        F.col("vec_id").alias("probe_id"),
        F.col("embedding").cast("array<double>").alias("probe_vec"),
    )

    results = []
    for nprobe, refine in POINTS:
        t0 = time.time()
        nn = ann_join_topk(
            codes, cents, books, probes, raw=emb, k=_SD_K,
            nprobe=nprobe, refine=refine,
        )
        got = {
            (r.id1, r.id2)
            for r in nn.filter(
                (F.col("vec_id") != F.col("probe_id"))
                & (F.col("dist") <= F.lit(_SD_TAU))
            )
            .select(
                F.least("probe_id", "vec_id").alias("id1"),
                F.greatest("probe_id", "vec_id").alias("id2"),
            )
            .distinct()
            .collect()
        }
        dt = time.time() - t0
        unpersist_caches()
        rec = {
            "nprobe": nprobe,
            "refine": refine,
            "recall": round(len(got & want) / max(1, len(want)), 4),
            "probes_per_sec": round(n / dt, 1),
            "n_probes": n,
            "sec": round(dt, 2),
        }
        results.append(rec)
        print(rec, flush=True)

    with open(out_json, "w") as f:
        json.dump(
            {
                "sf_dir": SF_DIR,
                "k": _SD_K,
                "tau": _SD_TAU,
                "metric_note": "recall is PAIR recall of the "
                "dedup_semantic_ann shape vs the brute within-threshold "
                "pair set",
                "results": results,
            },
            f,
            indent=1,
        )
    spark.stop()


if __name__ == "__main__":
    main()
