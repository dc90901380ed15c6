"""CDC read-amplification micro-bench (VERDICT r9 item 7).

Drives a continuous-CDC workload (append / atomic-update / delete
epochs over the sf1 embeddings table) into two DeltaSnapshotStores —
one with the store-level ``auto_compact_depth`` ceiling, one without —
and measures full-read wall time as the log grows. The uncompacted
read pays one scan per add dir plus one anti-join per tombstone group
(O(history)); the ceiling keeps it O(table).

Usage: python tools/cdc_read_amp_bench.py [--epochs 48] [--depth 8]
           [--json CDC_READAMP_sf1.json]
"""

from __future__ import annotations

import json
import shutil
import sys
import tempfile
import time

from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F

SF1_EMB = "/root/repo/.sf1_data/embeddings.parquet"
MEASURE_EVERY = 8


def main() -> None:
    epochs = (
        int(sys.argv[sys.argv.index("--epochs") + 1])
        if "--epochs" in sys.argv
        else 48
    )
    depth = (
        int(sys.argv[sys.argv.index("--depth") + 1])
        if "--depth" in sys.argv
        else 8
    )
    out_json = (
        sys.argv[sys.argv.index("--json") + 1]
        if "--json" in sys.argv
        else "CDC_READAMP_sf1.json"
    )
    from lightweight_vector_database_spark.session import get_spark
    from lightweight_vector_database_spark.sources.delta_snapshots import (
        DeltaSnapshotStore,
    )

    spark = get_spark("cdc-read-amp")
    spark.sparkContext.setLogLevel("ERROR")
    emb = spark.read.parquet(SF1_EMB).select("vec_id", "label", "embedding")
    n = emb.count()
    slice_rows = max(200, n // (epochs * 2))

    tmp = tempfile.mkdtemp(prefix="cdc_read_amp_")
    results = []
    try:
        for mode, kw in (
            ("unbounded", {}),
            ("auto_compact", {"auto_compact_depth": depth}),
        ):
            store = DeltaSnapshotStore(spark, f"{tmp}/{mode}", **kw)
            store.commit_full(
                emb.filter(F.col("vec_id") < n // 2),
                partition_by=None,
            )
            for e in range(epochs):
                lo = (e * slice_rows) % (n // 2)
                batch = emb.filter(
                    (F.col("vec_id") >= n // 2 + lo)
                    & (F.col("vec_id") < n // 2 + lo + slice_rows)
                )
                kind = e % 3
                if kind == 0:
                    store.commit_append(batch)
                elif kind == 1:
                    upd = emb.filter(
                        (F.col("vec_id") >= lo) & (F.col("vec_id") < lo + 64)
                    )
                    store.commit_mutation(
                        append_df=upd, delete_ids=upd.select("vec_id")
                    )
                else:
                    store.commit_delete(
                        emb.filter(
                            (F.col("vec_id") >= lo)
                            & (F.col("vec_id") < lo + 32)
                        ).select("vec_id")
                    )
                if (e + 1) % MEASURE_EVERY == 0:
                    t0 = time.time()
                    cnt = store.read().count()
                    dt = time.time() - t0
                    adds, tombs = store.log_depth()
                    rec = {
                        "mode": mode,
                        "epoch": e + 1,
                        "read_sec": round(dt, 3),
                        "rows": cnt,
                        "n_adds": adds,
                        "n_tombstones": tombs,
                    }
                    results.append(rec)
                    print(rec, flush=True)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)

    with open(out_json, "w") as f:
        json.dump(
            {
                "source": SF1_EMB,
                "n_rows": n,
                "epochs": epochs,
                "auto_compact_depth": depth,
                "note": "full-read wall seconds vs CDC epoch; the "
                "ceiling keeps (n_adds + n_tombstones) bounded so read "
                "cost stays O(table) instead of O(history)",
                "results": results,
            },
            f,
            indent=1,
        )
    spark.stop()


if __name__ == "__main__":
    main()
