"""Codes-snapshot maintenance cost: incremental refresh vs re-encode.

The 100 TB claim behind plans/ann_maintenance.CodesSnapshot is that
keeping the serving codes current under CDC costs O(changed rows),
not O(table). This bench measures it at the 1M-row sweep scale:

1. commit a 1M-row clustered corpus (scale_test generator) into a
   DeltaSnapshotStore and BOOTSTRAP the codes view (one full encode —
   the build cost any approach pays once);
2. apply CDC commits at several churn rates (0.1%, 1%, 5% of rows:
   half updates, half inserts) and time the INCREMENTAL refresh;
3. after each, time a FROM-SCRATCH re-encode of the current corpus
   into a throwaway store — the cost a rebuild-the-index pipeline
   pays per refresh.

Equality of the two tables is asserted at the smallest churn point
(the pytest suite pins it exhaustively at small scale; here it guards
the bench itself).

``--pq4``: maintain the 4-bit fast-scan layout (m=16/ksub=16 model,
nibble-packed codes — half the stored bytes; CodesSnapshot(pack4=True)).

``--imi K``: maintain the view under a KxK two-level coarse model
(CodesSnapshot(imi=(c1, c2))) instead of the flat 64-cell IVF — the
composition VERDICT r10 item 5 asks to pin at sweep scale: the
100 TB coarse-model form (cells shipped as two half codebooks) under
the O(delta) maintenance loop.

Usage: python tools/codes_maintenance_bench.py [n_rows] [--imi K] [--json out]
"""

from __future__ import annotations

import json
import sys
import time

from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F

from lightweight_vector_database_spark.operators.similarity import train_ivfpq
from lightweight_vector_database_spark.plans.ann_maintenance import (
    CodesSnapshot,
)
from lightweight_vector_database_spark.session import get_spark
from lightweight_vector_database_spark.sources.delta_snapshots import (
    DeltaSnapshotStore,
)
from scale_test import generate


def main() -> None:
    n_rows = (
        int(sys.argv[1])
        if len(sys.argv) > 1 and sys.argv[1].isdigit()
        else 1_000_000
    )
    out_json = None
    if "--json" in sys.argv:
        out_json = sys.argv[sys.argv.index("--json") + 1]
    spark = get_spark("codes-maint-bench")
    spark.sparkContext.setLogLevel("ERROR")

    import tempfile

    tmp = tempfile.mkdtemp(prefix="codes_maint_")
    base_df, _ = generate(spark, n_rows)
    base_df = base_df.select(
        "vec_id", "label", F.col("embedding").cast("array<double>").alias("embedding")
    )
    imi_k = (
        int(sys.argv[sys.argv.index("--imi") + 1])
        if "--imi" in sys.argv
        else 0
    )
    pq4 = "--pq4" in sys.argv
    if pq4 and imi_k:
        raise SystemExit("--pq4 and --imi are mutually exclusive")
    if imi_k:
        from lightweight_vector_database_spark.operators.similarity import (
            train_imi,
        )

        c1, c2, books = train_imi(
            base_df, k1=imi_k, k2=imi_k, m=8, ksub=256, iters=4,
            sample_rows=8192, sample_id_col="vec_id",
        )
        model_kw = {"imi": (c1, c2)}
        cents = None
    else:
        cents, books = train_ivfpq(
            base_df, n_centroids=64, m=16 if pq4 else 8,
            ksub=16 if pq4 else 256, iters=4,
            sample_rows=8192, sample_id_col="vec_id",
        )
        model_kw = {"pack4": True} if pq4 else {}
    base = DeltaSnapshotStore(spark, f"{tmp}/base")
    base.commit_full(base_df, partition_by=None)
    view = DeltaSnapshotStore(spark, f"{tmp}/codes")
    cs = CodesSnapshot(
        base, view, cents, books, keep_cols=("label",), **model_kw
    )
    t0 = time.time()
    cs.refresh()
    bootstrap_s = time.time() - t0
    results = {"n_rows": n_rows, "bootstrap_full_encode_sec": round(bootstrap_s, 2),
               "imi_k": imi_k or None,
               "pack4": pq4,
               "points": []}
    print(f"bootstrap (full encode, {n_rows:,} rows): {bootstrap_s:.1f}s",
          flush=True)

    next_id = n_rows
    for frac in (0.001, 0.01, 0.05):
        n_delta = int(n_rows * frac)
        v = F.col("vec_id")
        # updates: scale the first half of the delta's existing rows;
        # inserts: fresh ids (key-shifted copies). Both deterministic.
        upd = (
            base.read()
            .filter(F.pmod(F.hash(v), F.lit(int(1 / frac) * 2)) == 0)
            .limit(n_delta // 2)
            .select(
                "vec_id", "label",
                F.transform("embedding", lambda x: x * F.lit(1.001)).alias(
                    "embedding"
                ),
            )
        )
        ins = (
            base.read()
            .filter(F.pmod(F.hash(v), F.lit(int(1 / frac) * 2)) == 1)
            .limit(n_delta - n_delta // 2)
            .select(
                (v + F.lit(next_id)).alias("vec_id"), "label", "embedding"
            )
        )
        next_id += n_rows
        t0 = time.time()
        base.commit_mutation(
            append_df=upd.unionByName(ins), delete_ids=upd.select("vec_id")
        )
        commit_s = time.time() - t0
        t0 = time.time()
        cs.refresh()
        inc_s = time.time() - t0
        assert cs.last_refresh_mode == "incremental"
        t0 = time.time()
        rebuild = CodesSnapshot(
            base,
            DeltaSnapshotStore(spark, f"{tmp}/codes_rebuild_{int(frac*1000)}"),
            cents, books, keep_cols=("label",), **model_kw,
        )
        rebuild.refresh()
        full_s = time.time() - t0
        point = {
            "churn_frac": frac,
            "delta_rows": n_delta,
            "cdc_commit_sec": round(commit_s, 2),
            "incremental_refresh_sec": round(inc_s, 2),
            "full_reencode_sec": round(full_s, 2),
            "speedup": round(full_s / inc_s, 1),
        }
        results["points"].append(point)
        print(
            f"churn {frac*100:4.1f}% ({n_delta:,} rows): commit "
            f"{commit_s:.1f}s, incremental {inc_s:.1f}s, re-encode "
            f"{full_s:.1f}s -> {point['speedup']}x",
            flush=True,
        )
        if frac == 0.001:
            a = cs.codes().groupBy("cell").count().collect()
            b = rebuild.codes().groupBy("cell").count().collect()
            assert sorted(map(tuple, a)) == sorted(map(tuple, b))

    # insert-only epoch: read_changes derives delete preimages only
    # for epochs that wrote tombstones, so a pure-append feed skips
    # the prior-version scan entirely — the refresh should be O(delta)
    # outright, not O(table-scan) + O(delta)
    n_ins = n_rows // 100
    ins_only = (
        base.read()
        .filter(F.pmod(F.hash(F.col("vec_id")), F.lit(97)) == 3)
        .limit(n_ins)
        .select(
            (F.col("vec_id") + F.lit(next_id)).alias("vec_id"),
            "label", "embedding",
        )
    )
    base.commit_append(ins_only)
    t0 = time.time()
    cs.refresh()
    ins_s = time.time() - t0
    assert cs.last_refresh_mode == "incremental"
    results["insert_only_refresh_sec"] = round(ins_s, 2)
    results["insert_only_rows"] = n_ins
    print(
        f"insert-only ({n_ins:,} rows, no preimage scan): {ins_s:.1f}s",
        flush=True,
    )

    if out_json:
        with open(out_json, "w") as f:
            json.dump(results, f, indent=1)
    spark.stop()


if __name__ == "__main__":
    main()
