"""Run EVERY registered suite query at a given scale factor and record
wall time + row count per query — the breadth-at-scale probe.

The bench (bench.py) times 23 headline queries; this runs all ~143,
proving the whole surface executes at the target SF, not just the
headliners. No oracle here (DuckDB at sf1 can't run the O(n^2) twins
in reasonable time); correctness is pinned at sf0.01 by
tools/check_oracle.py.

A few registered queries are EXACT SMALL-SCALE BASELINES whose whole
point is to oracle the approximate scale path (all-pairs jaccard /
all-pairs embedding cosine). Those are quadratic by design and are
skipped at sf >= 1 with the reason printed — their scale-path twins
(minhash LSH, SRP LSH, IVF) run instead. Everything else runs.

Usage: python tools/run_all_queries.py [sf_dir] [out_json]
           [--only prefix1,prefix2]

``--only`` restricts to queries whose name starts with one of the
given prefixes — the sf10 family slices (dedup/ann/stream) use it so
the 100x point doesn't re-run the TPC-H scaling BENCH_sf10 already
charts.
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from lightweight_vector_database_spark.session import get_spark  # noqa: E402
from lightweight_vector_database_spark.suite import (  # noqa: E402
    QUADRATIC,
    QUERIES,
)

def main() -> None:
    args = list(sys.argv[1:])
    only: tuple[str, ...] | None = None
    if "--only" in args:
        i = args.index("--only")
        only = tuple(args[i + 1].split(","))
        del args[i : i + 2]
    sf_dir = args[0] if args else str(
        Path(__file__).resolve().parent.parent / ".sf1_data"
    )
    out_path = args[1] if len(args) > 1 else None
    big = "sf0" not in Path(sf_dir).name  # sf1-sized fixture or larger

    spark = get_spark("run-all-queries")
    spark.sparkContext.setLogLevel("ERROR")
    # same materialization as bench.py: noop V2 sink computes every
    # column (count() would let Catalyst prune the projections)
    spark.range(32).write.format("noop").mode("overwrite").save()

    # stage the serving snapshots OUTSIDE the timed loop (same reason
    # bench.py calls warm_index): the first zorder_box_read otherwise
    # pays the O(table) clustered snapshot build inside its timing
    from lightweight_vector_database_spark.suite.layout_suite import (
        warm_layout,
    )

    warm_layout(spark, sf_dir)

    results: dict[str, dict] = {}
    t_all = time.time()
    for name, fn in QUERIES.items():
        if only is not None and not name.startswith(only):
            continue
        if big and name in QUADRATIC:
            print(f"SKIP  {name}: {QUADRATIC[name]}")
            results[name] = {"status": "SKIP", "reason": QUADRATIC[name]}
            continue
        t0 = time.time()
        try:
            df = fn(spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()
            n = df.count()
            dt = time.time() - t0
            results[name] = {"status": "OK", "rows": n, "sec": round(dt, 3)}
            print(f"OK    {name}: {n} rows in {dt:.2f}s")
        except Exception as e:  # record, keep going — breadth is the point
            dt = time.time() - t0
            msg = str(e).splitlines()[0][:200]
            results[name] = {"status": "ERR", "sec": round(dt, 3), "err": msg}
            print(f"ERR   {name}: {msg}")
        # release per-query cached relations: 226 queries through ONE
        # session otherwise accumulate storage memory until a later
        # heavy hash-agg tips the heap (observed: containment_pairs
        # OOM'd the r8 sweep at sf1 after 164 queries; r7's shorter
        # registry squeaked by)
        from lightweight_vector_database_spark.operators.dedup import (
            unpersist_caches,
        )

        unpersist_caches()
        spark.catalog.clearCache()
    total = time.time() - t_all

    ok = sum(1 for r in results.values() if r["status"] == "OK")
    err = sum(1 for r in results.values() if r["status"] == "ERR")
    skip = sum(1 for r in results.values() if r["status"] == "SKIP")
    summary = {
        "sf_dir": sf_dir,
        "total": len(results),
        "ok": ok,
        "err": err,
        "skip": skip,
        "wall_sec": round(total, 1),
        "queries": results,
    }
    print(f"\n{ok} ok / {err} err / {skip} skip of {len(results)}"
          f" in {total:.1f}s")
    if out_path:
        Path(out_path).write_text(json.dumps(summary, indent=1))
        print(f"wrote {out_path}")


if __name__ == "__main__":
    main()
