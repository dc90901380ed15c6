"""TPC-H power run: execute all 22 adapted TPC-H queries sequentially
at $SPARK_GRAFT_SF_DIR (default sf0.1) and print per-query + total
times as one JSON line. A second pass reports warm (plan-cached /
JIT-compiled) times — the steady-state serving picture.

Usage: python tools/tpch_run.py [sf_dir]
"""

from __future__ import annotations

import json
import sys
import time

from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

TPCH = [
    "q1_pricing_summary",
    "q2_min_cost_supplier",
    "q3_top_revenue_orders",
    "q4_priority_counts",
    "q5_revenue_by_nation",
    "q6_forecast_revenue",
    "q7_nation_volume",
    "q8_market_share",
    "q9_product_profit",
    "q10_returned_revenue",
    "q11_important_parts",
    "q12_late_shipments",
    "q13_order_distribution",
    "q14_promo_revenue",
    "q15_top_supplier",
    "q16_supplier_part_counts",
    "q17_small_qty_revenue",
    "q18_large_volume",
    "q19_discounted_revenue",
    "q20_heavy_gear_shippers",
    "q21_waiting_suppliers",
    "q22_idle_customers",
]


def main() -> None:
    import os

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
    )
    from lightweight_vector_database_spark.session import get_spark
    from lightweight_vector_database_spark.suite import QUERIES

    spark = get_spark("tpch-power")
    spark.sparkContext.setLogLevel("ERROR")
    QUERIES["q1_pricing_summary"](spark, sf_dir).collect()  # JVM warmup

    out: dict[str, dict[str, float]] = {}
    for label in ("cold", "warm"):
        times = {}
        t_all = time.perf_counter()
        for name in TPCH:
            t0 = time.perf_counter()
            n = QUERIES[name](spark, sf_dir).count()
            times[name] = round(time.perf_counter() - t0, 3)
            print(f"# {label} {name}: {times[name]:.3f}s ({n} rows)", file=sys.stderr)
        out[label] = {"total": round(time.perf_counter() - t_all, 3), **times}
    print(json.dumps({"metric": "tpch_power_run", "sf_dir": sf_dir, **out}))


if __name__ == "__main__":
    main()
