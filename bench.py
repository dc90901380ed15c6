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
    # warm the noop sink (first V2 write pays datasource resolution)
    spark.range(32).write.format("noop").mode("overwrite").save()
    # index stats are a build-time artifact (shipped with the indexed
    # snapshot); build them here so knn_grid_indexed times serving
    from lightweight_vector_database_spark.suite.index_suite import warm_index
    warm_index(spark, sf_dir)

    times: dict[str, float] = {}
    for name in HEADLINE:
        fn = QUERIES[name]
        t0 = time.perf_counter()
        df = fn(spark, sf_dir)
        # noop sink, not count(): count() lets Catalyst prune every
        # column, so map-only queries (redact, text stats, features)
        # would under-report; the noop write materializes all columns
        # at full width — the honest cost of producing the result.
        df.write.format("noop").mode("overwrite").save()
        times[name] = round(time.perf_counter() - t0, 3)
        n = df.count()  # diagnostics only — outside the timed window
        print(f"# {name}: {times[name]:.3f}s ({n} rows)", file=sys.stderr)

    total = round(sum(times.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_suite_total",
                "value": total,
                "unit": "sec",
                "queries": times,
                "sf": sf_val,
            }
        )
    )


if __name__ == "__main__":
    main()
