"""Connected-components scale stress: long-chain graphs at 1M+ edges.

The large/small-star implementation (operators/graph.py) exists
because naive min-label propagation needs O(diameter) rounds — a
scale-killer on long dup-chains. This probe builds the adversarial
shape directly: many disjoint chains of length L (diameter L), all
generated Spark-side (no driver materialization), runs
``connected_components`` under its DEFAULT max_iter, and verifies
every label exactly with one aggregation (node i belongs to chain
floor(i / L) whose min node is its label).

Usage: python tools/cc_scale_test.py [n_nodes] [chain_len]
"""

from __future__ import annotations

import sys
import time

from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F

from lightweight_vector_database_spark.operators.graph import connected_components
from lightweight_vector_database_spark.session import get_spark


def main() -> None:
    n_nodes = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    chain_len = int(sys.argv[2]) if len(sys.argv) > 2 else 1_000

    spark = get_spark("cc-scale")
    spark.sparkContext.setLogLevel("ERROR")

    # chains: edge (i, i+1) unless i+1 starts the next chain
    edges = (
        spark.range(n_nodes - 1)
        .filter((F.col("id") + 1) % chain_len != 0)
        .select(F.col("id").alias("id1"), (F.col("id") + 1).alias("id2"))
    )
    n_edges = edges.count()  # also materializes the range outside timing
    n_components = (n_nodes + chain_len - 1) // chain_len

    t0 = time.perf_counter()
    comp = connected_components(edges)
    # exact validation in ONE aggregation: every node's label must be
    # the first node of its chain
    bad = comp.filter(
        F.col("component") != (F.col("node") - F.pmod(F.col("node"), chain_len))
    ).count()
    n_labels = comp.select("component").distinct().count()
    elapsed = time.perf_counter() - t0

    print(
        f"nodes={n_nodes} edges={n_edges} chain_len={chain_len} "
        f"components={n_labels}/{n_components} bad_labels={bad} "
        f"time={elapsed:.1f}s"
    )
    assert bad == 0, "wrong labels"
    assert n_labels == n_components, "wrong component count"
    print("OK — converged under default max_iter with exact labels")


if __name__ == "__main__":
    main()
