"""Iterative graph operators — dedup clustering.

Near-dup pairs (from jaccard_pairs / minhash LSH) form a graph; the
dedup policy 'keep one doc per duplicate CLUSTER' needs connected
components, not just pairs. This is the canonical iterative-dataflow
algorithm Spark handles with a driver loop over joins (no custom
engine support needed):

label propagation to the component minimum — each iteration joins the
current labels across edges and takes the min neighbor label;
converges in O(diameter) rounds. Each round is one shuffle on the
node id; ``localCheckpoint`` truncates the growing lineage so round N
doesn't replay rounds 1..N-1 (the classic iterative-Spark trap).

At 100 TB-scale graphs you'd switch to the large-star/small-star
variant (fewer rounds on high-degree graphs); the driver-loop
structure is identical.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    src: str = "id1",
    dst: str = "id2",
    max_iter: int = 20,
) -> DataFrame:
    """(node, component) where component = min node id reachable.

    ``edges`` is undirected input (each pair once is fine).
    """
    nodes = (
        edges.select(F.col(src).alias("node"))
        .unionByName(edges.select(F.col(dst).alias("node")))
        .distinct()
    )
    labels = nodes.withColumn("component", F.col("node"))
    sym = edges.select(F.col(src).alias("a"), F.col(dst).alias("b")).unionByName(
        edges.select(F.col(dst).alias("a"), F.col(src).alias("b"))
    )
    sym = sym.localCheckpoint(eager=True)

    for _ in range(max_iter):
        # candidate label for each node: min over neighbors' labels
        neighbor_min = (
            sym.join(labels, sym.b == labels.node)
            .groupBy("a")
            .agg(F.min("component").alias("nmin"))
            .withColumnRenamed("a", "node")
        )
        new_labels = (
            labels.join(neighbor_min, "node", "left")
            .select(
                "node",
                F.least(
                    F.col("component"), F.coalesce(F.col("nmin"), F.col("component"))
                ).alias("component"),
            )
        )
        new_labels = new_labels.localCheckpoint(eager=True)
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "node")
            .filter(F.col("n.component") != F.col("o.component"))
            .limit(1)
            .count()
        )
        labels = new_labels
        if changed == 0:
            break
    return labels


def dedup_clusters(
    docs: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    max_iter: int = 20,
) -> DataFrame:
    """Cluster docs by near-dup pairs; singleton docs get their own id.
    Output: (doc_id, cluster, is_keeper)."""
    comp = connected_components(pairs, max_iter=max_iter)
    out = docs.select(F.col(id_col)).join(
        comp.withColumnRenamed("node", id_col), id_col, "left"
    )
    out = out.withColumn("cluster", F.coalesce("component", F.col(id_col))).drop(
        "component"
    )
    return out.withColumn("is_keeper", F.col(id_col) == F.col("cluster"))
