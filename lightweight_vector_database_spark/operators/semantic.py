"""Semantic deduplication over embeddings (SemDeDup-style).

Abbas et al., "SemDeDup: Data-efficient learning at web-scale through
semantic deduplication" (arXiv:2303.09540): cluster the corpus
embeddings with k-means, then look for near-duplicate pairs ONLY
within each cluster — the clustering turns the O(n^2) all-pairs
problem into sum_c O(|c|^2) with |c| ~ n / n_clusters, the same
quadratic-taming move as the LSH band buckets in operators/dedup.py
(there by hash collision, here by geometry).

Pipeline pieces reused:
* centroids come from ``similarity.train_centroids`` (seeded-uniform
  sample, deterministic Lloyd) — the same codebook machinery as IVF;
* assignment is ``similarity.ivf_assign`` — pure-codegen fold for
  query use, Arrow matmul for bulk builds;
* the within-cluster self-join is capped like dedup's LSH buckets:
  ``max_cluster`` drops oversized clusters with the dropped mass
  LOGGED (an eager audit action, same trade-off as
  dedup._cap_band_sides — documented, not silent).

At 100 TB the knob is n_clusters ~ corpus/target_cluster_size (the
paper uses 50k clusters for LAION): cluster count grows with the
corpus so per-cluster work stays bounded, and the join shuffles on
``cell`` — a key whose cardinality you control.

The reference has no text/embedding dedup surface at all (513-LoC
kd-tree, kd_tree_database.py); engine extra for the LLM-pipeline
north star.
"""

from __future__ import annotations

import logging

import numpy as np

from pyspark.sql import DataFrame, functions as F

from ..functions.distance import _as_double, _fold_sum
from .similarity import ivf_assign

logger = logging.getLogger(__name__)


def semantic_pairs(
    df: DataFrame,
    centroids: np.ndarray,
    min_cos_sim: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    max_cluster: int | None = None,
) -> DataFrame:
    """(cell, id1, id2, cos_sim) for every same-cluster pair with
    cosine similarity >= ``min_cos_sim`` (id1 < id2).

    ``max_cluster``: clusters larger than this are DROPPED from pair
    enumeration (their row count is logged) — the oversized-bucket cap
    that keeps a degenerate clustering from going quadratic. Passing
    it makes this an eager transform (one count action), same contract
    as dedup's capped pair generators.
    """
    assigned = ivf_assign(df, centroids, vec_col=vec_col).select(
        F.col(id_col).alias("__id"), F.col(vec_col).alias("__v"), "cell"
    )
    if not df.isStreaming:
        # scan-parallelism fix (see dedup.minhash_signatures): the pair
        # join below broadcasts one side, so the streamed side — which
        # carries the interpreted argmin-assignment fold AND the
        # per-pair dot scoring — otherwise inherits a single-row-group
        # scan's ONE task (no-op at real scale)
        from ..sources import fan_out

        assigned = fan_out(assigned)
    if max_cluster is not None:
        sizes = assigned.groupBy("cell").count()
        big = sizes.filter(F.col("count") > max_cluster)
        dropped = [(r["cell"], r["count"]) for r in big.collect()]
        if dropped:
            logger.warning(
                "semantic_pairs: dropping %d oversized clusters (cap %d): %s",
                len(dropped), max_cluster, dropped,
            )
            over = [r[0] for r in dropped]
            assigned = assigned.filter(~F.col("cell").isin(over))
    # L2 norms hoisted to a per-ROW projection below the pair join:
    # one interpreted fold per vector instead of two per PAIR.
    # Bit-identical — the norm is the same sqrt(fold) over the same
    # doubles, and the final dot/(na*nb) is the same expression tree.
    vv = _as_double(F.col("__v"))
    assigned = assigned.withColumn(
        "__n", F.sqrt(_fold_sum(F.zip_with(vv, vv, lambda x, y: x * y)))
    )
    a = assigned.select(
        "cell",
        F.col("__id").alias("id1"),
        F.col("__v").alias("__v1"),
        F.col("__n").alias("__n1"),
    )
    b = assigned.select(
        "cell",
        F.col("__id").alias("id2"),
        F.col("__v").alias("__v2"),
        F.col("__n").alias("__n2"),
    )
    # cos similarity spelled as dot/(|a||b|) DIRECTLY (not 1 - cos_dist:
    # 1-(1-x) != x in floats, and the DuckDB oracle must replay the
    # identical arithmetic). Left folds match list_sum accumulation.
    v1, v2 = _as_double(F.col("__v1")), _as_double(F.col("__v2"))
    num = _fold_sum(F.zip_with(v1, v2, lambda x, y: x * y))
    sim = num / (F.col("__n1") * F.col("__n2"))
    return (
        a.join(b, "cell")
        .filter(F.col("id1") < F.col("id2"))
        .withColumn("cos_sim", sim)
        .filter(F.col("cos_sim") >= F.lit(float(min_cos_sim)))
        .select("cell", "id1", "id2", "cos_sim")
    )


def semantic_drop_summary(
    df: DataFrame,
    pairs: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroids: np.ndarray | None = None,
) -> DataFrame:
    """Per-cluster dedup summary under the prefix-keep rule: a row is
    DROPPED iff some lower-id row in its cluster is semantically
    similar to it (id2 of any surviving pair). One anti-join — no
    iteration; the rule is a deterministic single-pass approximation
    of SemDeDup's keep-one-per-group (exact transitive closure is
    operators/graph.connected_components, already used by
    dedup_lsh_clusters).

    Returns (cell, n_vecs, n_dropped) per cluster.
    """
    if centroids is not None:
        assigned = ivf_assign(df, centroids, vec_col=vec_col)
    else:
        assigned = df
    dropped = pairs.select(F.col("id2").alias(id_col)).distinct().withColumn(
        "__dropped", F.lit(1)
    )
    return (
        assigned.join(dropped, id_col, "left")
        .groupBy("cell")
        .agg(
            F.count("*").alias("n_vecs"),
            F.sum(F.coalesce(F.col("__dropped"), F.lit(0))).alias("n_dropped"),
        )
    )
