"""kNN query family — the reference's flagship read path.

Reference: find_k_nearest_neighbors (database.py:31-48, impl
kd_tree_database.py:285-304); metric semantics distance_metric.py
(squared Euclidean default :57-60, one-norm :107-109, infinity-norm
:95-104, diagonal Mahalanobis :66-82). Filter-before-topk, ascending
distance, min(k, matches) rows — SURVEY.md §2A.5.

Every query rounds the distance to 6 decimals and tie-breaks by id on
BOTH the Spark and DuckDB side; the double arithmetic is an identical
left-fold in both engines, so value hashes match exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.knn import knn, knn_join
from ..probes import DIM, probe_vector, sql_array
from ..sources import load_table
from . import register

PROBE = probe_vector(seed=0)
PROBE2 = probe_vector(seed=3)
# Diagonal inverse-covariance weights (reference precomputes 1/cov,
# distance_metric.py:71-72); exact 1-decimal values embed losslessly.
INV_DIAG = [1.0 + (i % 4) * 0.5 for i in range(DIM)]

K = 10


def _dist_sql(vec: str, probe_sql_name: str, metric: str) -> str:
    """DuckDB distance expression matching functions/distance.py.

    Uses a 1-based index fold so accumulation order equals Spark's
    aggregate() left fold.
    """
    x = f"CAST({vec}[i] AS DOUBLE)"
    p = f"CAST({probe_sql_name}[i] AS DOUBLE)"
    rng = f"range(1, {DIM + 1})"
    if metric == "euclidean_sq":
        return f"list_sum(list_transform({rng}, i -> ({x} - {p}) * ({x} - {p})))"
    if metric == "manhattan":
        return f"list_sum(list_transform({rng}, i -> abs({x} - {p})))"
    if metric == "chebyshev":
        return f"list_max(list_transform({rng}, i -> abs({x} - {p})))"
    if metric == "mahalanobis_diag":
        w = sql_array(INV_DIAG)
        return (
            f"list_sum(list_transform({rng}, "
            f"i -> ({x} - {p}) * ({x} - {p}) * ({w})[i]))"
        )
    if metric == "cosine":
        dot = f"list_sum(list_transform({rng}, i -> {x} * {p}))"
        na = f"sqrt(list_sum(list_transform({rng}, i -> {x} * {x})))"
        nb = f"sqrt(list_sum(list_transform({rng}, i -> {p} * {p})))"
        return f"1.0 - ({dot}) / (({na}) * ({nb}))"
    raise KeyError(metric)


def _knn_oracle(metric: str, probe: list[float], where: str = "TRUE", k: int = K) -> str:
    return f"""
WITH probe AS (SELECT {sql_array(probe)} AS p)
SELECT vec_id, label, round(dist, 6) AS dist FROM (
  SELECT vec_id, label, {_dist_sql('embedding', 'p', metric)} AS dist
  FROM embeddings CROSS JOIN probe
  WHERE {where}
) ORDER BY dist, vec_id LIMIT {k}
"""


def _mk_knn(metric: str, probe: list[float], pred_fn=None, **kw):
    # pred_fn is a thunk: Column construction needs a live SparkContext,
    # so it must not run at module-import time.
    def q(spark: SparkSession, sf_dir: str) -> DataFrame:
        emb = load_table(spark, sf_dir, "embeddings")
        pred = pred_fn() if pred_fn is not None else None
        out = knn(emb, probe, K, metric=metric, pred=pred, **kw)
        return out.select(
            "vec_id", "label", F.round(F.col("dist"), 6).alias("dist")
        )

    return q


register(
    "knn_euclidean_sq",
    _mk_knn("euclidean_sq", PROBE),
    _knn_oracle("euclidean_sq", PROBE),
)
register(
    "knn_filtered",
    _mk_knn("euclidean_sq", PROBE2, pred_fn=lambda: F.col("label") < 5),
    _knn_oracle("euclidean_sq", PROBE2, where="label < 5"),
)
register("knn_manhattan", _mk_knn("manhattan", PROBE), _knn_oracle("manhattan", PROBE))
register("knn_chebyshev", _mk_knn("chebyshev", PROBE), _knn_oracle("chebyshev", PROBE))
register("knn_cosine", _mk_knn("cosine", PROBE2), _knn_oracle("cosine", PROBE2))
register(
    "knn_mahalanobis_diag",
    _mk_knn("mahalanobis_diag", PROBE, inv_diag=INV_DIAG),
    _knn_oracle("mahalanobis_diag", PROBE),
)


# Full-matrix Mahalanobis over the first 8 dims: S^-1 = L^T L with a
# dense lower-triangular L (off-diagonal entries exact multiples of
# 1/4 so the literal text round-trips identically in both engines).
# The implied inverse covariance has non-zero off-diagonals — the case
# the reference handles with np.linalg.solve per call
# (distance_metric.py:78-80); we factor once and unroll into codegen.
MAHAL_DIMS = 8
MAHAL_L = [
    [((i + 2 * j) % 5 - 2) / 4.0 if i < j else (1.0 if i == j else 0.0)
     for i in range(MAHAL_DIMS)]
    for j in range(MAHAL_DIMS)
]
PROBE_M = probe_vector(seed=5)[:MAHAL_DIMS]


def _mahal_factor_sql(vec: str, probe_name: str) -> str:
    """Unrolled ||L(x-p)||^2 with the same term order and zero-skip as
    functions/distance.mahalanobis_factor."""
    rows = []
    for row in MAHAL_L:
        terms = [
            f"{c!r} * (CAST({vec}[{i + 1}] AS DOUBLE) - {probe_name}[{i + 1}])"
            for i, c in enumerate(row)
            if c != 0.0
        ]
        rows.append("(" + " + ".join(terms) + ")")
    return "(" + " + ".join(f"{r} * {r}" for r in rows) + ")"


def _knn_mahal_full(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings").withColumn(
        "embedding", F.slice("embedding", 1, MAHAL_DIMS)
    )
    out = knn(emb, PROBE_M, K, metric="mahalanobis_factor", factor=MAHAL_L)
    return out.select("vec_id", "label", F.round(F.col("dist"), 6).alias("dist"))


register(
    "knn_mahalanobis_full",
    _knn_mahal_full,
    f"""
WITH probe AS (SELECT {sql_array(PROBE_M)} AS p)
SELECT vec_id, label, round(dist, 6) AS dist FROM (
  SELECT vec_id, label, {_mahal_factor_sql('embedding', 'p')} AS dist
  FROM embeddings CROSS JOIN probe
) ORDER BY dist, vec_id LIMIT {K}
""",
)


def _knn_join_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    probes = emb.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("probe_id"), F.col("embedding").alias("probe_vec")
    )
    out = knn_join(probes, emb, k=3)
    return out.select(
        "probe_id",
        "vec_id",
        F.round(F.col("dist"), 6).alias("dist"),
        F.col("rank").cast("long").alias("rank"),
    )


_KNN_JOIN_ORACLE = f"""
WITH probes AS (
  SELECT vec_id AS probe_id, embedding AS probe_vec
  FROM embeddings WHERE vec_id < 10
), scored AS (
  SELECT p.probe_id, e.vec_id,
         {_dist_sql('e.embedding', 'p.probe_vec', 'euclidean_sq')} AS dist
  FROM embeddings e CROSS JOIN probes p
)
SELECT probe_id, vec_id, round(dist, 6) AS dist, rank FROM (
  SELECT probe_id, vec_id, dist,
         row_number() OVER (PARTITION BY probe_id ORDER BY dist, vec_id) AS rank
  FROM scored
) WHERE rank <= 3
"""

register("knn_join_topk", _knn_join_query, _KNN_JOIN_ORACLE)


def _radius_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.knn import radius_search

    emb = load_table(spark, sf_dir, "embeddings")
    out = radius_search(emb, PROBE, radius=4.2)
    return out.select("vec_id", "label", F.round(F.col("dist"), 6).alias("dist"))


register(
    "radius_search",
    _radius_query,
    f"""
WITH probe AS (SELECT {sql_array(PROBE)} AS p)
SELECT vec_id, label, round(dist, 6) AS dist FROM (
  SELECT vec_id, label, {_dist_sql('embedding', 'p', 'euclidean_sq')} AS dist
  FROM embeddings CROSS JOIN probe
) WHERE dist <= 4.2
ORDER BY dist, vec_id
""",
)
