"""Training-pipeline queries, tenth batch (round 7): plain and
FILTERED IVF serving.

* ``ann_ivf_topk`` — the plain IVF coarse-quantizer search
  (operators/similarity.ivf_search): nprobe nearest cells scanned,
  exact distance inside them. Until now IVF appeared only inside the
  PQ paths; this registers the coarse tier itself.
* ``ann_ivf_filtered`` — filtered ANN, the classically hard vector-DB
  case: a metadata predicate applied BEFORE top-k (pre-filter
  semantics, matching the reference's filter-before-topk contract for
  brute kNN), probing the nprobe nearest QUALIFYING cells.
* ``ann_ivf_filtered_hard`` — the predicate is cell-correlated: it
  empties the probe's nearest cells entirely, the case where
  inside-the-probed-cells filtering (pre-r9) starved the result.
All three share the semantic-dedup centroids (same seeded-uniform
sample, same Lloyd refinement), and the oracle retrains them in numpy
from the identical sample rule and replays assignment + qualification
+ search in SQL.
"""

from __future__ import annotations

import numpy as np

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.similarity import (
    ivf_assign,
    ivf_cell_order,
    ivf_search,
    train_centroids_np,
)
from ..probes import DIM, probe_vector
from ..sources import load_table
from . import register
from .index_suite import _ORACLE_SF_DIR, _dlst, _dlst2
from .pipeline_suite import _SEM_CLUSTERS, _semantic_centroids

_IVF_PROBE = probe_vector(seed=19)
_IVF_K = 10
_IVF_NPROBE = 3


def _ivf_query(pred_sql: str | None):
    def q(spark: SparkSession, sf_dir: str) -> DataFrame:
        emb = load_table(spark, sf_dir, "embeddings")
        cents = _semantic_centroids(spark, sf_dir)
        assigned = ivf_assign(emb, cents)
        pred = None if pred_sql is None else F.expr(pred_sql)
        out = ivf_search(
            assigned, cents, _IVF_PROBE, k=_IVF_K, nprobe=_IVF_NPROBE,
            pred=pred,
        )
        return out.select(
            "vec_id",
            "label",
            F.col("cell").cast("long").alias("cell"),
            F.round(F.col("dist"), 6).alias("dist"),
        )

    return q


def _ivf_oracle(pred_sql: str | None) -> str | None:
    try:
        import duckdb

        con = duckdb.connect()
        rows = con.execute(
            f"SELECT embedding FROM '{_ORACLE_SF_DIR}/embeddings.parquet' "
            "ORDER BY md5(CAST(vec_id AS VARCHAR)) LIMIT 2048"
        ).fetchall()
        con.close()
    except Exception:  # fixture absent: rows-only
        return None
    if not rows:
        return None
    sample = np.array([r[0] for r in rows], dtype=np.float64)
    cents = train_centroids_np(sample, _SEM_CLUSTERS, iters=5, seed=42)
    order = ivf_cell_order(cents, _IVF_PROBE)
    cents_sql = _dlst2(cents.tolist())
    rng = f"range(1, {DIM + 1})"
    probe_sql = _dlst(list(_IVF_PROBE))
    dist = (
        f"list_sum(list_transform({rng}, i -> "
        f"(CAST(embedding[i] AS DOUBLE) - ({probe_sql})[i]) * "
        f"(CAST(embedding[i] AS DOUBLE) - ({probe_sql})[i])))"
    )
    if pred_sql is None:
        # unfiltered: the probed cells are a driver-side constant
        probe_cells = ", ".join(str(c) for c in order[:_IVF_NPROBE])
        pcells_cte = ""
        where = f"cell IN ({probe_cells})"
    else:
        # filtered: replay the QUALIFYING-cell routing in SQL — the
        # driver-computed centroid-distance preference order is a
        # literal, the data-dependent qualification (>=1 matching row
        # per cell) is a subquery, exactly mirroring ivf_search's
        # distinct-collect + masked order (operators/similarity.py)
        pref = ", ".join(f"({c}, {r})" for r, c in enumerate(order))
        pcells_cte = f""",
pcells AS (
  SELECT cell FROM (VALUES {pref}) AS pref(cell, rnk)
  WHERE cell IN (SELECT DISTINCT cell FROM assigned WHERE ({pred_sql}))
  ORDER BY rnk LIMIT {_IVF_NPROBE}
)"""
        where = f"cell IN (SELECT cell FROM pcells) AND ({pred_sql})"
    return f"""
WITH assigned AS (
  SELECT vec_id, label, embedding,
         list_position(cd, list_min(cd)) - 1 AS cell
  FROM (
    SELECT vec_id, label, embedding,
           list_transform({cents_sql}, c -> list_sum(list_transform({rng},
             i -> (CAST(embedding[i] AS DOUBLE) - c[i]) *
                  (CAST(embedding[i] AS DOUBLE) - c[i])))) AS cd
    FROM embeddings
  )
){pcells_cte}
SELECT vec_id, label, CAST(cell AS BIGINT) AS cell, round(dist, 6) AS dist
FROM (
  SELECT vec_id, label, cell, {dist} AS dist
  FROM assigned WHERE {where}
) ORDER BY dist ASC, vec_id ASC LIMIT {_IVF_K}
"""


register("ann_ivf_topk", _ivf_query(None), _ivf_oracle(None))
register(
    "ann_ivf_filtered", _ivf_query("label < 5"), _ivf_oracle("label < 5")
)
# The cell-correlated case: at sf0.01 this predicate (21 of 500 rows)
# leaves NO matching rows in two of the probe's three nearest cells,
# so pre-r9 inside-the-probed-cells filtering returned 3 rows. The
# qualifying-cell routing probes the nearest three cells that CAN
# answer and returns the full k — and the oracle replays that routing
# (pcells CTE), so the match is exact, not rows-only.
register(
    "ann_ivf_filtered_hard",
    _ivf_query("vec_id % 23 = 18"),
    _ivf_oracle("vec_id % 23 = 18"),
)


# --- query-by-id ("more like this") -----------------------------------------------

_MLT_ID = 42
_MLT_K = 10


def _knn_by_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The vector-store "more like this" surface: the probe is an
    EXISTING row's vector (fetched by id — one O(dim) driver lookup,
    the serving-path metadata pattern), self excluded from results."""
    from ..operators.knn import knn

    emb = load_table(spark, sf_dir, "embeddings")
    probe_row = emb.filter(F.col("vec_id") == _MLT_ID).select(
        "embedding"
    ).collect()
    if not probe_row:
        raise ValueError(f"vec_id {_MLT_ID} not found")
    probe = [float(x) for x in probe_row[0]["embedding"]]
    out = knn(
        emb, probe, _MLT_K, metric="euclidean_sq",
        pred=F.col("vec_id") != _MLT_ID,
    )
    return out.select(
        "vec_id", "label", F.round(F.col("dist"), 6).alias("dist")
    )


def _knn_by_id_oracle() -> str:
    rng = f"range(1, {DIM + 1})"
    x = "CAST(e.embedding[i] AS DOUBLE)"
    p = "CAST(q.embedding[i] AS DOUBLE)"
    return f"""
WITH q AS (SELECT embedding FROM embeddings WHERE vec_id = {_MLT_ID})
SELECT vec_id, label, round(dist, 6) AS dist FROM (
  SELECT e.vec_id, e.label,
         list_sum(list_transform({rng},
           i -> ({x} - {p}) * ({x} - {p}))) AS dist
  FROM embeddings e CROSS JOIN q
  WHERE e.vec_id != {_MLT_ID}
) ORDER BY dist ASC, vec_id ASC LIMIT {_MLT_K}
"""


register("knn_by_id", _knn_by_id, _knn_by_id_oracle())


# --- metadata-boosted scoring -------------------------------------------------------

_BOOST_PROBE = probe_vector(seed=23)
_BOOST_LABEL = 3
_BOOST = 0.25
_BOOST_K = 10


def _knn_boosted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid vector + metadata scoring (the "boosting" surface of
    production vector stores): rank by distance minus a constant boost
    for rows matching a metadata predicate — still one codegen
    projection + TakeOrderedAndProject, any base size."""
    from ..functions.distance import metric_expr

    emb = load_table(spark, sf_dir, "embeddings")
    dist = metric_expr("euclidean_sq", "embedding", list(_BOOST_PROBE))
    score = dist - F.when(
        F.col("label") == _BOOST_LABEL, F.lit(_BOOST)
    ).otherwise(F.lit(0.0))
    return (
        emb.withColumn("score", score)
        .orderBy(F.col("score").asc(), F.col("vec_id").asc())
        .limit(_BOOST_K)
        .select("vec_id", "label", F.round(F.col("score"), 6).alias("score"))
    )


def _knn_boosted_oracle() -> str:
    from ..probes import sql_array

    rng = f"range(1, {DIM + 1})"
    x = "CAST(embedding[i] AS DOUBLE)"
    return f"""
WITH probe AS (SELECT {sql_array(_BOOST_PROBE)} AS p)
SELECT vec_id, label, round(score, 6) AS score FROM (
  SELECT vec_id, label,
         list_sum(list_transform({rng},
           i -> ({x} - p[i]) * ({x} - p[i])))
         - (CASE WHEN label = {_BOOST_LABEL} THEN {_BOOST} ELSE 0.0 END)
           AS score
  FROM embeddings CROSS JOIN probe
) ORDER BY score ASC, vec_id ASC LIMIT {_BOOST_K}
"""


register("knn_boosted", _knn_boosted, _knn_boosted_oracle())
