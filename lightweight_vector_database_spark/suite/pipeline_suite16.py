"""Training-pipeline queries, sixteenth batch (round 12): the
SPHERICAL-KMEANS coarse layer for the cosine serving contract — the
second half of VERDICT r11 item 3's "per-dim whitening (or spherical
k-means)" parenthetical.

The cosine tier (`ann_join_cosine`, pipeline_suite12) trains plain
Lloyd on the L2-normalized corpus. Plain Lloyd's unconstrained mean
updates pull centroids INSIDE the unit ball (the mean of unit vectors
has norm < 1, shrinking with cluster spread), so wide cells get
interior centroids and the coarse Voronoi partition drifts away from
the metric the data is served under. ``spherical_kmeans_np``
(operators/similarity.py) re-normalizes every mean back onto the
sphere — the maximum-mean-cosine update (Dhillon & Modha 2001) — and
because every centroid is unit norm, argmin squared-euclidean IS
argmax cosine: the existing encode kernel, serve kernel
(``ann_join_topk(metric='cosine')``), and DuckDB replay
(``_aj_replay_sql(norm=True, exact_metric='cosine')``) run UNCHANGED.
Only training moves.

``ann_join_spherical`` replays the ENTIRE pipeline in DuckDB —
normalization fold, spherical coarse assignment, residual codes, ADC,
exact true-cosine re-rank — so the new coarse option gets the same
exact value-hash contract as every other ANN shape. The model is
retrained in numpy from the identical md5-ordered sample on both
sides (`train_spherical_ivfpq_np` is the shared core).

Reference contract being scaled: pluggable metric per kNN call
(database.py:31-48) served through an IVF-PQ whose coarse layer is
trained in the served metric's own geometry.
"""

from __future__ import annotations

import os

import numpy as np
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources import load_table
from . import register
from .index_suite import _ORACLE_SF_DIR
from .pipeline_suite11 import (
    _AJ_CENTROIDS,
    _AJ_ITERS,
    _AJ_KSUB,
    _AJ_M,
    _AJ_PROBES_CTE,
    _AJ_SAMPLE,
    _aj_probes,
    _aj_replay_sql,
    _write_cell_snapshot,
)
from .pipeline_suite12 import _norm_emb

# Same k as the plain-cosine tier so the two queries are directly
# comparable; the (nprobe, refine) point resolves from the spherical
# build's OWN recorded frontier (tools/fixture_frontier --shape
# spherical -> FRONTIER_sf001_sph.json) at the standard 0.95 floor —
# the same evidence-only governance as every other serving shape.
# (4, 8) is the pre-recording fallback only.
from ..operators.tiering import fixture_operating_point
from .pipeline_suite11 import _repo_file

_SPH_K = 10
_SPH_FLOOR = 0.95
_SPH_NPROBE, _SPH_REFINE = fixture_operating_point(
    _repo_file("FRONTIER_sf001_sph.json"), _SPH_FLOOR, (4, 8)
)
_SPH_MEMO: dict[str, tuple] = {}
_SPH_SNAP: dict[tuple, DataFrame] = {}


def _sph_model(spark: SparkSession, sf_dir: str):
    """Spherical-coarse IVF-PQ model: trained from the RAW embeddings
    table — the trainer normalizes internally with the same left-fold
    arithmetic as the serve kernel, so the Spark sampler and the
    DuckDB oracle builder feed identical raw rows to the shared np
    core."""
    from ..operators.similarity import train_spherical_ivfpq

    if sf_dir not in _SPH_MEMO:
        emb = load_table(spark, sf_dir, "embeddings")
        _SPH_MEMO[sf_dir] = train_spherical_ivfpq(
            emb, n_centroids=_AJ_CENTROIDS, m=_AJ_M, ksub=_AJ_KSUB,
            iters=_AJ_ITERS, sample_rows=_AJ_SAMPLE, sample_id_col="vec_id",
        )
    return _SPH_MEMO[sf_dir]


def _sph_codes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cell-partitioned codes snapshot over the NORMALIZED vectors
    under the spherical coarse model (the cosine contract's encode
    space, pipeline_suite12._norm_emb)."""
    from ..operators.similarity import ivfpq_encode

    cents, books = _sph_model(spark, sf_dir)
    key = (spark.sparkContext.applicationId, sf_dir)
    if key not in _SPH_SNAP:
        name = (
            f"annsph_{os.path.basename(sf_dir.rstrip('/'))}"
            f"_c{_AJ_CENTROIDS}m{_AJ_M}k{_AJ_KSUB}_v1"
        )
        _SPH_SNAP[key] = _write_cell_snapshot(
            spark, name,
            lambda: ivfpq_encode(
                _norm_emb(load_table(spark, sf_dir, "embeddings")),
                cents, books,
            ).select("vec_id", "cell", "pq_code"),
        )
    return _SPH_SNAP[key]


def _ann_join_spherical_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..plans.ann_join import ann_join_topk

    cents, books = _sph_model(spark, sf_dir)
    codes = _sph_codes(spark, sf_dir)
    emb = load_table(spark, sf_dir, "embeddings")
    out = ann_join_topk(
        codes, cents, books, _aj_probes(spark, sf_dir), raw=emb,
        k=_SPH_K, nprobe=_SPH_NPROBE, refine=_SPH_REFINE,
        metric="cosine",
    )
    # + 0.0 canonicalizes negative zero (see _ann_join_cosine_query)
    return out.select(
        "probe_id",
        "vec_id",
        (F.round(F.col("dist"), 6) + F.lit(0.0)).alias("dist"),
        F.col("rank").cast("long").alias("rank"),
    )


def _sph_trained_np():
    """The spherical model retrained in numpy from the sf0.01 fixture
    via the identical md5-ordered sample rule — None when the fixture
    is absent."""
    try:
        import duckdb

        con = duckdb.connect()
        rows = con.execute(
            f"SELECT embedding FROM '{_ORACLE_SF_DIR}/embeddings.parquet' "
            f"ORDER BY md5(CAST(vec_id AS VARCHAR)) LIMIT {_AJ_SAMPLE}"
        ).fetchall()
        con.close()
    except Exception:
        return None
    if not rows:
        return None
    from ..operators.similarity import train_spherical_ivfpq_np

    sample = np.array([r[0] for r in rows], dtype=np.float64)
    return train_spherical_ivfpq_np(
        sample, n_centroids=_AJ_CENTROIDS, m=_AJ_M, ksub=_AJ_KSUB,
        iters=_AJ_ITERS,
    )


def _ann_join_spherical_oracle() -> str | None:
    trained = _sph_trained_np()
    if trained is None:
        return None
    cents, books = trained
    body = _aj_replay_sql(
        cents, books, _AJ_PROBES_CTE, k=_SPH_K, nprobe=_SPH_NPROBE,
        refine=_SPH_REFINE, norm=True, exact_metric="cosine",
    )
    return body + """
SELECT probe_id, vec_id, round(dist, 6) + 0.0 AS dist, rank FROM topk
"""


register(
    "ann_join_spherical",
    _ann_join_spherical_query,
    _ann_join_spherical_oracle(),
)
