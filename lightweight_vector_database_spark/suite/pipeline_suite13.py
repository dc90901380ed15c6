"""Training-pipeline queries, thirteenth batch (round 10): PER-PROBE
ADAPTIVE escalation for the batched ANN join (VERDICT r9 item 1).

``ann_join_adaptive`` — the batched IVF-PQ join under a predicate that
RETIRES whole coarse cells (``cell >= 2`` on the codes snapshot: the
shard-decommission / quarantined-partition shape, maximally correlated
with the cluster geometry by construction). A fixed (nprobe, refine)
must choose between paying the adversarial deep point for EVERY probe
or losing the displaced probes' recall; ``adaptive=True`` escalates
per probe instead (plans/ann_join.py):

* probes whose home cell survives run the base point bit-identically,
* probes whose home cell was retired search esc_nprobe cells and keep
  k*esc_refine candidates,
* any probe whose chosen cells cannot cover its candidate budget
  widens its own cell list until the qualifying mass does.

The oracle replays the ENTIRE adaptive pipeline in DuckDB SQL — the
displaced-home test, the per-probe cumulative-mass widening, the
per-probe candidate budget — via ``_aj_replay_sql(cell_where=,
adaptive_esc=)``, so the adaptive path gets the same EXACT value-hash
contract as the fixed-knob queries.

Reference contract being scaled: filter-before-topk kNN
(kd_tree_database.py:285-304) where the filter is an index-metadata
predicate; the escalation is the batched analogue of widening a
failing probe's search radius instead of re-tuning the whole index.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.tiering import fixture_serving_point
from ..sources import load_table
from . import register
from .pipeline_suite11 import (
    _AJ_PROBES_CTE,
    _aj_codes,
    _aj_model,
    _aj_probes,
    _aj_replay_sql,
    _aj_trained_np,
    _repo_file,
)

_ADAPT_K = 10
# retired coarse cells: everything below this cell id is banned (the
# 0-based Spark cell id; the oracle's 1-based cellp adds one)
_ADAPT_MIN_CELL = 2
_ADAPT_FLOOR = 0.95
# The FULL operating point — base (nprobe, refine) AND the per-probe
# escalation point — resolves from the recorded adaptive-shape
# frontier (tools/fixture_frontier.py --shape adaptive), whose records
# carry explicit esc knobs since r11: the recall each record measured
# was measured UNDER its escalation point, so base and esc must be
# served together (VERDICT r10 item 3). The fallback pins the
# kernel-default 2x/8x escalation of the documented (2, 2) base.
_ADAPT_PT = fixture_serving_point(
    _repo_file("FRONTIER_sf001_adapt.json"),
    _ADAPT_FLOOR,
    {"nprobe": 2, "refine": 2, "esc_nprobe": 4, "esc_refine": 16},
)
_ADAPT_NPROBE = _ADAPT_PT["nprobe"]
_ADAPT_REFINE = _ADAPT_PT["refine"]
# esc None = the recording ran the kernel defaults (2x/8x): pin the
# concrete values because the oracle replay needs them
_ADAPT_ESC_NPROBE = _ADAPT_PT["esc_nprobe"] or 2 * _ADAPT_NPROBE
_ADAPT_ESC_REFINE = _ADAPT_PT["esc_refine"] or 8 * _ADAPT_REFINE


def _ann_join_adaptive_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..plans.ann_join import ann_join_topk

    cents, books = _aj_model(spark, sf_dir)
    codes = _aj_codes(spark, sf_dir)
    emb = load_table(spark, sf_dir, "embeddings")
    out = ann_join_topk(
        codes, cents, books, _aj_probes(spark, sf_dir), raw=emb,
        k=_ADAPT_K, nprobe=_ADAPT_NPROBE, refine=_ADAPT_REFINE,
        pred=F.col("cell") >= _ADAPT_MIN_CELL,
        adaptive=True,
        esc_nprobe=_ADAPT_ESC_NPROBE,
        esc_refine=_ADAPT_ESC_REFINE,
    )
    return out.select(
        "probe_id",
        "vec_id",
        F.round(F.col("dist"), 6).alias("dist"),
        F.col("rank").cast("long").alias("rank"),
    )


def _ann_join_adaptive_oracle() -> str | None:
    trained = _aj_trained_np()
    if trained is None:
        return None
    cents, books = trained
    body = _aj_replay_sql(
        cents, books, _AJ_PROBES_CTE, k=_ADAPT_K, nprobe=_ADAPT_NPROBE,
        refine=_ADAPT_REFINE,
        cell_where=f"cellp >= {_ADAPT_MIN_CELL + 1}",
        adaptive_esc=(_ADAPT_ESC_NPROBE, _ADAPT_ESC_REFINE),
    )
    return body + """
SELECT probe_id, vec_id, round(dist, 6) AS dist, rank FROM topk
"""


register(
    "ann_join_adaptive", _ann_join_adaptive_query, _ann_join_adaptive_oracle()
)


# --- IMI: two-level coarse quantizer through the batched join ----------------
# VERDICT r9 design note ("a two-level coarse quantizer is the 100 TB
# form"): the flat IVF ships an O(cells x dim) centroid matrix with
# every serving job; the inverted multi-index (Babenko & Lempitsky,
# CVPR 2012) decomposes the coarse space into the PRODUCT of two
# half-dimension codebooks, so K1*K2 cells ship as O((K1+K2) x dim/2)
# values and per-probe assignment drops from O(cells x dim) folds to
# two O(K x dim/2) half folds + one addition per cell. The oracle
# replays the decomposed arithmetic itself (_aj_replay_sql(imi=...):
# half folds, product-cell distance list, CASE-assembled cell
# centers), so the IMI path gets the same exact value-hash contract
# as the flat-model queries. Parity with the flat path served from
# the materialized product matrix is pinned in tests/test_imi.py.

_IMI_K1 = 4
_IMI_K2 = 4
_IMI_M = 8
_IMI_KSUB = 64
_IMI_ITERS = 3
_IMI_SAMPLE = 8192
_IMI_NPROBE = 8
_IMI_REFINE = 16
_IMI_MEMO: dict = {}
_IMI_SNAP: dict = {}


def _imi_model(spark: SparkSession, sf_dir: str):
    from ..operators.similarity import train_imi

    if sf_dir not in _IMI_MEMO:
        emb = load_table(spark, sf_dir, "embeddings")
        _IMI_MEMO[sf_dir] = train_imi(
            emb, k1=_IMI_K1, k2=_IMI_K2, m=_IMI_M, ksub=_IMI_KSUB,
            iters=_IMI_ITERS, sample_rows=_IMI_SAMPLE,
            sample_id_col="vec_id",
        )
    return _IMI_MEMO[sf_dir]


def _imi_codes(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os

    from ..operators.similarity import imi_encode
    from .pipeline_suite11 import _write_cell_snapshot

    c1, c2, books = _imi_model(spark, sf_dir)
    key = (spark.sparkContext.applicationId, sf_dir)
    if key not in _IMI_SNAP:
        name = (
            f"annimi_{os.path.basename(sf_dir.rstrip('/'))}"
            f"_p{_IMI_K1}x{_IMI_K2}m{_IMI_M}k{_IMI_KSUB}_v1"
        )
        _IMI_SNAP[key] = _write_cell_snapshot(
            spark, name,
            lambda: imi_encode(
                load_table(spark, sf_dir, "embeddings"), c1, c2, books
            ).select("vec_id", "cell", "pq_code"),
        )
    return _IMI_SNAP[key]


def _ann_join_imi_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..plans.ann_join import ann_join_topk

    c1, c2, books = _imi_model(spark, sf_dir)
    codes = _imi_codes(spark, sf_dir)
    emb = load_table(spark, sf_dir, "embeddings")
    out = ann_join_topk(
        codes, None, books, _aj_probes(spark, sf_dir), raw=emb,
        k=_ADAPT_K, nprobe=_IMI_NPROBE, refine=_IMI_REFINE,
        imi=(c1, c2),
    )
    return out.select(
        "probe_id",
        "vec_id",
        F.round(F.col("dist"), 6).alias("dist"),
        F.col("rank").cast("long").alias("rank"),
    )


def _imi_trained_np():
    """(c1, c2, books) retrained in numpy from the sf0.01 fixture via
    the identical md5-ordered sample rule (the _aj_trained_np
    pattern) — None when the fixture is absent."""
    import numpy as np

    from .pipeline_suite11 import _ORACLE_SF_DIR

    try:
        import duckdb

        con = duckdb.connect()
        rows = con.execute(
            f"SELECT embedding FROM '{_ORACLE_SF_DIR}/embeddings.parquet' "
            f"ORDER BY md5(CAST(vec_id AS VARCHAR)) LIMIT {_IMI_SAMPLE}"
        ).fetchall()
        con.close()
    except Exception:
        return None
    if not rows:
        return None
    from ..operators.similarity import train_imi_np

    sample = np.array([r[0] for r in rows], dtype=np.float64)
    return train_imi_np(
        sample, k1=_IMI_K1, k2=_IMI_K2, m=_IMI_M, ksub=_IMI_KSUB,
        iters=_IMI_ITERS,
    )


def _ann_join_imi_oracle() -> str | None:
    trained = _imi_trained_np()
    if trained is None:
        return None
    c1, c2, books = trained
    body = _aj_replay_sql(
        None, books, _AJ_PROBES_CTE, k=_ADAPT_K, nprobe=_IMI_NPROBE,
        refine=_IMI_REFINE, imi=(c1, c2),
    )
    return body + """
SELECT probe_id, vec_id, round(dist, 6) AS dist, rank FROM topk
"""


register("ann_join_imi", _ann_join_imi_query, _ann_join_imi_oracle())
