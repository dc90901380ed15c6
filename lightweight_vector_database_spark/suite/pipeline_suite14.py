"""Training-pipeline queries, fourteenth batch (round 10 cont.): OPQ —
the optimized-product-quantization serving tier.

``ann_join_opq`` — the batched ANN join served from an OPQ index
(Ge et al., "Optimized Product Quantization", CVPR 2013): a learned
orthonormal rotation R is applied to every coarse residual before PQ
coding, so the codebooks quantize a variance-balanced, decorrelated
space. Rotation preserves euclidean distance, which means the whole
serving contract — ADC identity, tie-safe candidate cuts, exact
re-rank — holds unchanged in the rotated space while the CODE error
drops (measured 0.81x the plain-PQ MSE on the fixture corpus at
identical byte budget, tests/test_opq.py). This is the round-10
answer to the REFINE-bound regime BASELINE.md documents: when PQ
noise swamps true neighbor gaps, more refine cannot recover ranking
quality — a lower-noise code can.

The oracle replays the FULL pipeline in DuckDB SQL: the model (cents,
R, books) is retrained in numpy from the identical md5-ordered sample
(training uses BLAS freely — the model is shared constants), then
coarse assignment, the rotated-residual encode (a per-output-
coordinate ``list_sum`` fold over input coordinates, bit-identical to
the kernel's ``fold_matvec`` left fold), per-probe rotated LUT ADC,
candidate cut and exact re-rank all run as SQL folds — the standard
exact-value-hash contract for the deterministic-approximate tier.

Reference contract being scaled: find_k_nearest_neighbors
(kd_tree_database.py:285-304) at probe-table scale under the IVF-PQ
approximation, with the quantizer upgraded per the published OPQ
construction.
"""

from __future__ import annotations

import hashlib
import os

import numpy as np

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..probes import DIM
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

_AJO_K = 10
_AJO_NPROBE = 8
_AJO_REFINE = 8
_AJO_OPQ_ITERS = 6

_AJO_MEMO: dict[str, tuple] = {}
_AJO_SNAP: dict[tuple, DataFrame] = {}


def _ajo_model(spark: SparkSession, sf_dir: str):
    """(cents, R, books) — same sample rule and coarse/code
    hyperparameters as the plain-PQ tier (_aj_model), plus the OPQ
    alternation."""
    from ..operators.similarity import train_opq

    if sf_dir not in _AJO_MEMO:
        emb = load_table(spark, sf_dir, "embeddings")
        _AJO_MEMO[sf_dir] = train_opq(
            emb, n_centroids=_AJ_CENTROIDS, m=_AJ_M, ksub=_AJ_KSUB,
            iters=_AJ_ITERS, opq_iters=_AJO_OPQ_ITERS,
            sample_rows=_AJ_SAMPLE, sample_id_col="vec_id",
        )
    return _AJO_MEMO[sf_dir]


def _ajo_codes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cell-partitioned OPQ code snapshot. The snapshot name carries a
    hash of the MODEL BYTES (not just hyperparameters): the rotation
    comes out of an SVD, and a cached snapshot from another process
    must never be served against a model whose last-ulp differences
    would re-assign codes — a model-content mismatch simply builds a
    sibling snapshot."""
    from ..operators.similarity import ivfpq_encode

    cents, rot, books = _ajo_model(spark, sf_dir)
    key = (spark.sparkContext.applicationId, sf_dir)
    if key not in _AJO_SNAP:
        tag = hashlib.sha1(
            cents.tobytes() + rot.tobytes() + books.tobytes()
        ).hexdigest()[:10]
        name = (
            f"annjoin_opq_{os.path.basename(sf_dir.rstrip('/'))}"
            f"_c{_AJ_CENTROIDS}m{_AJ_M}k{_AJ_KSUB}_{tag}"
        )
        _AJO_SNAP[key] = _write_cell_snapshot(
            spark, name,
            lambda: ivfpq_encode(
                load_table(spark, sf_dir, "embeddings"), cents, books,
                rotation=rot,
            ).select("vec_id", "label", "cell", "pq_code"),
        )
    return _AJO_SNAP[key]


def _ann_join_opq_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..plans.ann_join import ann_join_topk

    cents, rot, books = _ajo_model(spark, sf_dir)
    codes = _ajo_codes(spark, sf_dir)
    emb = load_table(spark, sf_dir, "embeddings")
    out = ann_join_topk(
        codes, cents, books, _aj_probes(spark, sf_dir), raw=emb,
        k=_AJO_K, nprobe=_AJO_NPROBE, refine=_AJO_REFINE, rotation=rot,
    )
    return out.select(
        "probe_id",
        "vec_id",
        F.round(F.col("dist"), 6).alias("dist"),
        F.col("rank").cast("long").alias("rank"),
    )


def _ajo_trained_np():
    """(cents, R, books) retrained in numpy from the sf0.01 fixture via
    the identical md5-ordered sample — None when the fixture is absent
    (the query then registers rows-only)."""
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
    from ..operators.similarity import train_opq_np

    sample = np.array([r[0] for r in rows], dtype=np.float64)
    return train_opq_np(
        sample, n_centroids=_AJ_CENTROIDS, m=_AJ_M, ksub=_AJ_KSUB,
        iters=_AJ_ITERS, opq_iters=_AJO_OPQ_ITERS,
    )


def _ann_join_opq_oracle() -> str | None:
    trained = _ajo_trained_np()
    if trained is None:
        return None
    cents, rot, books = trained
    body = _aj_replay_sql(
        cents, books, _AJ_PROBES_CTE, k=_AJO_K, nprobe=_AJO_NPROBE,
        refine=_AJO_REFINE, rotation=rot,
    )
    return body + """
SELECT probe_id, vec_id, round(dist, 6) AS dist, rank FROM topk
"""


register("ann_join_opq", _ann_join_opq_query, _ann_join_opq_oracle())


# --- incrementally maintained codes snapshot (plans/ann_maintenance) ---------
#
# ``ann_codes_upsert`` — the OPQ codes table maintained from a CDC
# history instead of re-encoded from scratch: commit_full 80% of the
# embeddings corpus, encode it (full refresh), then ONE mutation
# commit (delete vec_id%7==0, REPLACE vec_id%11==3 with a 1.01-scaled
# vector, insert the held-out 20%) followed by an INCREMENTAL refresh
# that encodes only the changed rows. Because per-row encoding
# commutes with mutation, the maintained table must equal a
# from-scratch encode of the final corpus — which is exactly what the
# oracle computes: the final corpus as SQL set algebra, then the same
# coarse-assign / rotate / code-argmin folds as the ann_join replays.

# keyed by (applicationId, sf_dir) like _AJO_SNAP: the store DIR
# outlives a SparkSession restart (_session_store_dir persists
# per-process), but a memoized CodesSnapshot holds DataFrames/store
# handles bound to the session that built it — after a restart the
# snapshot is REBUILT from the surviving dirs under the new session
# (ADVICE r10)
_ACU_MEMO: dict[tuple, object] = {}


def _ann_codes_upsert_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..plans.ann_maintenance import CodesSnapshot
    from ..sources.delta_snapshots import DeltaSnapshotStore
    from .streaming_suite import _session_store_dir

    cents, rot, books = _ajo_model(spark, sf_dir)
    memo_key = (spark.sparkContext.applicationId, sf_dir)
    d, fresh = _session_store_dir("anncodes", sf_dir)
    if fresh:
        emb = load_table(spark, sf_dir, "embeddings").select(
            "vec_id", "label",
            F.col("embedding").cast("array<double>").alias("embedding"),
        )
        v = F.col("vec_id")
        base = DeltaSnapshotStore(spark, f"{d}/base")
        view = DeltaSnapshotStore(spark, f"{d}/codes")
        cs = CodesSnapshot(
            base, view, cents, books, rotation=rot, keep_cols=("label",)
        )
        base.commit_full(emb.filter(v % 5 != 4))
        cs.refresh()
        assert cs.last_refresh_mode == "full"
        repl = emb.filter(
            (v % 5 != 4) & (v % 7 != 0) & (v % 11 == 3)
        ).select(
            "vec_id", "label",
            F.transform("embedding", lambda x: x * F.lit(1.01)).alias(
                "embedding"
            ),
        )
        news = emb.filter((v % 5 == 4) & (v % 7 != 0))
        dels = (
            emb.filter((v % 7 == 0) & (v % 5 != 4))
            .select("vec_id")
            .unionByName(repl.select("vec_id"))
        )
        base.commit_mutation(
            append_df=repl.unionByName(news), delete_ids=dels
        )
        cs.refresh()
        assert cs.last_refresh_mode == "incremental"
        _ACU_MEMO[memo_key] = cs
    elif memo_key not in _ACU_MEMO:
        # dir survived a SparkSession restart: rebind fresh store
        # handles under the current session; the maintained codes view
        # is already materialized on disk, so no refresh is needed
        base = DeltaSnapshotStore(spark, f"{d}/base")
        view = DeltaSnapshotStore(spark, f"{d}/codes")
        _ACU_MEMO[memo_key] = CodesSnapshot(
            base, view, cents, books, rotation=rot, keep_cols=("label",)
        )
    cs = _ACU_MEMO[memo_key]
    return cs.codes().select(
        "vec_id", "label",
        F.col("cell").cast("long").alias("cell"), "pq_code",
    )


def _ann_codes_upsert_oracle() -> str | None:
    trained = _ajo_trained_np()
    if trained is None:
        return None
    from .index_suite import _dlst2

    cents, rot, books = trained
    m, ksub, dsub = books.shape
    books_all = "[" + ",".join(
        _dlst2(books[j].tolist()) for j in range(m)
    ) + "]"
    rng = f"range(1, {DIM + 1})"

    def code(j: int) -> str:
        dj = (
            f"list_transform(bks[{j + 1}], b -> "
            f"list_sum(list_transform(range(1, {dsub + 1}), i -> "
            f"(rv[{j * dsub} + i] - b[i]) * (rv[{j * dsub} + i] - b[i]))))"
        )
        return f"list_position({dj}, list_min({dj})) AS c{j}"

    return f"""
WITH consts AS (
  SELECT {_dlst2(cents.tolist())} AS cents,
         {_dlst2(rot.tolist())} AS rot,
         {books_all} AS bks
), final AS (
  SELECT vec_id, label,
         CASE WHEN vec_id % 11 = 3 AND vec_id % 5 <> 4
              THEN list_transform(embedding,
                   x -> CAST(x AS DOUBLE) * CAST(1.01 AS DOUBLE))
              ELSE list_transform(embedding, x -> CAST(x AS DOUBLE))
         END AS bv
  FROM embeddings WHERE vec_id % 7 <> 0
), cdist AS (
  SELECT vec_id, label, bv,
         list_transform(cents, c -> list_sum(list_transform({rng},
             i -> (bv[i] - c[i]) * (bv[i] - c[i])))) AS cd
  FROM final, consts
), assigned AS (
  SELECT vec_id, label, cellp,
         list_transform({rng}, i -> list_sum(list_transform({rng},
             t -> rot[i][t] * rv0[t]))) AS rv
  FROM (
    SELECT vec_id, label, list_position(cd, list_min(cd)) AS cellp,
           list_transform({rng},
               i -> bv[i] - cents[list_position(cd, list_min(cd))][i]) AS rv0
    FROM cdist, consts
  ), consts
), coded AS (
  SELECT vec_id, label, cellp,
         {", ".join(code(j) for j in range(m))}
  FROM assigned, consts
)
SELECT vec_id, label, CAST(cellp - 1 AS BIGINT) AS cell,
       [{", ".join(f"c{j} - 1" for j in range(m))}] AS pq_code
FROM coded
"""


register(
    "ann_codes_upsert", _ann_codes_upsert_query, _ann_codes_upsert_oracle()
)


# --- 4-bit PQ: the fast-scan code layout --------------------------------------
#
# ``ann_join_pq4`` — the batched ANN join served from a nibble-packed
# codes snapshot (VERDICT r10 item 4): ksub=16 codebooks, two codes
# per stored byte (operators/similarity.pack_codes4). At m=16 the
# codes column is 8 bytes/vector — half of m=16/ksub=256 — and each
# per-subspace ADC LUT row is 16 entries, the register-resident shape
# of SIMD fast-scan kernels (André et al., VLDB 2015). The PACKING is
# pure storage: code values round-trip losslessly, so the serving
# kernel's decoded-vector matmul, tie-safe cuts and exact re-rank are
# bit-identical to an unpacked snapshot of the same model — which is
# exactly what the oracle proves, replaying the FULL pipeline (md5-
# sample retrain, coarse assign, code argmin folds, LUT ADC, candidate
# cut, exact re-rank) in DuckDB SQL with no knowledge of the layout.
#
# Reference contract being scaled: find_k_nearest_neighbors
# (kd_tree_database.py:285-304) at probe-table scale, with the code
# budget spent on 16 4-bit subspaces instead of 8 larger ones.

_PQ4_M = 16
_PQ4_KSUB = 16
_PQ4_K = 10
_PQ4_NPROBE = 8
_PQ4_REFINE = 16

_PQ4_MEMO: dict[str, tuple] = {}
_PQ4_SNAP: dict[tuple, DataFrame] = {}


def _pq4_model(spark: SparkSession, sf_dir: str):
    """(cents, books) with the 4-bit geometry — same coarse layer and
    sample rule as the plain tier (_aj_model), m=16/ksub=16 books."""
    from ..operators.similarity import train_ivfpq

    if sf_dir not in _PQ4_MEMO:
        emb = load_table(spark, sf_dir, "embeddings")
        _PQ4_MEMO[sf_dir] = train_ivfpq(
            emb, n_centroids=_AJ_CENTROIDS, m=_PQ4_M, ksub=_PQ4_KSUB,
            iters=_AJ_ITERS, sample_rows=_AJ_SAMPLE, sample_id_col="vec_id",
        )
    return _PQ4_MEMO[sf_dir]


def _pq4_codes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cell-partitioned NIBBLE-PACKED code snapshot (pq_code binary)."""
    from ..operators.similarity import ivfpq_encode

    cents, books = _pq4_model(spark, sf_dir)
    key = (spark.sparkContext.applicationId, sf_dir)
    if key not in _PQ4_SNAP:
        tag = hashlib.sha1(cents.tobytes() + books.tobytes()).hexdigest()[:10]
        name = (
            f"annjoin_pq4_{os.path.basename(sf_dir.rstrip('/'))}"
            f"_c{_AJ_CENTROIDS}m{_PQ4_M}k{_PQ4_KSUB}_{tag}"
        )
        _PQ4_SNAP[key] = _write_cell_snapshot(
            spark, name,
            lambda: ivfpq_encode(
                load_table(spark, sf_dir, "embeddings"), cents, books,
                pack4=True,
            ).select("vec_id", "label", "cell", "pq_code"),
        )
    return _PQ4_SNAP[key]


def _ann_join_pq4_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..plans.ann_join import ann_join_topk

    cents, books = _pq4_model(spark, sf_dir)
    codes = _pq4_codes(spark, sf_dir)
    emb = load_table(spark, sf_dir, "embeddings")
    out = ann_join_topk(
        codes, cents, books, _aj_probes(spark, sf_dir), raw=emb,
        k=_PQ4_K, nprobe=_PQ4_NPROBE, refine=_PQ4_REFINE,
    )
    return out.select(
        "probe_id",
        "vec_id",
        F.round(F.col("dist"), 6).alias("dist"),
        F.col("rank").cast("long").alias("rank"),
    )


def _pq4_trained_np():
    """(cents, books) retrained in numpy from the sf0.01 fixture via
    the identical md5-ordered sample — None when the fixture is absent
    (the query then registers rows-only)."""
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
    from ..operators.similarity import train_ivfpq_np

    sample = np.array([r[0] for r in rows], dtype=np.float64)
    return train_ivfpq_np(
        sample, n_centroids=_AJ_CENTROIDS, m=_PQ4_M, ksub=_PQ4_KSUB,
        iters=_AJ_ITERS,
    )


def _ann_join_pq4_oracle() -> str | None:
    trained = _pq4_trained_np()
    if trained is None:
        return None
    cents, books = trained
    body = _aj_replay_sql(
        cents, books, _AJ_PROBES_CTE, k=_PQ4_K, nprobe=_PQ4_NPROBE,
        refine=_PQ4_REFINE,
    )
    return body + """
SELECT probe_id, vec_id, round(dist, 6) AS dist, rank FROM topk
"""


register("ann_join_pq4", _ann_join_pq4_query, _ann_join_pq4_oracle())
