"""Training-pipeline queries: weighted sampling, shard shuffling, JSONL
round-trip, SemDeDup semantic dedup, bucketed co-located joins.

Round-7 widening of the LLM-pipeline north star (the reference — a
513-LoC in-memory kd-tree — has none of this surface):

* ``curation_weighted_sample`` — Efraimidis–Spirakis weighted sampling
  without replacement, the draw replayed exactly in SQL;
* ``shard_assignment_stats`` — deterministic global shuffle into
  fixed-size training shards via a distributed two-level rank;
* ``jsonl_roundtrip_docs`` — corpus out to gzipped JSONL and back,
  value-checked against the parquet source (order-insensitive md5
  checksum), proving the interchange edge is lossless;
* ``dedup_semantic_pairs`` / ``dedup_semantic_drop`` — SemDeDup
  (arXiv:2303.09540): k-means cluster then within-cluster cosine
  near-dup pairs; oracle retrains the identical centroids in numpy
  from the identical seeded-uniform sample and replays assignment +
  pair arithmetic in SQL;
* ``bucketed_join_customer_orders`` — both fact tables bucketed on the
  join key at write time, so the join needs NO exchange of either side
  (the plan-shape is pinned by tests/test_pipeline_ops.py with
  broadcast disabled) — the bucketing story a 100 TB star schema runs
  on.
"""

from __future__ import annotations

import os

import numpy as np

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.sampling import assign_shards, weighted_sample
from ..operators.semantic import semantic_drop_summary, semantic_pairs
from ..operators.similarity import train_centroids, train_centroids_np
from ..sources import load_table
from ..sources.jsonl import read_jsonl, write_jsonl
from . import register
from .index_suite import _ORACLE_SF_DIR, _dlst2

_REPO_ROOT = os.path.dirname(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)


def _sf_tag(sf_dir: str) -> str:
    return os.path.basename(sf_dir.rstrip("/")).replace(".", "_")


# --- weighted sampling ------------------------------------------------------

_WSAMP_K = 50


def _weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-50 weighted-without-replacement draw over documents, weight
    = n_chars (longer docs proportionally likelier). One TakeOrdered
    over codegen hash math — no shuffle, no window, reproducible."""
    docs = load_table(spark, sf_dir, "documents")
    out = weighted_sample(docs, _WSAMP_K, "n_chars", "doc_id")
    return out.select(
        "doc_id", "source", "n_chars", F.round("wkey", 6).alias("wkey")
    )


register(
    "curation_weighted_sample",
    _weighted_sample,
    f"""
WITH keyed AS (
  SELECT doc_id, source, n_chars,
         ln((('0x' || substr(md5('wsamp:' || CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT + 1)
            / 1152921504606846976.0) / CAST(n_chars AS DOUBLE) AS wkey
  FROM documents WHERE n_chars > 0
)
SELECT doc_id, source, n_chars, round(wkey, 6) AS wkey
FROM keyed ORDER BY wkey DESC, doc_id ASC LIMIT {_WSAMP_K}
""",
)


# --- deterministic shard shuffle -------------------------------------------

_SHARD_SIZE = 64


def _shard_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global md5-shuffle of the corpus cut into 64-doc training
    shards; per-shard stats prove the rank is the exact global
    row_number (min/max rank per shard are contiguous) while every
    stage stays partitioned (two-level scan, no global window)."""
    docs = load_table(spark, sf_dir, "documents")
    sharded = assign_shards(docs, _SHARD_SIZE, "doc_id")
    return sharded.groupBy("shard_id").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_chars").alias("sum_chars"),
        F.min("global_rank").alias("min_rank"),
        F.max("global_rank").alias("max_rank"),
    )


register(
    "shard_assignment_stats",
    _shard_stats,
    f"""
WITH r AS (
  SELECT doc_id, n_chars,
         row_number() OVER (
           ORDER BY md5('shard:' || CAST(doc_id AS VARCHAR)) ASC, doc_id ASC
         ) AS global_rank
  FROM documents
)
SELECT (global_rank - 1) // {_SHARD_SIZE} AS shard_id,
       count(*) AS n_docs,
       CAST(sum(n_chars) AS BIGINT) AS sum_chars,
       min(global_rank) AS min_rank,
       max(global_rank) AS max_rank
FROM r GROUP BY 1
""",
)


# --- JSONL round-trip -------------------------------------------------------

_DOCS_SCHEMA = (
    "doc_id bigint, text string, lang string, source string, n_chars bigint"
)


def _jsonl_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents -> gzipped JSONL (one file per task) -> schema-enforced
    read-back -> per-source stats INCLUDING an order-insensitive md5
    content checksum. The oracle computes the same stats from the
    parquet source, so a hash match proves the JSONL edge round-trips
    every row and every text byte."""
    root = os.path.join(_REPO_ROOT, ".jsonl_cache")
    path = os.path.join(root, f"docs_{_sf_tag(sf_dir)}")
    if not os.path.exists(os.path.join(path, "_SUCCESS")):
        os.makedirs(root, exist_ok=True)
        write_jsonl(load_table(spark, sf_dir, "documents"), path)
    back = read_jsonl(spark, path, _DOCS_SCHEMA)
    checksum = F.conv(F.substring(F.md5(F.col("text")), 1, 8), 16, 10).cast(
        "long"
    )
    return back.groupBy("source").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_chars").alias("sum_chars"),
        F.sum(checksum).alias("text_checksum"),
    )


register(
    "jsonl_roundtrip_docs",
    _jsonl_roundtrip,
    """
SELECT source, count(*) AS n_docs,
       CAST(sum(n_chars) AS BIGINT) AS sum_chars,
       CAST(sum(('0x' || substr(md5(text), 1, 8))::BIGINT) AS BIGINT)
         AS text_checksum
FROM documents GROUP BY source
""",
)


# --- SemDeDup semantic dedup ------------------------------------------------

_SEM_CLUSTERS = 8
_SEM_TAU = 0.35
_SEM_DIM = 64
_CENTROID_MEMO: dict[str, np.ndarray] = {}


def _semantic_centroids(spark: SparkSession, sf_dir: str) -> np.ndarray:
    if sf_dir not in _CENTROID_MEMO:
        emb = load_table(spark, sf_dir, "embeddings")
        _CENTROID_MEMO[sf_dir] = train_centroids(
            emb,
            n_centroids=_SEM_CLUSTERS,
            vec_col="embedding",
            iters=5,
            sample_rows=2048,
            seed=42,
            sample_id_col="vec_id",
        )
    return _CENTROID_MEMO[sf_dir]


def _semantic_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    cents = _semantic_centroids(spark, sf_dir)
    out = semantic_pairs(emb, cents, _SEM_TAU, id_col="vec_id")
    return out.select(
        F.col("cell").cast("long").alias("cell"),
        "id1",
        "id2",
        F.round("cos_sim", 6).alias("cos_sim"),
    )


def _semantic_drop(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    cents = _semantic_centroids(spark, sf_dir)
    pairs = semantic_pairs(emb, cents, _SEM_TAU, id_col="vec_id")
    out = semantic_drop_summary(emb, pairs, id_col="vec_id", centroids=cents)
    return out.select(
        F.col("cell").cast("long").alias("cell"),
        "n_vecs",
        F.col("n_dropped").cast("long").alias("n_dropped"),
    )


def _build_semantic_oracles() -> tuple[str | None, str | None]:
    """Retrain the sf0.01 centroids in numpy from the SAME
    seeded-uniform sample rule (ORDER BY md5(vec_id)) and embed them as
    SQL literals; assignment + pair arithmetic then replays the Spark
    plan exactly (same first-argmin rule, same left-fold sums — the
    ivf/pq oracles in index_suite pin this equivalence already)."""
    try:
        import duckdb

        con = duckdb.connect()
        rows = con.execute(
            f"SELECT embedding FROM '{_ORACLE_SF_DIR}/embeddings.parquet' "
            "ORDER BY md5(CAST(vec_id AS VARCHAR)) LIMIT 2048"
        ).fetchall()
        con.close()
    except Exception:  # fixture absent: rows-only
        return None, None
    if not rows:
        return None, None
    sample = np.array([r[0] for r in rows], dtype=np.float64)
    cents = train_centroids_np(sample, _SEM_CLUSTERS, iters=5, seed=42)
    cents_sql = _dlst2(cents.tolist())
    rng = f"range(1, {_SEM_DIM + 1})"
    assigned = f"""
  SELECT vec_id, embedding,
         list_position(cd, list_min(cd)) - 1 AS cell
  FROM (
    SELECT vec_id, embedding,
           list_transform({cents_sql}, c -> list_sum(list_transform({rng},
             i -> (CAST(embedding[i] AS DOUBLE) - c[i]) *
                  (CAST(embedding[i] AS DOUBLE) - c[i])))) AS cd
    FROM embeddings
  )"""
    x = "CAST(a.embedding[i] AS DOUBLE)"
    y = "CAST(b.embedding[i] AS DOUBLE)"
    dotp = f"list_sum(list_transform({rng}, i -> {x} * {y}))"
    na = f"sqrt(list_sum(list_transform({rng}, i -> {x} * {x})))"
    nb = f"sqrt(list_sum(list_transform({rng}, i -> {y} * {y})))"
    pairs = f"""
  SELECT CAST(a.cell AS BIGINT) AS cell, a.vec_id AS id1, b.vec_id AS id2,
         ({dotp}) / (({na}) * ({nb})) AS cos_sim
  FROM assigned a JOIN assigned b ON a.cell = b.cell AND a.vec_id < b.vec_id"""
    pairs_sql = f"""
WITH assigned AS ({assigned}), p AS ({pairs})
SELECT cell, id1, id2, round(cos_sim, 6) AS cos_sim
FROM p WHERE cos_sim >= {_SEM_TAU}
"""
    drop_sql = f"""
WITH assigned AS ({assigned}), p AS ({pairs}),
dropped AS (SELECT DISTINCT id2 FROM p WHERE cos_sim >= {_SEM_TAU})
SELECT CAST(a.cell AS BIGINT) AS cell, count(*) AS n_vecs,
       CAST(sum(CASE WHEN d.id2 IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
         AS n_dropped
FROM assigned a LEFT JOIN dropped d ON a.vec_id = d.id2
GROUP BY a.cell
"""
    return pairs_sql, drop_sql


_SEM_PAIRS_ORACLE, _SEM_DROP_ORACLE = _build_semantic_oracles()

# Both flagged quadratic since r9: they are the within-cluster exact
# pair self-joins (operators/semantic.py) whose registered scale twin
# is dedup_semantic_ann (the corpus probing itself through the IVF-PQ
# tier, pipeline_suite11) — at sf3 the pair enumeration alone ran
# 2120s + 1015s of the sweep (VERDICT r8), which is exactly the cost
# the ANN twin exists to remove.
register(
    "dedup_semantic_pairs", _semantic_pairs, _SEM_PAIRS_ORACLE,
    quadratic_baseline="within-cluster exact pairs "
    "(oracle anchor for dedup_semantic_ann)",
)
register(
    "dedup_semantic_drop", _semantic_drop, _SEM_DROP_ORACLE,
    quadratic_baseline="within-cluster exact pair scan "
    "(oracle anchor for dedup_semantic_ann)",
)


_SEM_CAP = 64  # sf0.01 clusters span 52-73 rows: the cap BITES partially


def _semantic_capped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The scale twin: clusters above ``max_cluster`` are dropped from
    pair enumeration with the dropped mass logged — the same
    oversized-bucket quarantine as dedup_minhash_capped. At 100 TB the
    primary knob is n_clusters ~ corpus/target_size (SemDeDup trains
    50k clusters for LAION); the cap is the backstop for degenerate
    clusterings. The oracle replays the cap as a HAVING filter, so the
    drop semantics are value-checked, not just claimed."""
    emb = load_table(spark, sf_dir, "embeddings")
    cents = _semantic_centroids(spark, sf_dir)
    out = semantic_pairs(
        emb, cents, _SEM_TAU, id_col="vec_id", max_cluster=_SEM_CAP
    )
    return out.select(
        F.col("cell").cast("long").alias("cell"),
        "id1",
        "id2",
        F.round("cos_sim", 6).alias("cos_sim"),
    )


def _capped_oracle(pairs_sql: str | None) -> str | None:
    if pairs_sql is None:
        return None
    return pairs_sql.replace(
        "FROM p WHERE",
        "FROM p WHERE cell IN (SELECT cell FROM assigned GROUP BY cell"
        f" HAVING count(*) <= {_SEM_CAP}) AND",
    )


register(
    "dedup_semantic_capped", _semantic_capped, _capped_oracle(_SEM_PAIRS_ORACLE)
)


# --- bucketed co-located join ----------------------------------------------

_BUCKETS = 8


def _bucketed_tables(spark: SparkSession, sf_dir: str) -> tuple[str, str]:
    """orders/customer bucketed+sorted on the join key, written once
    per (session, sf). The repartition BEFORE the bucketed write uses
    the same murmur3 pmod as the bucket spec, so each task holds
    exactly one bucket -> one file per bucket, not files x tasks (the
    r6 small-file lesson applied to bucketing)."""
    tag = _sf_tag(sf_dir)
    root = os.path.join(_REPO_ROOT, ".bucketed_tables")
    names = (f"lvdbs_orders_b_{tag}", f"lvdbs_customer_b_{tag}")
    for tbl, src, key in (
        (names[0], "orders", "o_custkey"),
        (names[1], "customer", "c_custkey"),
    ):
        if not spark.catalog.tableExists(tbl):
            df = load_table(spark, sf_dir, src)
            (
                df.repartition(_BUCKETS, F.col(key))
                .write.mode("overwrite")
                .option("path", os.path.join(root, tbl))
                .bucketBy(_BUCKETS, key)
                .sortBy(key)
                .saveAsTable(tbl)
            )
    return names


def _bucketed_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue by market segment over a join of two BUCKETED tables:
    both sides are pre-hashed into the same 8 buckets on the join key,
    so the sort-merge join reads bucket i against bucket i with ZERO
    exchange of either side (pinned with broadcast disabled in
    tests/test_pipeline_ops.py). At 100 TB this is the difference
    between a join that shuffles two fact tables and one that
    shuffles nothing."""
    t_orders, t_customer = _bucketed_tables(spark, sf_dir)
    o = spark.table(t_orders)
    c = spark.table(t_customer)
    j = o.join(c, o.o_custkey == c.c_custkey)
    return j.groupBy("c_mktsegment").agg(
        F.count("*").alias("n_orders"),
        F.countDistinct("c_custkey").alias("n_customers"),
        F.round(F.sum("o_totalprice"), 2).alias("total_price"),
    )


register(
    "bucketed_join_customer_orders",
    _bucketed_join,
    """
SELECT c_mktsegment, count(*) AS n_orders,
       count(DISTINCT c_custkey) AS n_customers,
       round(sum(o_totalprice), 2) AS total_price
FROM orders JOIN customer ON o_custkey = c_custkey
GROUP BY c_mktsegment
""",
)
