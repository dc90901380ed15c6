"""Training-pipeline queries, eighth batch (round 7): MMR diversified
retrieval and parquet schema evolution.

* ``mmr_diversified_topk`` — Maximal Marginal Relevance re-ranking
  (operators/retrieval.mmr_select): greedy top-5 from a distributed
  top-20 relevance pool, each step maximizing
  0.3 * min-distance-to-selected - 0.7 * distance-to-query. The greedy
  scan is inherently sequential, so the oracle unrolls it into one CTE
  per step (s1..s5) — the same fixed-iteration pinning used for
  PageRank and k-means; Spark and DuckDB must agree on every fold,
  every comparison, and every tie;
* ``schema_evolution_read`` — two dataset generations with different
  schemas (a ``quality`` column added mid-corpus, the routine
  evolution event in a long-lived training corpus) read back through
  parquet mergeSchema: old rows surface NULL for the new column, new
  rows keep exact values — proving the lake layer tolerates additive
  schema change without a rewrite.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.retrieval import mmr_select
from ..probes import DIM, probe_vector, sql_array
from ..sources import load_table
from . import register
from .knn_suite import _dist_sql
from .pipeline_suite import _REPO_ROOT, _sf_tag

_MMR_PROBE = probe_vector(seed=17)
_MMR_K = 5
_MMR_POOL = 20
_MMR_REL = 0.7
_MMR_DIV = 0.3


def _mmr_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    out = mmr_select(
        emb,
        _MMR_PROBE,
        _MMR_K,
        _MMR_POOL,
        relevance_weight=_MMR_REL,
        diversity_weight=_MMR_DIV,
    )
    return out.select("step", "vec_id", F.round(F.col("dq"), 6).alias("dq"))


def _mmr_oracle() -> str:
    def fold(j: int) -> str:
        return (
            f"list_sum(list_transform(range(1, {DIM + 1}), "
            f"i -> (p.v[i] - s{j}.v[i]) * (p.v[i] - s{j}.v[i])))"
        )

    parts = [
        f"""probe AS (SELECT {sql_array(_MMR_PROBE)} AS pr),
pool AS (
  SELECT vec_id,
         list_transform(range(1, {DIM + 1}),
           i -> CAST(embedding[i] AS DOUBLE)) AS v,
         dq
  FROM (
    SELECT vec_id, embedding,
           {_dist_sql('embedding', 'pr', 'euclidean_sq')} AS dq
    FROM embeddings CROSS JOIN probe
  ) ORDER BY dq ASC, vec_id ASC LIMIT {_MMR_POOL}
), s1 AS (
  SELECT vec_id, v, dq FROM pool ORDER BY dq ASC, vec_id ASC LIMIT 1
)"""
    ]
    for t in range(2, _MMR_K + 1):
        prev = ", ".join(f"s{j}" for j in range(1, t))
        not_sel = " AND ".join(f"p.vec_id != s{j}.vec_id" for j in range(1, t))
        folds = [fold(j) for j in range(1, t)]
        min_ds = folds[0] if len(folds) == 1 else f"least({', '.join(folds)})"
        parts.append(
            f"""s{t} AS (
  SELECT p.vec_id, p.v, p.dq FROM pool p, {prev}
  WHERE {not_sel}
  ORDER BY ({_MMR_DIV} * ({min_ds})) - ({_MMR_REL} * p.dq) DESC,
           p.vec_id ASC
  LIMIT 1
)"""
        )
    ctes = ",\n".join(parts)
    selects = "\nUNION ALL\n".join(
        f"SELECT CAST({t} AS BIGINT) AS step, vec_id, round(dq, 6) AS dq FROM s{t}"
        for t in range(1, _MMR_K + 1)
    )
    return f"WITH {ctes}\n{selects}"


register("mmr_diversified_topk", _mmr_topk, _mmr_oracle())


# --- parquet schema evolution --------------------------------------------------


def _schema_evolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Generation 1 (even doc_ids) has the original document schema;
    generation 2 (odd doc_ids) adds ``quality``. mergeSchema unifies
    them on read; per-language stats prove old rows carry NULL and new
    rows carry exact values. quality = n_chars / 1024.0 (a power-of-two
    divisor, so the double is exact and the micro-unit floor replays
    identically in the oracle)."""
    path = os.path.join(
        _REPO_ROOT, ".schemaevo_cache", f"docs_{_sf_tag(sf_dir)}"
    )
    if not os.path.exists(os.path.join(path, "_SUCCESS")):
        docs = load_table(spark, sf_dir, "documents")
        docs.filter(F.col("doc_id") % 2 == 0).write.mode("overwrite").parquet(
            path
        )
        docs.filter(F.col("doc_id") % 2 == 1).withColumn(
            "quality", F.col("n_chars") / F.lit(1024.0)
        ).write.mode("append").parquet(path)
    back = spark.read.option("mergeSchema", True).parquet(path)
    return back.groupBy("lang").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.count("quality").cast("long").alias("n_with_quality"),
        F.coalesce(
            F.sum(F.floor(F.col("quality") * F.lit(1e6)).cast("long")),
            F.lit(0),
        ).cast("long").alias("sum_quality_micro"),
    )


register(
    "schema_evolution_read",
    _schema_evolution,
    """
SELECT lang, CAST(count(*) AS BIGINT) AS n,
       CAST(sum(CASE WHEN doc_id % 2 = 1 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_with_quality,
       CAST(coalesce(sum(CASE WHEN doc_id % 2 = 1
                               THEN CAST(floor((n_chars / 1024.0) * 1000000.0)
                                         AS BIGINT)
                               ELSE 0 END), 0) AS BIGINT)
         AS sum_quality_micro
FROM documents GROUP BY lang
""",
)
