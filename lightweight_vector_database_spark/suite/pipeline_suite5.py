"""Training-pipeline queries, fifth batch (round 7): distributed
k-means, late-interaction retrieval, benchmark decontamination.

* ``kmeans_cluster_profile`` — 3 Lloyd rounds of k=8 full-corpus
  k-means (operators/kmeans.py). The update step's micro-unit integer
  quantization makes every round's arithmetic order-independent, so a
  fixed iteration count replays EXACTLY in unrolled SQL CTEs
  (c0 -> a1/c1 -> a2/c2 -> a3/c3) — the same driver-looped-vs-no-loop
  pinning as graph_pagerank_bipartite;
* ``maxsim_label_retrieval`` — ColBERT-style MaxSim late-interaction
  scoring (operators/retrieval.maxsim_score): each label group is a
  multi-vector document, the query is two probe vectors;
* ``decontaminate_13gram`` — GPT-3-recipe benchmark decontamination
  (operators/substring_dedup.decontaminate_by_windows): corpus docs
  sharing any 13-token window with the held-out split are flagged.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.kmeans import kmeans_fixed
from ..operators.retrieval import maxsim_score
from ..operators.substring_dedup import decontaminate_by_windows
from ..probes import DIM, probe_vector, sql_array
from ..sources import load_table
from . import register

# --- k-means -----------------------------------------------------------------

_KM_K = 8
_KM_ITERS = 3


def _kmeans_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    return kmeans_fixed(emb, _KM_K, _KM_ITERS, dim=DIM)


def _kmeans_oracle(k: int, iters: int, dim: int) -> str:
    cent_exprs = ", ".join(
        f"(CAST(sum(CAST(floor(v[{i}] * 1000000.0) AS BIGINT)) AS DOUBLE)"
        f" / 1000000.0) / count(*)"
        for i in range(1, dim + 1)
    )
    parts = [
        f"""emb AS (
  SELECT vec_id,
         list_transform(range(1, {dim + 1}),
           i -> CAST(embedding[i] AS DOUBLE)) AS v
  FROM embeddings
), c0 AS (
  SELECT CAST(row_number() OVER (ORDER BY vec_id) - 1 AS BIGINT) AS j,
         v AS cent
  FROM (SELECT vec_id, v FROM emb ORDER BY vec_id LIMIT {k})
)"""
    ]
    prev = "c0"
    for t in range(1, iters + 1):
        parts.append(
            f"""a{t} AS (
  SELECT vec_id, v, j FROM (
    SELECT e.vec_id, e.v, c.j,
           row_number() OVER (PARTITION BY e.vec_id ORDER BY
             list_sum(list_transform(range(1, {dim + 1}),
               i -> (e.v[i] - c.cent[i]) * (e.v[i] - c.cent[i]))) ASC,
             c.j ASC) AS rn
    FROM emb e CROSS JOIN {prev} c
  ) WHERE rn = 1
), c{t} AS (
  SELECT j, CAST(count(*) AS BIGINT) AS n, [{cent_exprs}] AS cent
  FROM a{t} GROUP BY j
)"""
        )
        prev = f"c{t}"
    ctes = ",\n".join(parts)
    return f"""
WITH {ctes}
SELECT j, n,
       round(sqrt(list_sum(list_transform(range(1, {dim + 1}),
         i -> cent[i] * cent[i]))), 6) AS cnorm
FROM {prev}
"""


register(
    "kmeans_cluster_profile",
    _kmeans_profile,
    _kmeans_oracle(_KM_K, _KM_ITERS, DIM),
)


# --- MaxSim late interaction ---------------------------------------------------

_MS_Q = [probe_vector(seed=7), probe_vector(seed=11)]


def _maxsim_labels(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    return maxsim_score(emb, _MS_Q, group_col="label")


def _maxsim_oracle() -> str:
    dots = ", ".join(
        f"""CAST(floor(list_sum(list_transform(range(1, {DIM + 1}),
          i -> CAST(embedding[i] AS DOUBLE) * ({sql_array(q)})[i]))
          * 1000000.0) AS BIGINT) AS dot_{j}"""
        for j, q in enumerate(_MS_Q)
    )
    total = " + ".join(f"max(dot_{j})" for j in range(len(_MS_Q)))
    return f"""
SELECT label, ({total}) / 1000000.0 AS maxsim
FROM (SELECT label, {dots} FROM embeddings)
GROUP BY label
"""


register("maxsim_label_retrieval", _maxsim_labels, _maxsim_oracle())


# --- 13-gram decontamination ----------------------------------------------------

_DC_W = 13
_DC_MOD = 7  # doc_id % 7 == 0 is the held-out split


def _decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    heldout = docs.filter(F.col("doc_id") % _DC_MOD == 0)
    corpus = docs.filter(F.col("doc_id") % _DC_MOD != 0)
    return decontaminate_by_windows(corpus, heldout, _DC_W)


register(
    "decontaminate_13gram",
    _decontaminate,
    f"""
WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
wins AS (
  SELECT doc_id,
         unnest(list_transform(range(1, greatest(len(t) - {_DC_W} + 2, 1)),
           i -> md5(array_to_string(t[i:i+{_DC_W - 1}], ' ')))) AS whash
  FROM toks
), held AS (
  SELECT DISTINCT whash FROM wins WHERE doc_id % {_DC_MOD} = 0
), corp AS (
  SELECT w.doc_id, w.whash, h.whash IS NOT NULL AS hit
  FROM wins w LEFT JOIN held h USING (whash)
  WHERE w.doc_id % {_DC_MOD} <> 0
), stats AS (
  SELECT doc_id,
         CAST(count(*) AS BIGINT) AS n_windows,
         CAST(sum(CASE WHEN hit THEN 1 ELSE 0 END) AS BIGINT) AS n_hits
  FROM corp GROUP BY doc_id
)
SELECT doc_id, n_hits, n_windows,
       round(n_hits * 1.0 / n_windows, 6) AS hit_ratio
FROM stats WHERE n_hits > 0
""",
)
