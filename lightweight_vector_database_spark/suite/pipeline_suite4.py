"""Training-pipeline queries, fourth batch (round 7): hybrid
retrieval, exact substring-span dedup, binary-quantized ANN,
conjunctive search, and corpus-overlap estimation.

* ``hybrid_rrf_search`` — reciprocal-rank fusion of the lexical
  (BM25 top-20) and vector (cosine kNN top-20) retrieval legs
  (operators/retrieval.py) — the fused-search surface production
  vector stores layer over the reference's pure-vector
  find_k_nearest_neighbors (kd_tree_database.py:285-304);
* ``dedup_substring_spans`` — sliding 8-token-window repeated-span
  census (operators/substring_dedup.py), the Lee-et-al-style exact
  substring dedup signal;
* ``ann_binary_hamming_rerank`` — 1-bit sign quantization packed to
  two 32-bit words, Hamming candidate cut, exact re-rank
  (operators/retrieval.py) — the oracle replays the identical
  two-stage algorithm, so the match is exact by construction;
* ``boolean_search_all_terms`` — conjunctive inverted-list lookup;
* ``source_overlap_minhash`` — per-source minhash signatures ->
  pairwise corpus Jaccard estimates (operators/overlap.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..operators.knn import knn
from ..operators.overlap import pairwise_group_overlap
from ..operators.retrieval import (
    bm25_scores,
    boolean_all_terms,
    hamming_rerank,
    rrf_fuse,
)
from ..operators.substring_dedup import duplicate_window_stats
from ..probes import DIM, probe_vector, sql_array
from ..sources import load_table
from . import register
from .knn_suite import _dist_sql
from .text_suite import _BM25_TERMS

# --- hybrid RRF search -------------------------------------------------------

_RRF_K = 60
_RRF_LEG_K = 20
_RRF_OUT_K = 15
_RRF_PROBE = probe_vector(seed=3)  # PROBE2 — same leg as knn_cosine


def _hybrid_rrf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RRF fusion of BM25 top-20 and cosine-kNN top-20 (doc_id ==
    vec_id in the fixtures). Each leg is reduced to its top-k by
    TakeOrderedAndProject BEFORE the rank window runs, so the window
    sorts 20 rows, never the corpus."""
    docs = load_table(spark, sf_dir, "documents")
    emb = load_table(spark, sf_dir, "embeddings")

    bm = bm25_scores(docs, _BM25_TERMS).orderBy(
        F.col("bm25").desc(), F.col("doc_id").asc()
    ).limit(_RRF_LEG_K)
    bm = bm.withColumn(
        "rank",
        F.row_number().over(
            Window.orderBy(F.col("bm25").desc(), F.col("doc_id").asc())
        ),
    )

    ann = knn(emb, _RRF_PROBE, _RRF_LEG_K, metric="cosine").select(
        F.col("vec_id").alias("doc_id"), "dist"
    )
    ann = ann.withColumn(
        "rank",
        F.row_number().over(
            Window.orderBy(F.col("dist").asc(), F.col("doc_id").asc())
        ),
    )

    fused = rrf_fuse(
        {"bm25": bm, "ann": ann}, id_col="doc_id", k_const=_RRF_K
    )
    return (
        fused.select(
            "doc_id", "rank_bm25", "rank_ann", F.round("rrf", 6).alias("rrf")
        )
        .orderBy(F.col("rrf").desc(), F.col("doc_id").asc())
        .limit(_RRF_OUT_K)
    )


def _hybrid_oracle() -> str:
    terms = ", ".join(repr(t) for t in _BM25_TERMS)
    return f"""
WITH dl AS (
  SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS dl
  FROM documents
), s AS (
  SELECT count(*) AS n_docs, avg(dl) AS avgdl FROM dl
), tf AS (
  SELECT doc_id, term, count(*) AS tf
  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents)
  WHERE term IN ({terms})
  GROUP BY doc_id, term
), dfc AS (
  SELECT term, count(DISTINCT doc_id) AS df FROM tf GROUP BY term
), comp AS (
  SELECT tf.doc_id,
         CAST(floor(
           ln(1.0 + (s.n_docs - dfc.df + 0.5) / (dfc.df + 0.5))
           * (tf.tf * 2.2)
           / (tf.tf + 1.2 * (0.25 + 0.75 * dl.dl / s.avgdl))
           * 1000000.0) AS BIGINT) AS cu
  FROM tf
  JOIN dfc USING (term)
  JOIN dl ON tf.doc_id = dl.doc_id
  CROSS JOIN s
), bm AS (
  SELECT doc_id, SUM(cu) / 1000000.0 AS bm25 FROM comp GROUP BY doc_id
), bmtop AS (
  SELECT doc_id, r FROM (
    SELECT doc_id,
           ROW_NUMBER() OVER (ORDER BY bm25 DESC, doc_id ASC) AS r
    FROM bm) WHERE r <= {_RRF_LEG_K}
), probe AS (SELECT {sql_array(_RRF_PROBE)} AS p),
ann AS (
  SELECT vec_id AS doc_id,
         {_dist_sql('embedding', 'p', 'cosine')} AS dist
  FROM embeddings CROSS JOIN probe
), anntop AS (
  SELECT doc_id, r FROM (
    SELECT doc_id,
           ROW_NUMBER() OVER (ORDER BY dist ASC, doc_id ASC) AS r
    FROM ann) WHERE r <= {_RRF_LEG_K}
), fused AS (
  SELECT coalesce(b.doc_id, a.doc_id) AS doc_id,
         b.r AS rank_bm25, a.r AS rank_ann,
         coalesce(1.0 / ({_RRF_K} + b.r), 0)
           + coalesce(1.0 / ({_RRF_K} + a.r), 0) AS rrf
  FROM bmtop b FULL OUTER JOIN anntop a ON b.doc_id = a.doc_id
)
SELECT doc_id, rank_bm25, rank_ann, round(rrf, 6) AS rrf
FROM fused ORDER BY rrf DESC, doc_id ASC LIMIT {_RRF_OUT_K}
"""


register("hybrid_rrf_search", _hybrid_rrf, _hybrid_oracle())


# --- exact substring-span dedup ---------------------------------------------

_SPAN_W = 8


def _substring_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return duplicate_window_stats(docs, _SPAN_W)


register(
    "dedup_substring_spans",
    _substring_spans,
    f"""
WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
wins AS (
  SELECT doc_id,
         unnest(list_transform(range(1, greatest(len(t) - {_SPAN_W} + 2, 1)),
           i -> md5(array_to_string(t[i:i+{_SPAN_W - 1}], ' ')))) AS whash
  FROM toks
), dup AS (
  SELECT whash FROM wins GROUP BY whash HAVING count(DISTINCT doc_id) >= 2
), stats AS (
  SELECT w.doc_id,
         CAST(count(*) AS BIGINT) AS n_windows,
         CAST(coalesce(sum(CASE WHEN d.whash IS NOT NULL THEN 1 ELSE 0 END), 0)
              AS BIGINT) AS n_dup_windows
  FROM wins w LEFT JOIN dup d USING (whash)
  GROUP BY w.doc_id
)
SELECT doc_id, n_windows, n_dup_windows,
       round(n_dup_windows * 1.0 / n_windows, 6) AS dup_ratio
FROM stats WHERE n_dup_windows > 0
""",
)


# --- binary-quantized ANN ----------------------------------------------------

_BQ_PROBE = probe_vector(seed=0)
_BQ_CAND = 100
_BQ_K = 10
_BQ_HALF = DIM // 2
_BQ_P0 = sum(1 << i for i in range(_BQ_HALF) if _BQ_PROBE[i] > 0)
_BQ_P1 = sum(1 << i for i in range(_BQ_HALF) if _BQ_PROBE[_BQ_HALF + i] > 0)


def _binary_hamming(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    out = hamming_rerank(
        emb, _BQ_PROBE, _BQ_K, _BQ_CAND, metric="euclidean_sq", dim=DIM
    )
    return out.select(
        "vec_id", "hamming", F.round(F.col("dist"), 6).alias("dist")
    )


def _binary_hamming_oracle() -> str:
    pack = lambda lo, hi: (  # noqa: E731
        f"CAST(list_sum(list_transform(range({lo}, {hi + 1}), "
        f"i -> CASE WHEN CAST(embedding[i] AS DOUBLE) > 0 "
        f"THEN CAST(2**(i-{lo}) AS BIGINT) ELSE 0 END)) AS BIGINT)"
    )
    return f"""
WITH probe AS (SELECT {sql_array(_BQ_PROBE)} AS p),
packed AS (
  SELECT vec_id, embedding,
         {pack(1, _BQ_HALF)} AS w0,
         {pack(_BQ_HALF + 1, DIM)} AS w1
  FROM embeddings
), cand AS (
  SELECT vec_id, embedding,
         CAST(bit_count(xor(w0, {_BQ_P0})) + bit_count(xor(w1, {_BQ_P1}))
              AS BIGINT) AS hamming
  FROM packed ORDER BY hamming ASC, vec_id ASC LIMIT {_BQ_CAND}
)
SELECT vec_id, hamming, round(dist, 6) AS dist FROM (
  SELECT vec_id, hamming,
         {_dist_sql('embedding', 'p', 'euclidean_sq')} AS dist
  FROM cand CROSS JOIN probe
) ORDER BY dist ASC, vec_id ASC LIMIT {_BQ_K}
"""


register(
    "ann_binary_hamming_rerank", _binary_hamming, _binary_hamming_oracle()
)


# --- conjunctive boolean search ----------------------------------------------

_BOOL_TERMS = ("vector", "hash", "scan", "batch")


def _boolean_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return boolean_all_terms(docs, _BOOL_TERMS)


register(
    "boolean_search_all_terms",
    _boolean_search,
    f"""
SELECT doc_id
FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents)
WHERE term IN ({', '.join(repr(t) for t in _BOOL_TERMS)})
GROUP BY doc_id HAVING count(DISTINCT term) = {len(_BOOL_TERMS)}
""",
)


# --- corpus overlap ----------------------------------------------------------

_OVL_PERMS = 16


def _source_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return pairwise_group_overlap(docs, n_perms=_OVL_PERMS, ngram=3)


register(
    "source_overlap_minhash",
    _source_overlap,
    f"""
WITH grams AS (
  SELECT DISTINCT source,
         unnest(list_transform(range(1, len(w) - 1),
           i -> concat_ws(' ', w[i], w[i+1], w[i+2]))) AS g
  FROM (SELECT source, string_split(text, ' ') AS w FROM documents)
), sigs AS (
  SELECT source, p, min(md5(CAST(p AS VARCHAR) || ':' || g)) AS sig
  FROM grams CROSS JOIN (SELECT unnest(range(0, {_OVL_PERMS})) AS p) perms
  GROUP BY source, p
)
SELECT a.source AS group_a, b.source AS group_b,
       CAST(sum(CASE WHEN a.sig = b.sig THEN 1 ELSE 0 END) AS BIGINT)
         AS matches,
       round(sum(CASE WHEN a.sig = b.sig THEN 1 ELSE 0 END)
             / {float(_OVL_PERMS)}, 6) AS est_jaccard
FROM sigs a JOIN sigs b ON a.p = b.p AND a.source < b.source
GROUP BY 1, 2
""",
)
