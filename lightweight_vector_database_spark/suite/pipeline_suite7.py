"""Training-pipeline queries, seventh batch (round 7): SQ8 ANN
serving, retrieval-quality evaluation, corpus keyness analysis.

* ``ann_sq8_rerank`` — int8 scalar-quantized approximate scoring
  (asymmetric distance against dequantized codes) with exact re-rank
  (operators/retrieval.sq8_train/sq8_rerank) — the third quantized
  serving path beside PQ/IVF-PQ (operators/similarity.py) and 1-bit
  Hamming (pipeline_suite4); the quantizer ranges are trained in one
  distributed min/max pass and shipped as literals, exactly how SQ
  indexes store metadata;
* ``ann_recall_hamming_at10`` — a first-class EVALUATION operator:
  recall@10 of the binary-Hamming path against the exact kNN ground
  truth, both rankings replayed verbatim in the oracle;
* ``lang_keyness_top_terms`` — per-language distinctive terms by
  smoothed log-odds-ratio (the Monroe et al. keyness statistic), the
  corpus-diagnostics op behind mixture design and contamination
  triage.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions import text as T
from ..operators.knn import knn
from ..operators.retrieval import hamming_rerank, sq8_rerank, sq8_train
from ..probes import DIM, probe_vector, sql_array
from ..sources import load_table
from . import register
from .knn_suite import _dist_sql
from .pipeline_suite4 import _BQ_CAND, _BQ_K, _BQ_PROBE

# --- SQ8 ANN -------------------------------------------------------------------

_SQ_PROBE = probe_vector(seed=13)
_SQ_CAND = 100
_SQ_K = 10


def _sq8_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    lo, hi = sq8_train(emb, dim=DIM)
    out = sq8_rerank(emb, _SQ_PROBE, _SQ_K, _SQ_CAND, lo, hi)
    return out.select(
        "vec_id",
        F.round(F.col("adist"), 6).alias("adist"),
        F.round(F.col("dist"), 6).alias("dist"),
    )


def _sq8_oracle() -> str:
    recon = (
        "(sl.lo[i] + (least(greatest(floor((CAST(embedding[i] AS DOUBLE)"
        " - sl.lo[i]) / (sl.hi[i] - sl.lo[i]) * 255.0), 0), 255) + 0.5)"
        " * (sl.hi[i] - sl.lo[i]) / 256.0)"
    )
    return f"""
WITH d AS (
  SELECT t.i, CAST(t.x AS DOUBLE) AS x FROM embeddings,
  LATERAL (SELECT unnest(embedding) AS x,
                  unnest(range(0, len(embedding))) AS i) t
), s AS (
  SELECT i, min(x) AS lo, max(x) AS hi FROM d GROUP BY i
), sl AS (
  SELECT list(lo ORDER BY i) AS lo, list(hi ORDER BY i) AS hi FROM s
), probe AS (SELECT {sql_array(_SQ_PROBE)} AS p),
scored AS (
  SELECT vec_id, embedding,
         list_sum(list_transform(range(1, {DIM + 1}),
           i -> ({recon} - p[i]) * ({recon} - p[i]))) AS adist
  FROM embeddings CROSS JOIN sl CROSS JOIN probe
), cand AS (
  SELECT * FROM scored ORDER BY adist ASC, vec_id ASC LIMIT {_SQ_CAND}
)
SELECT vec_id, round(adist, 6) AS adist, round(dist, 6) AS dist FROM (
  SELECT vec_id, adist,
         {_dist_sql('embedding', 'p', 'euclidean_sq')} AS dist
  FROM cand CROSS JOIN probe
) ORDER BY dist ASC, vec_id ASC LIMIT {_SQ_K}
"""


register("ann_sq8_rerank", _sq8_query, _sq8_oracle())


# --- recall@10 evaluation ---------------------------------------------------------


def _recall_hamming(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    got = hamming_rerank(
        emb, _BQ_PROBE, _BQ_K, _BQ_CAND, metric="euclidean_sq", dim=DIM
    ).select("vec_id")
    want = knn(emb, _BQ_PROBE, _BQ_K, metric="euclidean_sq").select("vec_id")
    return got.join(want, "vec_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_overlap"),
        F.round(F.count(F.lit(1)) / F.lit(float(_BQ_K)), 6).alias(
            "recall_at_10"
        ),
    )


def _recall_oracle() -> str:
    half = DIM // 2
    p0 = sum(1 << i for i in range(half) if _BQ_PROBE[i] > 0)
    p1 = sum(1 << i for i in range(half) if _BQ_PROBE[half + i] > 0)
    pack = lambda lo, hi: (  # noqa: E731
        f"CAST(list_sum(list_transform(range({lo}, {hi + 1}), "
        f"i -> CASE WHEN CAST(embedding[i] AS DOUBLE) > 0 "
        f"THEN CAST(2**(i-{lo}) AS BIGINT) ELSE 0 END)) AS BIGINT)"
    )
    dist = _dist_sql("embedding", "p", "euclidean_sq")
    return f"""
WITH probe AS (SELECT {sql_array(_BQ_PROBE)} AS p),
packed AS (
  SELECT vec_id, embedding,
         {pack(1, half)} AS w0, {pack(half + 1, DIM)} AS w1
  FROM embeddings
), hcand AS (
  SELECT vec_id, embedding,
         CAST(bit_count(xor(w0, {p0})) + bit_count(xor(w1, {p1}))
              AS BIGINT) AS hamming
  FROM packed ORDER BY hamming ASC, vec_id ASC LIMIT {_BQ_CAND}
), ham AS (
  SELECT vec_id FROM (
    SELECT vec_id, {dist} AS dist FROM hcand CROSS JOIN probe
  ) ORDER BY dist ASC, vec_id ASC LIMIT {_BQ_K}
), brute AS (
  SELECT vec_id FROM (
    SELECT vec_id, {dist} AS dist FROM embeddings CROSS JOIN probe
  ) ORDER BY dist ASC, vec_id ASC LIMIT {_BQ_K}
)
SELECT CAST(count(*) AS BIGINT) AS n_overlap,
       round(count(*) / {float(_BQ_K)}, 6) AS recall_at_10
FROM ham JOIN brute USING (vec_id)
"""


register("ann_recall_hamming_at10", _recall_hamming, _recall_oracle())


# --- language keyness -------------------------------------------------------------

_KEY_TOP = 5


def _lang_keyness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Smoothed log-odds keyness of every term per language vs the
    rest of the corpus; top 5 terms per language. The only
    corpus-sized shuffles are the (lang, term) and term count
    aggregations — both map-side-combinable; language totals broadcast
    back and the rank window partitions by language over the
    vocabulary-sized relation."""
    docs = load_table(spark, sf_dir, "documents")
    t = docs.select("lang", F.explode(T.tokens("text")).alias("term"))
    clt = t.groupBy("lang", "term").agg(F.count(F.lit(1)).alias("a"))
    al = t.groupBy("lang").agg(F.count(F.lit(1)).alias("a_tot"))
    ct = t.groupBy("term").agg(F.count(F.lit(1)).alias("c"))
    tot = t.agg(F.count(F.lit(1)).alias("n"))
    k = (
        clt.join(F.broadcast(al), "lang")
        .join(ct, "term")
        .join(F.broadcast(tot))
        .withColumn(
            "keyness",
            F.log((F.col("a") + 0.5) / ((F.col("a_tot") - F.col("a")) + 0.5))
            - F.log(
                ((F.col("c") - F.col("a")) + 0.5)
                / (
                    ((F.col("n") - F.col("a_tot")) - (F.col("c") - F.col("a")))
                    + 0.5
                )
            ),
        )
    )
    w = Window.partitionBy("lang").orderBy(
        F.col("keyness").desc(), F.col("term").asc()
    )
    return (
        k.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= _KEY_TOP)
        .select(
            "lang",
            "term",
            F.col("a").cast("long").alias("n_in_lang"),
            F.round(F.col("keyness"), 6).alias("keyness"),
        )
    )


register(
    "lang_keyness_top_terms",
    _lang_keyness,
    f"""
WITH t AS (
  SELECT lang, unnest(string_split(text, ' ')) AS term FROM documents
), clt AS (
  SELECT lang, term, count(*) AS a FROM t GROUP BY lang, term
), al AS (
  SELECT lang, count(*) AS a_tot FROM t GROUP BY lang
), ct AS (
  SELECT term, count(*) AS c FROM t GROUP BY term
), tot AS (SELECT count(*) AS n FROM t),
k AS (
  SELECT clt.lang, clt.term, clt.a,
         ln((clt.a + 0.5) / ((al.a_tot - clt.a) + 0.5))
       - ln(((ct.c - clt.a) + 0.5)
            / (((tot.n - al.a_tot) - (ct.c - clt.a)) + 0.5)) AS keyness
  FROM clt JOIN al USING (lang) JOIN ct USING (term) CROSS JOIN tot
), r AS (
  SELECT *, row_number() OVER (
    PARTITION BY lang ORDER BY keyness DESC, term ASC) AS rn
  FROM k
)
SELECT lang, term, CAST(a AS BIGINT) AS n_in_lang,
       round(keyness, 6) AS keyness
FROM r WHERE rn <= {_KEY_TOP}
""",
)
