"""Training-data curation queries: token-window chunking, quality-gate
filtering with per-source retention stats, token-length histogram."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions import text as T
from ..sources import load_table
from . import register

CHUNK_SIZE = 32
CHUNK_STRIDE = 24


def _chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explode docs into overlapping token windows (the LLM
    pretraining chunking step), keyed (doc_id, chunk_idx)."""
    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 50)
    out = docs.select(
        "doc_id",
        F.posexplode(T.token_chunks("text", CHUNK_SIZE, CHUNK_STRIDE)).alias(
            "chunk_idx", "chunk"
        ),
    )
    return out.select(
        "doc_id",
        F.col("chunk_idx").cast("long").alias("chunk_idx"),
        F.size(T.tokens(F.col("chunk"))).cast("long").alias("chunk_tokens"),
        T.content_md5(F.col("chunk")).alias("chunk_md5"),
    )


register(
    "curation_token_chunks",
    _chunks,
    f"""
WITH t AS (
  SELECT doc_id, string_split(text, ' ') AS w FROM documents WHERE doc_id < 50
), s AS (
  SELECT doc_id, w,
         unnest(range(1, greatest(len(w), 1) + 1, {CHUNK_STRIDE})) AS start,
         unnest(range(0, len(range(1, greatest(len(w), 1) + 1, {CHUNK_STRIDE})))) AS chunk_idx
  FROM t WHERE len(w) > 0
), c AS (
  SELECT doc_id, chunk_idx,
         array_to_string(w[start:start + {CHUNK_SIZE} - 1], ' ') AS chunk
  FROM s
)
SELECT doc_id, CAST(chunk_idx AS BIGINT) AS chunk_idx,
       CAST(len(string_split(chunk, ' ')) AS BIGINT) AS chunk_tokens,
       md5(regexp_replace(trim(lower(chunk)), '\\s+', ' ', 'g')) AS chunk_md5
FROM c
""",
)


def _curation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-gate pipeline: keep docs passing length + uniqueness +
    quality thresholds; per-source retention stats."""
    docs = load_table(spark, sf_dir, "documents")
    scored = docs.select(
        "source",
        T.token_count("text").alias("n_tokens"),
        T.uniq_token_ratio("text").alias("uniq"),
        T.quality_score("text").alias("q"),
    )
    kept = (F.col("n_tokens") >= 20) & (F.col("uniq") >= 0.2) & (F.col("q") >= 0.5)
    return (
        scored.withColumn("kept", kept)
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(F.col("kept").cast("long")).alias("n_kept"),
            F.sum(F.when(F.col("kept"), F.col("n_tokens")).otherwise(0)).alias(
                "kept_tokens"
            ),
        )
    )


_UNIQ = ("(len(list_distinct(string_split(text, ' ')))::DOUBLE"
         " / len(string_split(text, ' ')))")
_NTOK = "len(string_split(text, ' '))"
_PUNCT = (
    "((length(text) - length(regexp_replace(text, '[^\\w\\s]', '', 'g')))::DOUBLE"
    " / length(text))"
)
_Q = (
    f"(0.5 * {_UNIQ} + 0.3 * least({_NTOK}::DOUBLE / 64.0, 1.0)"
    f" + 0.2 * (1.0 - {_PUNCT}))"
)

register(
    "curation_quality_gate",
    _curation,
    f"""
WITH s AS (
  SELECT source, CAST({_NTOK} AS BIGINT) AS n_tokens,
         ({_NTOK} >= 20 AND {_UNIQ} >= 0.2 AND {_Q} >= 0.5) AS kept
  FROM documents
)
SELECT source, count(*) AS n_docs,
       CAST(SUM(CAST(kept AS BIGINT)) AS BIGINT) AS n_kept,
       CAST(SUM(CASE WHEN kept THEN n_tokens ELSE 0 END) AS BIGINT) AS kept_tokens
FROM s GROUP BY source
""",
)


def _e2e_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full training-data pipeline as ONE composed plan: quality
    gate -> token-window chunking -> exact chunk dedup -> join back to
    embeddings (multimodal) -> per-language corpus stats. Exercises
    filter/explode/window/join/agg composition through Catalyst in a
    single query."""
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents")
    emb = load_table(spark, sf_dir, "embeddings")

    gated = docs.filter(
        (T.token_count("text") >= 20) & (T.uniq_token_ratio("text") >= 0.2)
    )
    chunks = gated.select(
        "doc_id",
        "lang",
        F.posexplode(T.token_chunks("text", CHUNK_SIZE, CHUNK_STRIDE)).alias(
            "chunk_idx", "chunk"
        ),
    )
    hashed = chunks.withColumn("h", T.content_sha256(F.col("chunk")))
    w = Window.partitionBy("h").orderBy("doc_id", "chunk_idx")
    deduped = hashed.withColumn("rn", F.row_number().over(w)).filter("rn = 1")
    norm_sq = F.aggregate(
        F.col("embedding").cast("array<double>"),
        F.lit(0.0),
        lambda acc, v: acc + v * v,
    )
    joined = deduped.join(emb, deduped.doc_id == emb.vec_id).withColumn(
        "norm_sq", norm_sq
    )
    return joined.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_chunks"),
        F.countDistinct("doc_id").alias("n_docs"),
        F.sum(F.size(T.tokens(F.col("chunk"))).cast("long")).alias("total_tokens"),
        F.sum(F.floor(F.col("norm_sq") * 1e6).cast("long")).alias("qnorm_sum"),
    )


register(
    "e2e_training_pipeline",
    _e2e_pipeline,
    f"""
WITH gated AS (
  SELECT doc_id, lang, string_split(text, ' ') AS w FROM documents
  WHERE len(string_split(text, ' ')) >= 20
    AND len(list_distinct(string_split(text, ' ')))::DOUBLE
        / len(string_split(text, ' ')) >= 0.2
), s AS (
  SELECT doc_id, lang, w,
         unnest(range(1, greatest(len(w), 1) + 1, {CHUNK_STRIDE})) AS start,
         unnest(range(0, len(range(1, greatest(len(w), 1) + 1, {CHUNK_STRIDE})))) AS chunk_idx
  FROM gated WHERE len(w) > 0
), c AS (
  SELECT doc_id, lang, chunk_idx,
         array_to_string(w[start:start + {CHUNK_SIZE} - 1], ' ') AS chunk
  FROM s
), h AS (
  SELECT doc_id, lang, chunk_idx, chunk,
         sha256(regexp_replace(trim(lower(chunk)), '\\s+', ' ', 'g')) AS hsh
  FROM c
), d AS (
  SELECT * FROM (
    SELECT doc_id, lang, chunk_idx, chunk,
           row_number() OVER (PARTITION BY hsh ORDER BY doc_id, chunk_idx) AS rn
    FROM h
  ) WHERE rn = 1
)
SELECT lang, count(*) AS n_chunks, count(DISTINCT d.doc_id) AS n_docs,
       CAST(SUM(CAST(len(string_split(chunk, ' ')) AS BIGINT)) AS BIGINT) AS total_tokens,
       CAST(SUM(CAST(floor(list_sum(list_transform(range(1, 65),
         i -> CAST(embedding[i] AS DOUBLE) * CAST(embedding[i] AS DOUBLE)))
         * 1000000.0) AS BIGINT)) AS BIGINT) AS qnorm_sum
FROM d JOIN embeddings ON d.doc_id = vec_id
GROUP BY lang
""",
)


def _histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-length histogram (width-10 buckets) across documents."""
    docs = load_table(spark, sf_dir, "documents")
    bucket = (F.floor(T.token_count("text") / 10) * 10).cast("long")
    return (
        docs.select(bucket.alias("token_bucket"))
        .groupBy("token_bucket")
        .agg(F.count(F.lit(1)).alias("n_docs"))
    )


register(
    "curation_token_histogram",
    _histogram,
    """
SELECT CAST(floor(len(string_split(text, ' ')) / 10) * 10 AS BIGINT) AS token_bucket,
       count(*) AS n_docs
FROM documents GROUP BY 1
""",
)
