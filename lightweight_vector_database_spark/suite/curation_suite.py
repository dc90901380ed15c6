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
       SUM(CAST(kept AS BIGINT)) AS n_kept,
       SUM(CASE WHEN kept THEN n_tokens ELSE 0 END) AS kept_tokens
FROM s GROUP BY source
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
