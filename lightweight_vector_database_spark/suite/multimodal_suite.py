"""Multimodal queries: binary payload stats (oracle-checked — the
payload derivation is pure SQL) and feature extraction / frame
sampling (rows-only: the feature values come from the Python-side
deterministic fake decoder)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.multimodal import (
    attach_fake_media,
    extract_features,
    frame_sample,
)
from ..sources import load_table
from . import register


def _media_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    media = attach_fake_media(load_table(spark, sf_dir, "documents"))
    return media.groupBy("media_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.length(F.col("payload"))).alias("total_bytes"),
        F.max("width").alias("max_w"),
        F.max("height").alias("max_h"),
    )


register(
    "multimodal_media_stats",
    _media_stats,
    """
SELECT CASE WHEN doc_id % 3 = 0 THEN 'image'
            WHEN doc_id % 3 = 1 THEN 'audio' ELSE 'video' END AS media_type,
       count(*) AS n,
       CAST(SUM(octet_length(encode(text))) AS BIGINT) AS total_bytes,
       MAX(CAST((doc_id % 4) * 64 + 64 AS INTEGER)) AS max_w,
       MAX(CAST((doc_id % 3) * 64 + 64 AS INTEGER)) AS max_h
FROM documents GROUP BY 1
""",
)


def _media_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Feature extraction through the mapInPandas plumbing (fake
    decoder -> rows-only; determinism is pytest-checked)."""
    media = attach_fake_media(load_table(spark, sf_dir, "documents"))
    feats = extract_features(media)
    return feats.select(
        "media_id",
        "media_type",
        F.round(F.element_at(F.col("features").cast("array<double>"), 1), 6).alias(
            "f0"
        ),
    )


register("multimodal_features", _media_features)  # rows-only


def _frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    media = attach_fake_media(load_table(spark, sf_dir, "documents"))
    return frame_sample(media, every_n=2).select(
        "media_id", "frame_idx", F.length("frame_payload").alias("frame_bytes")
    )


register("multimodal_frame_sample", _frames)  # rows-only
