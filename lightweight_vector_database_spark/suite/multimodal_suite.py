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


# exact oracle: the fake decoder is md5-byte arithmetic — f0 =
# digest[0]/256 + digest[3]/65536, an exact multiple of 2^-16, so the
# float32 storage loses nothing and DuckDB reproduces it from the hex
# digest with a strpos nibble lookup
_HV1 = "(strpos('0123456789abcdef', substr(m, {p}, 1)) - 1)"


def _md5_byte(k: int) -> str:
    hi = _HV1.format(p=2 * k + 1)
    lo = _HV1.format(p=2 * k + 2)
    return f"(16 * {hi} + {lo})"


register(
    "multimodal_features",
    _media_features,
    f"""
WITH d AS (SELECT doc_id, md5(text) AS m FROM documents)
SELECT doc_id AS media_id,
       CASE WHEN doc_id % 3 = 0 THEN 'image'
            WHEN doc_id % 3 = 1 THEN 'audio' ELSE 'video' END AS media_type,
       round({_md5_byte(0)} / 256.0 + {_md5_byte(3)} / 65536.0, 6) AS f0
FROM d
""",
)


def _frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    media = attach_fake_media(load_table(spark, sf_dir, "documents"))
    return frame_sample(media, every_n=2).select(
        "media_id",
        "frame_idx",
        F.length("frame_payload").alias("frame_bytes"),
        F.md5("frame_payload").alias("frame_md5"),
    )


# exact oracle: the payload is utf-8 of ASCII text, so byte slicing ==
# character slicing and DuckDB reproduces every frame's length AND md5
register(
    "multimodal_frame_sample",
    _frames,
    """
WITH media AS (
  SELECT doc_id AS media_id, text, length(text) AS plen,
         doc_id % 8 + 1 AS n_frames
  FROM documents WHERE doc_id % 3 = 2
), f AS (
  SELECT media_id, text, plen, n_frames,
         greatest(1, plen // n_frames) AS chunk,
         unnest(range(0, n_frames, 2)) AS fi
  FROM media
)
SELECT media_id, CAST(fi AS INT) AS frame_idx,
       CAST(greatest(0, least(chunk, plen - fi * chunk)) AS INT) AS frame_bytes,
       md5(substring(text, CAST(fi * chunk + 1 AS BIGINT), CAST(chunk AS BIGINT)))
         AS frame_md5
FROM f
""",
)


def _wav_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL audio codec round-trip: per-doc deterministic PCM samples
    are written as actual RIFF/WAVE bytes (stdlib `wave` writer) into
    the binary column, then DECODED back by the `wave` reader — header
    validation, frame extraction, and sample-domain features all on
    real container bytes. Exact oracle: the samples are closed-form in
    (doc_id, len(text)), so DuckDB recomputes mean/rms without ever
    seeing the WAV container (which is precisely what the round-trip
    proves: encode -> binary column -> decode is lossless)."""
    from ..operators.multimodal import synth_wav_media, wav_features

    docs = load_table(spark, sf_dir, "documents")
    media = synth_wav_media(docs)
    out = wav_features(media)
    return out.select(
        "media_id",
        "sample_rate",
        "n_samples",
        F.round("mean_amp", 6).alias("mean_amp"),
        F.round("rms_amp", 6).alias("rms_amp"),
    )


register(
    "multimodal_wav_decode",
    _wav_decode,
    """
WITH m AS (
  SELECT doc_id AS media_id, length(text) % 100 + 50 AS n FROM documents
), s AS (
  SELECT media_id, n,
         list_transform(range(0, n),
           i -> CAST(((media_id * 31 + i * 7) % 256 - 128) * 256 AS DOUBLE)) AS smp
  FROM m
)
SELECT media_id, 16000 AS sample_rate, CAST(n AS BIGINT) AS n_samples,
       round(list_sum(smp) / n, 6) AS mean_amp,
       round(sqrt(list_sum(list_transform(smp, x -> x * x)) / n), 6) AS rms_amp
FROM s
""",
)


def _ppm_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL image codec round-trip: P6 PPM headers + raw pixel planes
    written into the binary column, then parsed back (magic, dims,
    maxval validated) with per-channel means. Same exactness argument
    as the WAV twin."""
    from ..operators.multimodal import ppm_features, synth_ppm_media

    docs = load_table(spark, sf_dir, "documents")
    out = ppm_features(synth_ppm_media(docs))
    return out.select(
        "media_id",
        "width",
        "height",
        F.round("mean_r", 6).alias("mean_r"),
        F.round("mean_g", 6).alias("mean_g"),
        F.round("mean_b", 6).alias("mean_b"),
    )


register(
    "multimodal_ppm_decode",
    _ppm_decode,
    """
WITH m AS (
  SELECT doc_id AS media_id,
         CAST(doc_id % 4 + 2 AS INT) AS width,
         CAST(doc_id % 3 + 2 AS INT) AS height
  FROM documents
)
SELECT media_id, width, height,
       round(list_sum(list_transform(range(0, width * height),
         k -> CAST((media_id * 7 + 3 * k) % 256 AS DOUBLE))) / (width * height), 6)
         AS mean_r,
       round(list_sum(list_transform(range(0, width * height),
         k -> CAST((media_id * 7 + 3 * k + 1) % 256 AS DOUBLE))) / (width * height), 6)
         AS mean_g,
       round(list_sum(list_transform(range(0, width * height),
         k -> CAST((media_id * 7 + 3 * k + 2) % 256 AS DOUBLE))) / (width * height), 6)
         AS mean_b
FROM m
""",
)


def _ppm_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """decode -> nearest-neighbor resize -> re-encode -> decode again:
    the resized payloads are REAL PPM bytes produced and re-parsed by
    the actual codec path (operators/multimodal.ppm_resize); the
    oracle recomputes the sampled pixels from the closed-form synth
    formula plus the same floor-scaled source-index map, so any error
    in the pixel addressing, the re-encoded header, or the second
    parse breaks the value hash."""
    from ..operators.multimodal import ppm_features, ppm_resize, synth_ppm_media

    docs = load_table(spark, sf_dir, "documents")
    out = ppm_features(ppm_resize(synth_ppm_media(docs), 3, 2))
    return out.select(
        "media_id",
        "width",
        "height",
        F.round("mean_r", 6).alias("mean_r"),
        F.round("mean_g", 6).alias("mean_g"),
        F.round("mean_b", 6).alias("mean_b"),
    )


register(
    "multimodal_ppm_resize",
    _ppm_resize,
    """
WITH m AS (
  SELECT doc_id AS media_id, doc_id % 4 + 2 AS w, doc_id % 3 + 2 AS h
  FROM documents
), px AS (
  SELECT media_id,
         ((y * h) // 2 * w + (x * w) // 3) * 3 AS base
  FROM m, range(0, 2) t(y), range(0, 3) s(x)
)
SELECT media_id, CAST(3 AS INT) AS width, CAST(2 AS INT) AS height,
       round(avg(CAST((media_id * 7 + base) % 256 AS DOUBLE)), 6) AS mean_r,
       round(avg(CAST((media_id * 7 + base + 1) % 256 AS DOUBLE)), 6) AS mean_g,
       round(avg(CAST((media_id * 7 + base + 2) % 256 AS DOUBLE)), 6) AS mean_b
FROM px GROUP BY media_id
""",
)
