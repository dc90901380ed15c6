"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

The real decode libraries (PIL/torchaudio/ffmpeg) are NOT in this
container, so the pixel/sample decode step is stubbed — but everything
Spark-side is real and tested: the schema, the Arrow batch shape
through ``mapInPandas``, the partitioning, and the row-explosion for
frame sampling. Swapping ``_fake_decode`` for a real decoder changes
no plan.

At 100 TB: media payloads dominate row size -> the iterator-of-batches
``mapInPandas`` form matters (bounded memory per task, controlled by
spark.sql.execution.arrow.maxRecordsPerBatch); feature extraction is
embarrassingly parallel with NO shuffle (narrow dependency), and the
output (id, features) is orders of magnitude smaller than the input —
exactly the shape you want before a shuffle or join.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA = (
    "media_id long, media_type string, payload binary, "
    "width int, height int, sample_rate int, n_frames int"
)

FEATURE_DIM = 8


def attach_fake_media(docs: DataFrame) -> DataFrame:
    """Deterministic media table derived from ``documents``: payload =
    utf-8 bytes of the text (an opaque stand-in for jpeg/wav/mp4
    bytes), modality round-robins by doc_id, metadata is typed."""
    mt = (
        F.when(F.col("doc_id") % 3 == 0, "image")
        .when(F.col("doc_id") % 3 == 1, "audio")
        .otherwise("video")
    )
    return docs.select(
        F.col("doc_id").alias("media_id"),
        mt.alias("media_type"),
        F.encode(F.col("text"), "utf-8").alias("payload"),
        (F.pmod(F.col("doc_id"), F.lit(4)) * 64 + 64).cast("int").alias("width"),
        (F.pmod(F.col("doc_id"), F.lit(3)) * 64 + 64).cast("int").alias("height"),
        F.lit(16_000).alias("sample_rate"),
        (F.pmod(F.col("doc_id"), F.lit(8)) + 1).cast("int").alias("n_frames"),
    )


def decode_image(payload: bytes):
    """Real image decode — gated on the decoder being installed.

    STUB: PIL is not available in this environment; the Spark plumbing
    around it (extract_features / resize_meta) uses _fake_decode."""
    try:
        from PIL import Image  # noqa: F401
    except ImportError as e:  # pragma: no cover - env without PIL
        raise NotImplementedError(
            "image decode requires PIL; this environment has no codec libs. "
            "Feature extraction uses the deterministic fake decoder instead."
        ) from e
    import io

    from PIL import Image

    return Image.open(io.BytesIO(payload))  # pragma: no cover


def _fake_decode(payload: bytes, dim: int = FEATURE_DIM) -> list[float]:
    """Deterministic stand-in for decode+embed: md5 bytes -> dim floats
    in [0, 1). Stable across runs/processes (no PYTHONHASHSEED issue)."""
    h = hashlib.md5(payload).digest()
    return [h[i % 16] / 256.0 + h[(i + 3) % 16] / 65536.0 for i in range(dim)]


def extract_features(media: DataFrame, dim: int = FEATURE_DIM) -> DataFrame:
    """(media_id, media_type, features array<float>) via mapInPandas —
    iterator form, bounded memory per Arrow batch."""
    import pandas as pd

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "media_type": pdf["media_type"],
                    "features": [
                        _fake_decode(bytes(p), dim) for p in pdf["payload"]
                    ],
                }
            )

    return media.mapInPandas(
        run, schema=f"media_id long, media_type string, features array<float>"
    )


def resize_meta(media: DataFrame, width: int, height: int) -> DataFrame:
    """Resize: metadata transform is real; pixel work is the stubbed
    decode step (payload passes through unchanged here)."""
    return media.withColumn("width", F.lit(width).cast("int")).withColumn(
        "height", F.lit(height).cast("int")
    )


def frame_sample(media: DataFrame, every_n: int = 2) -> DataFrame:
    """Explode video rows into sampled frames (media_id, frame_idx,
    frame_payload). Row explosion + per-frame payload slicing are real;
    the 'frame' is a deterministic byte slice stand-in.

    Pure Catalyst: ``sequence`` + ``explode`` generate the sampled
    frame indices and ``substring`` slices the payload — the whole
    operator stays inside whole-stage codegen with zero Python, which
    matters because at 100 TB this runs over the video table (the
    heaviest rows in the lake). A real decoder would swap the
    substring for a mapInPandas decode of (payload, frame_idx) AFTER
    this explosion — the narrow-dependency shape is unchanged."""
    if every_n < 1:
        raise ValueError("every_n must be >= 1")
    n = F.greatest(F.lit(1), F.col("n_frames").cast("long"))
    chunk = F.greatest(
        F.lit(1).cast("long"), (F.length("payload") / n).cast("long")
    )
    return (
        media.filter(F.col("media_type") == "video")
        .withColumn(
            "frame_idx",
            # guard n_frames < 1: ANSI sequence() rejects start > stop,
            # and exploding the empty array drops the row (no frames)
            F.explode(
                F.when(
                    F.col("n_frames") >= 1,
                    F.sequence(
                        F.lit(0).cast("long"),
                        F.col("n_frames").cast("long") - 1,
                        F.lit(int(every_n)).cast("long"),
                    ),
                ).otherwise(F.array().cast("array<long>"))
            ),
        )
        # substring is 1-based; start beyond the payload yields empty
        # bytes, matching a Python slice past the end
        .select(
            "media_id",
            F.col("frame_idx").cast("int").alias("frame_idx"),
            F.substring(
                F.col("payload"), (F.col("frame_idx") * chunk + 1).cast("int"),
                chunk.cast("int"),
            ).alias("frame_payload"),
        )
    )
