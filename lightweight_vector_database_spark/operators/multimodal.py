"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

Two decode tiers:

- REAL codecs needing no native libs: RIFF/WAVE through the stdlib
  ``wave`` module (``synth_wav_media`` / ``wav_features``) and binary
  PPM images parsed by hand (``synth_ppm_media`` / ``ppm_features``) —
  actual container bytes written into and decoded out of the Spark
  binary column, with closed-form payloads so features are exactly
  SQL-oracled.
- Formats whose decoders (PIL/torchaudio/ffmpeg) are NOT in this
  container keep the deterministic ``_fake_decode`` stand-in — the
  schema, Arrow batch shape through ``mapInPandas``, partitioning, and
  frame-sampling row explosion are identical either way, so swapping
  in a real decoder changes no plan.

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


# --- real codecs (stdlib-only) ----------------------------------------------
#
# The container has no PIL/ffmpeg, but two formats need no native libs:
# RIFF/WAVE (stdlib ``wave``) and binary PPM (a 3-line header + raw
# pixels). These make the decode step REAL — actual container bytes are
# written into and parsed back out of the Spark binary column through
# the same iterator-of-batches mapInPandas plumbing the fake decoder
# uses — while staying exactly oracle-checkable because the synthesized
# samples/pixels are closed-form in (doc_id, len(text)).


def synth_wav_media(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    sample_rate: int = 16_000,
) -> DataFrame:
    """(media_id, payload) — a REAL 16-bit mono PCM WAV per document,
    written with the stdlib ``wave`` codec (44-byte RIFF header +
    little-endian frames, not a stand-in). Deterministic samples:
    n = len(text) % 100 + 50, s[i] = ((doc_id*31 + i*7) % 256 - 128)
    * 256 — closed-form, so the decoded features have an exact SQL
    oracle."""
    import io
    import wave as wave_mod

    import numpy as np
    import pandas as pd

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = []
            for did, txt in zip(pdf[id_col], pdf[text_col]):
                n = len(txt) % 100 + 50
                i = np.arange(n, dtype=np.int64)
                s = (int(did) * 31 + i * 7) % 256 - 128
                buf = io.BytesIO()
                with wave_mod.open(buf, "wb") as w:
                    w.setnchannels(1)
                    w.setsampwidth(2)
                    w.setframerate(sample_rate)
                    w.writeframes((s * 256).astype("<i2").tobytes())
                payloads.append(buf.getvalue())
            yield pd.DataFrame({"media_id": pdf[id_col], "payload": payloads})

    return docs.select(id_col, text_col).mapInPandas(
        gen, "media_id long, payload binary"
    )


def wav_features(media: DataFrame, payload_col: str = "payload") -> DataFrame:
    """REAL audio decode: parse the RIFF/WAVE payload with the stdlib
    ``wave`` reader (it validates the RIFF magic, fmt chunk, and PCM
    encoding — corrupt bytes raise) and compute sample-domain features:
    (media_id, sample_rate, n_samples, mean_amp, rms_amp). Swap-in
    point for torchaudio/ffmpeg is this one function; the batch shape,
    schema, and narrow-dependency plan are the production ones."""
    import io
    import math
    import wave as wave_mod

    import numpy as np
    import pandas as pd

    def dec(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            srs, ns, means, rmss = [], [], [], []
            for p in pdf[payload_col]:
                with wave_mod.open(io.BytesIO(bytes(p)), "rb") as w:
                    sr = w.getframerate()
                    nf = w.getnframes()
                    raw = w.readframes(nf)
                s = np.frombuffer(raw, dtype="<i2").astype(np.float64)
                srs.append(sr)
                ns.append(len(s))
                means.append(float(s.mean()) if len(s) else 0.0)
                rmss.append(math.sqrt(float((s * s).mean())) if len(s) else 0.0)
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "sample_rate": srs,
                    "n_samples": ns,
                    "mean_amp": means,
                    "rms_amp": rmss,
                }
            )

    return media.mapInPandas(
        dec,
        "media_id long, sample_rate int, n_samples long, "
        "mean_amp double, rms_amp double",
    )


def synth_ppm_media(
    docs: DataFrame, id_col: str = "doc_id"
) -> DataFrame:
    """(media_id, payload) — a REAL binary PPM (P6) image per document:
    ``P6\\n{w} {h}\\n255\\n`` header + w*h*3 raw pixel bytes.
    Deterministic: w = doc_id%4+2, h = doc_id%3+2, byte j =
    (doc_id*7 + j) % 256 — closed-form for the oracle."""
    import numpy as np
    import pandas as pd

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = []
            for did in pdf[id_col]:
                did = int(did)
                w, h = did % 4 + 2, did % 3 + 2
                j = np.arange(w * h * 3, dtype=np.int64)
                pix = ((did * 7 + j) % 256).astype(np.uint8).tobytes()
                payloads.append(f"P6\n{w} {h}\n255\n".encode("ascii") + pix)
            yield pd.DataFrame({"media_id": pdf[id_col], "payload": payloads})

    return docs.select(id_col).mapInPandas(gen, "media_id long, payload binary")


_PPM_WS = b" \t\r\n\x0b\x0c"


def _parse_p6_header(p: bytes) -> tuple[int, int, int, int]:
    """Spec-compliant binary-PPM (P6) header tokenizer: the magic plus
    three decimal tokens (width, height, maxval) separated by arbitrary
    whitespace, with ``#``-to-end-of-line comments allowed wherever
    whitespace is (the Netpbm grammar — ADVICE r6: the previous parser
    accepted only the exact ``P6\\n{w} {h}\\n255\\n`` dialect this
    module's encoder writes, rejecting spec-valid files from other
    producers). The pixel plane starts after EXACTLY ONE whitespace
    byte following maxval, per spec. Returns (w, h, maxval, offset)."""
    if p[:2] != b"P6":
        raise ValueError("not a binary PPM (P6) payload")
    i, n, vals = 2, len(p), []
    while len(vals) < 3:
        while i < n:  # skip whitespace and comments
            c = p[i : i + 1]
            if c in _PPM_WS:
                i += 1
            elif c == b"#":
                j = p.find(b"\n", i)
                i = n if j < 0 else j + 1
            else:
                break
        j = i
        while j < n and p[j : j + 1].isdigit():
            j += 1
        if j == i:
            raise ValueError("truncated PPM header")
        vals.append(int(p[i:j]))
        i = j
    if i >= n or p[i : i + 1] not in _PPM_WS:
        raise ValueError("truncated PPM header")
    return vals[0], vals[1], vals[2], i + 1


def ppm_features(media: DataFrame, payload_col: str = "payload") -> DataFrame:
    """REAL image decode: parse the PPM header (spec-grammar tokenizer
    ``_parse_p6_header`` — comments and arbitrary whitespace accepted;
    malformed bytes raise) and the raw pixel plane, returning
    (media_id, width, height, mean_r, mean_g, mean_b). This is an
    actual bytes-on-the-wire image parse, not a hash stand-in; a
    JPEG/PNG decoder slots into the same function."""
    import numpy as np
    import pandas as pd

    def parse(p: bytes) -> tuple[int, int, float, float, float]:
        w, h, maxval, off = _parse_p6_header(p)
        if maxval != 255:
            raise ValueError("only maxval 255 supported")
        pix = np.frombuffer(p, dtype=np.uint8, count=w * h * 3, offset=off)
        rgb = pix.reshape(-1, 3).astype(np.float64)
        return w, h, float(rgb[:, 0].mean()), float(rgb[:, 1].mean()), float(rgb[:, 2].mean())

    def dec(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = [parse(bytes(p)) for p in pdf[payload_col]]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "width": [r[0] for r in rows],
                    "height": [r[1] for r in rows],
                    "mean_r": [r[2] for r in rows],
                    "mean_g": [r[3] for r in rows],
                    "mean_b": [r[4] for r in rows],
                }
            )

    return media.mapInPandas(
        dec,
        "media_id long, width int, height int, "
        "mean_r double, mean_g double, mean_b double",
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


def ppm_resize(
    media: DataFrame,
    out_w: int,
    out_h: int,
    payload_col: str = "payload",
) -> DataFrame:
    """REAL decode -> transform -> re-encode: nearest-neighbor resize
    of binary PPM (P6) payloads to (out_w, out_h), returning
    (media_id, payload) with valid PPM bytes — the full multimodal
    pipeline shape (parse container, transform pixel plane, re-emit
    container) with no native libs. Arrow-batched; source index for
    output pixel (x, y) is (x * w_in) // out_w, (y * h_in) // out_h —
    the standard floor-scaled nearest-neighbor map, exactly
    reproducible for tests."""
    import numpy as np
    import pandas as pd

    header = f"P6\n{out_w} {out_h}\n255\n".encode("ascii")

    def one(p: bytes) -> bytes:
        w, h, maxval, off = _parse_p6_header(p)
        if maxval != 255:
            # same contract as ppm_features: silently re-labelling a
            # 16-bit pixel plane under a 255 header would emit a
            # structurally valid but pixel-garbage image
            raise ValueError("only maxval 255 supported")
        pix = np.frombuffer(p, dtype=np.uint8, count=w * h * 3, offset=off)
        img = pix.reshape(h, w, 3)
        ys = (np.arange(out_h) * h) // out_h
        xs = (np.arange(out_w) * w) // out_w
        return header + img[np.ix_(ys, xs)].tobytes()

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "payload": [one(bytes(p)) for p in pdf[payload_col]],
                }
            )

    return media.mapInPandas(run, "media_id long, payload binary")
