"""Multimodal plumbing: schema, determinism across runs, frame
explosion arithmetic, and the decode stub gate."""

from __future__ import annotations

import pytest

from lightweight_vector_database_spark.operators import multimodal as M
from lightweight_vector_database_spark.sources import load_table


@pytest.fixture(scope="module")
def media(spark, sf_dir):
    return M.attach_fake_media(load_table(spark, sf_dir, "documents")).cache()


def test_media_schema_and_modalities(media):
    assert dict(media.dtypes)["payload"] == "binary"
    types = {r.media_type for r in media.select("media_type").distinct().collect()}
    assert types == {"image", "audio", "video"}


def test_feature_extraction_deterministic(media):
    f1 = {r.media_id: r.features for r in M.extract_features(media).collect()}
    f2 = {r.media_id: r.features for r in M.extract_features(media.repartition(7)).collect()}
    assert f1 == f2  # same features regardless of partitioning
    assert all(len(v) == M.FEATURE_DIM for v in f1.values())
    assert all(0.0 <= x < 1.0 for v in f1.values() for x in v)


def test_frame_sample_counts(media):
    frames = M.frame_sample(media, every_n=2).collect()
    videos = {r.media_id: r.n_frames for r in media.filter("media_type = 'video'").collect()}
    got: dict[int, int] = {}
    for r in frames:
        got[r.media_id] = got.get(r.media_id, 0) + 1
    assert set(got) == set(videos)
    for mid, nf in videos.items():
        assert got[mid] == (nf + 1) // 2  # frames 0, 2, 4, ...


def test_decode_stub_gate():
    with pytest.raises(NotImplementedError, match="PIL"):
        M.decode_image(b"\xff\xd8\xff")  # PIL absent in this container


def test_resize_meta(media):
    out = M.resize_meta(media, 32, 32).select("width", "height").distinct().collect()
    assert [(r.width, r.height) for r in out] == [(32, 32)]


def test_frame_sample_parity_with_python_slices(media):
    # byte-exact parity: the Catalyst sequence/explode/substring plan
    # must reproduce the per-row Python slicing it replaced
    every_n = 2
    expected = []
    for r in media.filter("media_type = 'video'").collect():
        payload = bytes(r.payload)
        chunk = max(1, len(payload) // max(1, int(r.n_frames)))
        for fi in range(0, int(r.n_frames), every_n):
            expected.append(
                (r.media_id, fi, payload[fi * chunk : (fi + 1) * chunk])
            )
    got = [
        (r.media_id, r.frame_idx, bytes(r.frame_payload))
        for r in M.frame_sample(media, every_n=every_n).collect()
    ]
    assert sorted(got) == sorted(expected)


def test_frame_sample_stays_jvm_side(media):
    # the plan must contain no Python evaluation (scale guard: this
    # operator runs over the video table at 100 TB)
    plan = M.frame_sample(media)._jdf.queryExecution().executedPlan().toString()
    assert "Python" not in plan and "ArrowEval" not in plan


# --- real codecs (WAV via stdlib wave, PPM by hand) -------------------------


def test_wav_payload_is_real_riff_and_decodes(spark):
    import io
    import wave as wave_mod

    from lightweight_vector_database_spark.operators.multimodal import (
        synth_wav_media,
        wav_features,
    )

    docs = spark.createDataFrame(
        [(7, "x" * 23), (12, "y" * 130)], "doc_id long, text string"
    )
    media = synth_wav_media(docs)
    rows = {r.media_id: bytes(r.payload) for r in media.collect()}
    # the payload is an actual RIFF/WAVE container, parseable by the
    # stdlib codec outside Spark
    assert rows[7][:4] == b"RIFF" and rows[7][8:12] == b"WAVE"
    with wave_mod.open(io.BytesIO(rows[7]), "rb") as w:
        assert (w.getnchannels(), w.getsampwidth(), w.getframerate()) == (1, 2, 16000)
        assert w.getnframes() == 23 % 100 + 50
    feats = {r.media_id: r for r in wav_features(media).collect()}
    # doc 12: n = 130 % 100 + 50 = 80 samples, closed-form mean
    n = 80
    samples = [((12 * 31 + i * 7) % 256 - 128) * 256 for i in range(n)]
    assert feats[12].n_samples == n
    assert feats[12].mean_amp == sum(samples) / n
    assert feats[12].rms_amp == (sum(x * x for x in samples) / n) ** 0.5


def test_wav_decode_rejects_corrupt_payload(spark):
    from lightweight_vector_database_spark.operators.multimodal import wav_features

    bad = spark.createDataFrame(
        [(1, bytearray(b"not a wav at all"))], "media_id long, payload binary"
    )
    with pytest.raises(Exception, match="(?i)riff|wave|not"):
        wav_features(bad).collect()


def test_ppm_roundtrip_and_header_validation(spark):
    from lightweight_vector_database_spark.operators.multimodal import (
        ppm_features,
        synth_ppm_media,
    )

    docs = spark.createDataFrame([(5,), (10,)], "doc_id long")
    media = synth_ppm_media(docs)
    raw = {r.media_id: bytes(r.payload) for r in media.collect()}
    # doc 5: w = 5%4+2 = 3, h = 5%3+2 = 4 -> header + 36 pixel bytes
    assert raw[5].startswith(b"P6\n3 4\n255\n")
    assert len(raw[5]) == len(b"P6\n3 4\n255\n") + 3 * 4 * 3
    feats = {r.media_id: r for r in ppm_features(media).collect()}
    assert (feats[5].width, feats[5].height) == (3, 4)
    reds = [(5 * 7 + 3 * k) % 256 for k in range(12)]
    assert feats[5].mean_r == sum(reds) / 12
    # corrupt magic raises
    bad = spark.createDataFrame(
        [(1, bytearray(b"P5\n2 2\n255\n" + b"\0" * 4))],
        "media_id long, payload binary",
    )
    with pytest.raises(Exception, match="P6"):
        ppm_features(bad).collect()


def test_ppm_resize_pixel_exact(spark):
    """Resize output equals the closed-form nearest-neighbor map of
    the synthesized pixels, byte for byte, and re-decodes through
    ppm_features with the resized dimensions."""
    from lightweight_vector_database_spark.operators.multimodal import (
        ppm_features,
        ppm_resize,
        synth_ppm_media,
    )

    docs = spark.range(12).selectExpr("id AS doc_id")
    media = synth_ppm_media(docs)
    out = ppm_resize(media, 3, 2)
    got = {r.media_id: bytes(r.payload) for r in out.collect()}

    for did in range(12):
        w, h = did % 4 + 2, did % 3 + 2
        pix = [(did * 7 + j) % 256 for j in range(w * h * 3)]
        expect = bytearray(f"P6\n3 2\n255\n".encode())
        for y in range(2):
            sy = (y * h) // 2
            for x in range(3):
                sx = (x * w) // 3
                base = (sy * w + sx) * 3
                expect += bytes(pix[base:base + 3])
        assert got[did] == bytes(expect), did

    feats = {r.media_id: (r.width, r.height) for r in ppm_features(out).collect()}
    assert all(v == (3, 2) for v in feats.values())


def test_ppm_resize_rejects_bad_headers(spark):
    from lightweight_vector_database_spark.operators.multimodal import (
        ppm_resize,
    )

    bad = spark.createDataFrame(
        [(1, b"P6\n2 2\n65535\n" + bytes(24))], "media_id long, payload binary"
    )
    with pytest.raises(Exception, match="maxval 255"):
        ppm_resize(bad, 1, 1).collect()
    trunc = spark.createDataFrame(
        [(1, b"P6\n2 2\n255")], "media_id long, payload binary"
    )
    with pytest.raises(Exception, match="truncated"):
        ppm_resize(trunc, 1, 1).collect()


def test_ppm_header_grammar_accepts_comments_and_whitespace(spark):
    """ADVICE r6: spec-valid P6 files with comment lines / arbitrary
    whitespace must parse; malformed headers must still raise."""
    import numpy as np

    from lightweight_vector_database_spark.operators.multimodal import (
        _parse_p6_header,
        ppm_features,
        ppm_resize,
    )

    pix = bytes(np.arange(2 * 3 * 3, dtype=np.uint8))  # 2x3 image
    exotic = b"P6 # a comment\n# another line\n 3\t2 # dims done\n255 " + pix
    w, h, maxval, off = _parse_p6_header(exotic)
    assert (w, h, maxval) == (3, 2, 255)
    assert exotic[off:] == pix

    df = spark.createDataFrame(
        [(1, bytearray(exotic))], "media_id long, payload binary"
    )
    feat = ppm_features(df).collect()[0]
    assert (feat.width, feat.height) == (3, 2)
    out = bytes(ppm_resize(df, 2, 2).collect()[0].payload)
    assert out.startswith(b"P6\n2 2\n255\n") and len(out) == 11 + 2 * 2 * 3

    import pytest as _pytest

    for bad in (b"P5\n3 2\n255\n" + pix, b"P6\n3 2\n", b"P6 # only comment"):
        with _pytest.raises(ValueError):
            _parse_p6_header(bad)
