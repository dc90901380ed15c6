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
