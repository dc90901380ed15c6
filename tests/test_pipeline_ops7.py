"""Round-7 pipeline ops, seventh batch: SQ8 ANN, recall evaluation,
keyness."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from lightweight_vector_database_spark.operators.knn import knn
from lightweight_vector_database_spark.operators.retrieval import (
    sq8_rerank,
    sq8_train,
)


@pytest.fixture(scope="module")
def emb(spark):
    from lightweight_vector_database_spark.sources import load_table

    return load_table(spark, "/root/testdata/sf0.001", "embeddings")


def test_sq8_train_ranges_cover_data(spark, emb):
    lo, hi = sq8_train(emb, dim=64)
    assert len(lo) == len(hi) == 64
    assert all(h > l for l, h in zip(lo, hi))
    mins = emb.agg(
        F.min(F.element_at(F.col("embedding"), 1).cast("double"))
    ).collect()[0][0]
    assert lo[0] == mins


def test_sq8_rerank_exact_when_candidates_cover_all(spark, emb):
    n = emb.count()
    lo, hi = sq8_train(emb, dim=64)
    probe = [((i * 29) % 17 - 8) / 9.0 for i in range(64)]
    got = [
        (r["vec_id"], round(r["dist"], 6))
        for r in sq8_rerank(emb, probe, 5, n, lo, hi).collect()
    ]
    want = [
        (r["vec_id"], round(r["dist"], 6))
        for r in knn(emb, probe, 5, metric="euclidean_sq").collect()
    ]
    assert got == want


def test_sq8_approx_error_is_bounded_by_quantization_step(spark, emb):
    """|adist - dist| per dim is at most (step/2 + |recon bias|)^2-ish;
    assert the loose end-to-end envelope: adist within sum of
    per-dim (range/256)^2 + 2*range/256*|x-p| terms. A simpler robust
    check: the approximate top-50 contains most of the exact top-10."""
    n = emb.count()
    lo, hi = sq8_train(emb, dim=64)
    probe = [((i * 3) % 11 - 5) / 6.0 for i in range(64)]
    got = {
        r["vec_id"] for r in sq8_rerank(emb, probe, 10, n // 5, lo, hi).collect()
    }
    want = {
        r["vec_id"] for r in knn(emb, probe, 10, metric="euclidean_sq").collect()
    }
    # int8 quantization at 256 levels is near-lossless for ranking
    assert len(got & want) >= 8


def test_sq8_validates_ranges(spark, emb):
    with pytest.raises(ValueError):
        sq8_rerank(emb, [0.0] * 64, 5, 10, [0.0] * 64, [0.0] * 64)
    with pytest.raises(ValueError):
        sq8_rerank(emb, [0.0] * 64, 5, 10, [0.0] * 63, [1.0] * 64)


def test_keyness_surfaces_planted_distinctive_term(spark):
    """A term occurring only in one language tops that language's
    keyness list."""
    from lightweight_vector_database_spark.suite.pipeline_suite7 import (
        _lang_keyness,
    )
    import os
    import tempfile

    docs = spark.createDataFrame(
        [
            (1, "apfel brot wurst", "de", "s", 17),
            (2, "apfel zug brot", "de", "s", 14),
            (3, "apple bread common", "en", "s", 19),
            (4, "apple cat common", "en", "s", 16),
        ],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    with tempfile.TemporaryDirectory() as d:
        docs.write.parquet(os.path.join(d, "documents.parquet"))
        out = _lang_keyness(spark, d).collect()
    by_lang = {}
    for r in out:
        by_lang.setdefault(r["lang"], []).append((r["keyness"], r["term"]))
    de_terms = {t for _, t in by_lang["de"]}
    en_terms = {t for _, t in by_lang["en"]}
    assert "apfel" in de_terms and "apfel" not in en_terms
    assert "apple" in en_terms and "apple" not in de_terms
    # every keyness score for a lang-exclusive term is positive
    assert max(by_lang["de"])[0] > 0
