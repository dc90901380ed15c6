"""Round-7 pipeline ops, fourth batch: hybrid RRF retrieval,
substring-span dedup, binary-quantized ANN, boolean search, corpus
overlap."""

from __future__ import annotations

import hashlib

import numpy as np
import pytest
from pyspark.sql import functions as F

from lightweight_vector_database_spark.operators.knn import knn
from lightweight_vector_database_spark.operators.overlap import (
    group_minhash_signatures,
    pairwise_group_overlap,
)
from lightweight_vector_database_spark.operators.retrieval import (
    binary_quantize,
    bm25_scores,
    boolean_all_terms,
    hamming_rerank,
    rrf_fuse,
)
from lightweight_vector_database_spark.operators.substring_dedup import (
    duplicate_window_stats,
    token_window_hashes,
)


# --- RRF fusion ---------------------------------------------------------------


def _ranked(spark, rows):
    return spark.createDataFrame(rows, "id long, rank long")


def test_rrf_fuse_scores_and_missing_legs(spark):
    a = _ranked(spark, [(1, 1), (2, 2)])
    b = _ranked(spark, [(2, 1), (3, 2)])
    out = {
        r["id"]: (r["rank_a"], r["rank_b"], r["rrf"])
        for r in rrf_fuse({"a": a, "b": b}, k_const=60).collect()
    }
    assert out[1] == (1, None, pytest.approx(1 / 61))
    assert out[2] == (2, 1, pytest.approx(1 / 62 + 1 / 61))
    assert out[3] == (None, 2, pytest.approx(1 / 62))


def test_rrf_fuse_requires_legs(spark):
    with pytest.raises(ValueError):
        rrf_fuse({})


def test_bm25_prefers_term_dense_doc(spark):
    docs = spark.createDataFrame(
        [
            (1, "vector vector vector filler filler"),
            (2, "vector filler filler filler filler"),
            (3, "filler filler filler filler filler"),
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r["bm25"] for r in bm25_scores(docs, ["vector"]).collect()}
    assert set(out) == {1, 2}  # doc 3 matches no term
    assert out[1] > out[2] > 0


# --- boolean search -----------------------------------------------------------


def test_boolean_all_terms_conjunctive(spark):
    docs = spark.createDataFrame(
        [
            (1, "red green blue"),
            (2, "red green green"),  # no blue
            (3, "blue red green extra"),
            (4, "nothing here"),
        ],
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]
        for r in boolean_all_terms(docs, ["red", "green", "blue"]).collect()
    }
    assert got == {1, 3}
    # duplicate terms in the query collapse (still conjunctive over the set)
    got2 = {
        r["doc_id"]
        for r in boolean_all_terms(docs, ["red", "red", "green"]).collect()
    }
    assert got2 == {1, 2, 3}


# --- substring-window dedup -----------------------------------------------------


def test_token_window_hashes_positions_and_md5(spark):
    docs = spark.createDataFrame(
        [(1, "a b c d")], "doc_id long, text string"
    )
    rows = sorted(
        (r["pos"], r["whash"])
        for r in token_window_hashes(docs, 3).collect()
    )
    assert [p for p, _ in rows] == [1, 2]
    assert rows[0][1] == hashlib.md5(b"a b c").hexdigest()
    assert rows[1][1] == hashlib.md5(b"b c d").hexdigest()


def test_token_window_short_doc_emits_nothing(spark):
    docs = spark.createDataFrame([(1, "a b")], "doc_id long, text string")
    assert token_window_hashes(docs, 3).count() == 0


def test_duplicate_window_stats_cross_doc_only(spark):
    docs = spark.createDataFrame(
        [
            # docs 1 and 2 share the span "x y z"; doc 3 repeats its own
            # span internally but shares nothing cross-document.
            (1, "x y z a b"),
            (2, "q x y z r"),
            (3, "m n o m n o"),
        ],
        "doc_id long, text string",
    )
    out = {
        r["doc_id"]: (r["n_windows"], r["n_dup_windows"], r["dup_ratio"])
        for r in duplicate_window_stats(docs, 3).collect()
    }
    assert set(out) == {1, 2}  # doc 3's self-repeat is not cross-doc
    assert out[1] == (3, 1, pytest.approx(1 / 3, abs=1e-6))
    assert out[2] == (3, 1, pytest.approx(1 / 3, abs=1e-6))


def test_duplicate_window_same_doc_twice_counts_each_window(spark):
    # identical docs: every window duplicated, ratio 1.0
    docs = spark.createDataFrame(
        [(1, "a b c d"), (2, "a b c d")], "doc_id long, text string"
    )
    out = {
        r["doc_id"]: r["dup_ratio"]
        for r in duplicate_window_stats(docs, 2).collect()
    }
    assert out == {1: 1.0, 2: 1.0}


# --- binary quantization + Hamming re-rank ---------------------------------------


@pytest.fixture(scope="module")
def emb(spark):
    from lightweight_vector_database_spark.sources import load_table

    return load_table(spark, "/root/testdata/sf0.001", "embeddings")


def test_binary_quantize_packs_sign_bits(spark):
    vec = [1.0, -1.0, 0.0, 2.5] + [0.0] * 60
    df = spark.createDataFrame(
        [(1, vec)], "vec_id long, embedding array<float>"
    )
    row = binary_quantize(df).collect()[0]
    # bits 0 and 3 set (components 1 and 4 are > 0); zeros don't set bits
    assert row["w0"] == (1 << 0) | (1 << 3)
    assert row["w1"] == 0


def test_binary_quantize_word_boundary(spark):
    vec = [0.0] * 31 + [1.0, 1.0] + [0.0] * 30 + [1.0]
    df = spark.createDataFrame(
        [(1, vec)], "vec_id long, embedding array<float>"
    )
    row = binary_quantize(df).collect()[0]
    assert row["w0"] == 1 << 31  # component 32 -> highest w0 bit
    assert row["w1"] == (1 << 0) | (1 << 31)  # components 33 and 64


def test_hamming_rerank_exact_when_candidates_cover_all(spark, emb):
    """With candidates >= n the re-rank IS the exact kNN."""
    n = emb.count()
    probe = [((i * 37) % 19 - 9) / 7.0 for i in range(64)]
    got = [
        (r["vec_id"], round(r["dist"], 6))
        for r in hamming_rerank(emb, probe, 5, candidates=n).collect()
    ]
    want = [
        (r["vec_id"], round(r["dist"], 6))
        for r in knn(emb, probe, 5, metric="euclidean_sq").collect()
    ]
    assert got == want


def test_hamming_rerank_recall_reasonable(spark, emb):
    """The 1-bit cut at 20% candidate depth keeps most of the true
    top-10 (pinned lower bound so a packing regression is loud)."""
    n = emb.count()
    probe = [((i * 13) % 23 - 11) / 9.0 for i in range(64)]
    got = {r["vec_id"] for r in hamming_rerank(emb, probe, 10, candidates=n // 5).collect()}
    want = {r["vec_id"] for r in knn(emb, probe, 10, metric="euclidean_sq").collect()}
    assert len(got & want) >= 5


# --- corpus overlap ----------------------------------------------------------


def test_group_overlap_identical_and_disjoint(spark):
    text_a = "w1 w2 w3 w4 w5 w6 w7 w8"
    text_b = "z1 z2 z3 z4 z5 z6 z7 z8"
    docs = spark.createDataFrame(
        [
            ("s1", text_a),
            ("s2", text_a),   # identical corpus to s1
            ("s3", text_b),   # disjoint from both
        ],
        "source string, text string",
    )
    out = {
        (r["group_a"], r["group_b"]): r["est_jaccard"]
        for r in pairwise_group_overlap(docs, n_perms=8).collect()
    }
    assert out[("s1", "s2")] == 1.0
    assert out[("s1", "s3")] == 0.0
    assert out[("s2", "s3")] == 0.0


def test_group_overlap_estimate_tracks_exact(spark):
    """On a planted 50%-overlap pair the estimate lands within the
    minhash std-error envelope (here: +-3/sqrt(64) ~ 0.375 absolute,
    generous but regression-catching)."""
    common = " ".join(f"c{i}" for i in range(30))
    only_a = " ".join(f"a{i}" for i in range(30))
    only_b = " ".join(f"b{i}" for i in range(30))
    docs = spark.createDataFrame(
        [("sa", common), ("sa", only_a), ("sb", common), ("sb", only_b)],
        "source string, text string",
    )
    # exact Jaccard of distinct trigram sets: |common grams| /
    # (|common| + |a| + |b|) = 28 / (28 * 3)
    est = pairwise_group_overlap(docs, n_perms=64).collect()[0]["est_jaccard"]
    assert est == pytest.approx(1 / 3, abs=0.375)
    assert est > 0


def test_signatures_shape(spark):
    docs = spark.createDataFrame(
        [("s1", "a b c d e"), ("s2", "a b c x y")],
        "source string, text string",
    )
    sigs = group_minhash_signatures(docs, n_perms=4).collect()
    assert len(sigs) == 8  # 2 sources x 4 perms
    assert {r["p"] for r in sigs} == {0, 1, 2, 3}
