"""Property-based checks for the round-7 retrieval/curation
arithmetic: Spark expressions equal pure-Python references on
adversarial inputs (zeros, negatives, word repeats).

One Spark job per example batch, matching tests/test_properties.py."""

from __future__ import annotations

import hashlib

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from lightweight_vector_database_spark.operators.retrieval import (
    binary_quantize,
    hamming_distance,
)
from lightweight_vector_database_spark.operators.substring_dedup import (
    token_window_hashes,
)

DIM = 16

vec = st.lists(
    st.floats(
        min_value=-10,
        max_value=10,
        allow_nan=False,
        allow_infinity=False,
        width=32,
    ),
    min_size=DIM,
    max_size=DIM,
)

words = st.lists(
    st.sampled_from(["a", "bb", "ccc", "dd", "e"]), min_size=1, max_size=12
)


def _pack_py(v: list[float], lo: int, hi: int) -> int:
    return sum(1 << (i - lo) for i in range(lo, hi + 1) if v[i - 1] > 0)


@settings(max_examples=10, deadline=None)
@given(vs=st.lists(vec, min_size=1, max_size=8))
def test_pack_sign_bits_matches_python(spark, vs):
    df = spark.createDataFrame(
        [(i, v) for i, v in enumerate(vs)],
        "vec_id long, embedding array<float>",
    )
    got = {
        r["vec_id"]: (r["w0"], r["w1"])
        for r in binary_quantize(df, dim=DIM).collect()
    }
    for i, v in enumerate(vs):
        # packing sees the FLOAT32 value; >0 is sign-exact across widths
        assert got[i] == (
            _pack_py(v, 1, DIM // 2),
            _pack_py(v, DIM // 2 + 1, DIM),
        )


@settings(max_examples=10, deadline=None)
@given(
    pairs=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=(1 << 32) - 1),
            st.integers(min_value=0, max_value=(1 << 32) - 1),
        ),
        min_size=1,
        max_size=8,
    ),
    p0=st.integers(min_value=0, max_value=(1 << 32) - 1),
    p1=st.integers(min_value=0, max_value=(1 << 32) - 1),
)
def test_hamming_distance_matches_popcount(spark, pairs, p0, p1):
    df = spark.createDataFrame(
        [(i, a, b) for i, (a, b) in enumerate(pairs)],
        "i long, w0 long, w1 long",
    )
    got = {
        r["i"]: r["h"]
        for r in df.withColumn(
            "h", hamming_distance("w0", "w1", p0, p1)
        ).collect()
    }
    for i, (a, b) in enumerate(pairs):
        assert got[i] == bin(a ^ p0).count("1") + bin(b ^ p1).count("1")


@settings(max_examples=10, deadline=None)
@given(docs=st.lists(words, min_size=1, max_size=5), w=st.integers(2, 4))
def test_window_hashes_match_python_md5(spark, docs, w):
    df = spark.createDataFrame(
        [(i, " ".join(toks)) for i, toks in enumerate(docs)],
        "doc_id long, text string",
    )
    got = {
        (r["doc_id"], r["pos"]): r["whash"]
        for r in token_window_hashes(df, w).collect()
    }
    want = {}
    for i, toks in enumerate(docs):
        for p in range(len(toks) - w + 1):
            s = " ".join(toks[p : p + w])
            want[(i, p + 1)] = hashlib.md5(s.encode()).hexdigest()
    assert got == want


@settings(max_examples=8, deadline=None)
@given(vs=st.lists(vec, min_size=2, max_size=6))
def test_hamming_symmetric_and_bounded(spark, vs):
    """Hamming between any row and a probe packed from the same rule is
    0 for the row itself and <= DIM always."""
    df = binary_quantize(
        spark.createDataFrame(
            [(i, v) for i, v in enumerate(vs)],
            "vec_id long, embedding array<float>",
        ),
        dim=DIM,
    )
    first = df.orderBy("vec_id").first()
    out = df.withColumn(
        "h", hamming_distance("w0", "w1", first["w0"], first["w1"])
    ).collect()
    by_id = {r["vec_id"]: r["h"] for r in out}
    assert by_id[0] == 0
    assert all(0 <= h <= DIM for h in by_id.values())
