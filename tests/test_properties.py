"""Property-based checks (hypothesis): metric expressions equal numpy
on adversarial vectors (zeros, duplicates, extremes), and text
fingerprints are content-functional (equal text <-> equal hash).

One Spark job per example batch, not per example — hypothesis
generates the batch, Spark evaluates it vectorized."""

from __future__ import annotations

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from lightweight_vector_database_spark.functions import distance as dist

DIM = 8

vec = st.lists(
    st.floats(
        min_value=-100,
        max_value=100,
        allow_nan=False,
        allow_infinity=False,
        width=32,
    ),
    min_size=DIM,
    max_size=DIM,
)


@pytest.fixture(scope="module")
def sql(spark):
    return spark


@settings(max_examples=10, deadline=None)
@given(vs=st.lists(vec, min_size=1, max_size=8), probe=vec)
def test_metric_expressions_match_numpy(sql, vs, probe):
    df = sql.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in enumerate(vs)],
        "vec_id long, embedding array<float>",
    )
    out = df.select(
        "vec_id",
        dist.euclidean_sq("embedding", probe).alias("e"),
        dist.manhattan("embedding", probe).alias("m"),
        dist.chebyshev("embedding", probe).alias("c"),
    ).collect()
    p = np.asarray(probe, dtype=np.float64)
    for r in out:
        v = np.asarray(vs[r.vec_id], dtype=np.float32).astype(np.float64)
        np.testing.assert_allclose(r.e, ((v - p) ** 2).sum(), rtol=1e-5, atol=1e-8)
        np.testing.assert_allclose(r.m, np.abs(v - p).sum(), rtol=1e-5, atol=1e-8)
        np.testing.assert_allclose(r.c, np.abs(v - p).max(), rtol=1e-5, atol=1e-8)


@settings(max_examples=10, deadline=None)
@given(
    texts=st.lists(
        st.text(alphabet="abc d", min_size=1, max_size=30), min_size=2, max_size=6
    )
)
def test_fingerprints_are_content_functional(sql, texts):
    from lightweight_vector_database_spark.functions.text import (
        content_sha256,
        norm_text,
        rolling_hash,
    )

    df = sql.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    rows = df.select(
        "doc_id",
        norm_text("text").alias("norm"),
        content_sha256("text").alias("sha"),
        rolling_hash("text").alias("roll"),
    ).collect()
    by_norm: dict[str, tuple] = {}
    for r in rows:
        key = (r.sha,)
        if r.norm in by_norm:
            assert by_norm[r.norm][0] == r.sha  # same normalized text -> same hash
        else:
            by_norm[r.norm] = key
    # distinct normalized texts -> distinct sha (collision ~impossible)
    shas = [v[0] for v in by_norm.values()]
    assert len(set(shas)) == len(shas)


@settings(max_examples=8, deadline=None)
@given(
    xs=st.lists(
        st.integers(min_value=0, max_value=999), min_size=2, max_size=12, unique=True
    ),
    y=st.integers(min_value=0, max_value=999),
)
def test_zorder_monotonic_per_axis(sql, xs, y):
    # with the other coordinate fixed, the Morton key must order rows
    # exactly like the raw coordinate (bit interleaving preserves
    # per-axis order) — this is what makes min/max file stats usable
    # for range predicates on each interleaved dimension
    from lightweight_vector_database_spark.functions.zorder import zorder_key

    df = sql.createDataFrame([(x, y) for x in xs], "x long, y long")
    key = zorder_key(["x", "y"], [(0, 1000), (0, 1000)], bits=10)
    rows = df.select("x", key.alias("zk")).collect()
    by_x = sorted(rows, key=lambda r: r.x)
    by_zk = sorted(rows, key=lambda r: r.zk)
    assert [r.x for r in by_x] == [r.x for r in by_zk]
    # keys stay in the n*bits-bit range
    assert all(0 <= r.zk < (1 << 20) for r in rows)


@settings(max_examples=8, deadline=None)
@given(
    pts=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=999),
            st.integers(min_value=0, max_value=999),
        ),
        min_size=1,
        max_size=12,
    )
)
def test_zorder_matches_numpy_interleave(sql, pts):
    from lightweight_vector_database_spark.functions.zorder import zorder_key

    def morton(x: int, y: int, bits: int = 10) -> int:
        qx = min(max(int(x / 1000 * (1 << bits)), 0), (1 << bits) - 1)
        qy = min(max(int(y / 1000 * (1 << bits)), 0), (1 << bits) - 1)
        out = 0
        for b in range(bits):
            out |= ((qx >> b) & 1) << (2 * b)
            out |= ((qy >> b) & 1) << (2 * b + 1)
        return out

    df = sql.createDataFrame(pts, "x long, y long")
    key = zorder_key(["x", "y"], [(0, 1000), (0, 1000)], bits=10)
    got = {(r.x, r.y): r.zk for r in df.select("x", "y", key.alias("zk")).collect()}
    for (x, y), zk in got.items():
        assert zk == morton(x, y)


item_txt = st.text(
    alphabet=st.characters(whitelist_categories=("Ll", "Lu", "Nd")),
    min_size=1,
    max_size=12,
)


@settings(max_examples=8, deadline=None)
@given(
    members=st.lists(item_txt, min_size=1, max_size=30, unique=True),
    others=st.lists(item_txt, min_size=1, max_size=30, unique=True),
)
def test_bloom_membership_no_false_negatives(sql, members, others):
    """One-sided error is a hard invariant: a Bloom filter may
    overcount, it must NEVER miss a true member — for any member set."""
    from lightweight_vector_database_spark.operators import sketches as SK

    mdf = sql.createDataFrame([(m,) for m in members], "item string")
    words = SK.bloom_build(mdf, "item")
    probes = sql.createDataFrame(
        [(x,) for x in set(members) | set(others)], "item string"
    )
    hits = {
        r.item: r.bloom_hit
        for r in SK.bloom_probe(probes, "item", words).collect()
    }
    assert all(hits[m] for m in members)


@settings(max_examples=8, deadline=None)
@given(stream=st.lists(item_txt, min_size=1, max_size=60))
def test_cms_never_underestimates_vs_counter(sql, stream):
    """Count-min point estimates dominate the true multiplicity for
    any input multiset (min over rows of summed cells >= true count)."""
    from collections import Counter

    from lightweight_vector_database_spark.operators import sketches as SK

    df = sql.createDataFrame([(x,) for x in stream], "item string")
    cells = SK.cms_build_stream(df, "item")
    items = sql.createDataFrame([(x,) for x in set(stream)], "item string")
    est = {
        r.item: r.cms_n for r in SK.cms_estimate(items, "item", cells).collect()
    }
    for k, n in Counter(stream).items():
        assert est[k] >= n


# --- bucket-cap invariants (model-based) ------------------------------------

sig4 = st.lists(st.integers(min_value=0, max_value=3), min_size=4, max_size=4)


@settings(max_examples=8, deadline=None)
@given(sigs=st.lists(sig4, min_size=2, max_size=12), cap=st.integers(2, 4))
def test_lsh_cap_matches_reference_model(sql, sigs, cap):
    """Against a pure-Python model of banded LSH with bucket caps:
    drop emits a pair iff SOME shared bucket is under the cap; star
    additionally emits pairs whose smaller id is a shared bucket's
    min. Tiny value domain (0..3) forces heavy bucket collisions."""
    from lightweight_vector_database_spark.operators.dedup import (
        lsh_candidate_pairs,
    )

    bands = 2
    rpb = 4 // bands
    rows = [(i, [int(x) for x in s]) for i, s in enumerate(sigs)]
    df = sql.createDataFrame(rows, "id long, signature array<bigint>")

    buckets: dict[tuple, list[int]] = {}
    for i, s in enumerate(sigs):
        for b in range(bands):
            buckets.setdefault((b, tuple(s[b * rpb : (b + 1) * rpb])), []).append(i)

    def expected(mode):
        out = set()
        for members in buckets.values():
            if len(members) <= cap:
                out |= {(a, b) for a in members for b in members if a < b}
            elif mode == "star":
                m = min(members)
                out |= {(m, x) for x in members if x != m}
        return out

    for mode in ("drop", "star"):
        got = {
            (r.id1, r.id2)
            for r in lsh_candidate_pairs(
                df, bands=bands, sig_len=4, max_bucket=cap, oversize=mode
            ).collect()
        }
        assert got == expected(mode), mode


def test_bm25_matches_reference_formula(spark, sf_dir):
    """bm25_top_docs vs a direct Python Okapi BM25 computation on the
    same corpus (same micro-unit quantization)."""
    import math

    from lightweight_vector_database_spark.sources import load_table
    from lightweight_vector_database_spark.suite.text_suite import (
        _BM25_TERMS,
        _bm25,
    )

    rows = load_table(spark, sf_dir, "documents").select("doc_id", "text").collect()
    toks = {r.doc_id: r.text.split(" ") for r in rows}
    n_docs = len(toks)
    avgdl = sum(len(t) for t in toks.values()) / n_docs
    df = {
        q: sum(1 for t in toks.values() if q in t) for q in _BM25_TERMS
    }
    expect = {}
    for d, t in toks.items():
        cu = 0
        n_terms = 0
        for q in _BM25_TERMS:
            tf = t.count(q)
            if not tf:
                continue
            n_terms += 1
            idf = math.log(1.0 + (n_docs - df[q] + 0.5) / (df[q] + 0.5))
            cu += math.floor(
                idf * (tf * 2.2) / (tf + 1.2 * (0.25 + 0.75 * len(t) / avgdl)) * 1e6
            )
        if n_terms:
            expect[d] = (n_terms, cu / 1e6)
    top = sorted(expect.items(), key=lambda kv: (-kv[1][1], kv[0]))[:20]

    got = [(r.doc_id, (r.n_terms, r.bm25)) for r in _bm25(spark, sf_dir).collect()]
    assert got == top


@settings(max_examples=200, deadline=None)
@given(
    st.integers(2, 8),
    st.data(),
)
def test_zbox_ranges_superset_property(bits, data):
    """For ANY box and ANY max_ranges, zbox_ranges covers every box
    cell (the pruning-safety invariant), and with unlimited ranges it
    covers NOTHING else (exactness). Pure driver-side — no Spark."""
    from lightweight_vector_database_spark.sources.layout import zbox_ranges

    hi_max = (1 << bits) - 1
    lo = [data.draw(st.integers(0, hi_max)) for _ in range(2)]
    hi = [data.draw(st.integers(lo[d], hi_max)) for d in range(2)]
    max_ranges = data.draw(st.integers(1, 64))
    ranges = zbox_ranges(lo, hi, bits, max_ranges=max_ranges)
    assert len(ranges) <= max_ranges
    assert all(a <= b for a, b in ranges)
    assert all(b < a2 for (_, b), (a2, _) in zip(ranges, ranges[1:]))

    def interleave(a, b):
        z = 0
        for i in range(bits):
            z |= ((a >> i) & 1) << (2 * i)
            z |= ((b >> i) & 1) << (2 * i + 1)
        return z

    # superset: sample cells inside the box
    import random

    rng = random.Random(bits * 1000003 + lo[0])
    for _ in range(30):
        a = rng.randint(lo[0], hi[0])
        b = rng.randint(lo[1], hi[1])
        z = interleave(a, b)
        assert any(x <= z <= y for x, y in ranges)

    # exactness when uncapped: sample cells OUTSIDE the box
    exact = zbox_ranges(lo, hi, bits, max_ranges=1 << 30)
    for _ in range(30):
        a = rng.randint(0, hi_max)
        b = rng.randint(0, hi_max)
        if lo[0] <= a <= hi[0] and lo[1] <= b <= hi[1]:
            continue
        z = interleave(a, b)
        assert not any(x <= z <= y for x, y in exact)


_word = st.text(alphabet="abcdefgh", min_size=1, max_size=4)


@settings(max_examples=10, deadline=None)
@given(
    pre1=st.lists(_word, min_size=0, max_size=8),
    pre2=st.lists(_word, min_size=0, max_size=8),
    run=st.lists(_word, min_size=6, max_size=12),  # >= w + k - 1 = 6
    suf1=st.lists(_word, min_size=0, max_size=8),
    suf2=st.lists(_word, min_size=0, max_size=8),
)
def test_winnow_guarantee_property(sql, pre1, pre2, run, suf1, suf2):
    """Hypothesis form of the winnowing guarantee: ANY two documents
    sharing a >= w+k-1 token run share a fingerprint, whatever
    surrounds the run."""
    from lightweight_vector_database_spark.functions.text import (
        winnow_fingerprints,
    )

    d1 = " ".join(pre1 + run + suf1)
    d2 = " ".join(pre2 + run + suf2)
    df = sql.createDataFrame([(1, d1), (2, d2)], "doc_id long, text string")
    out = {
        r.doc_id: set(r.fps)
        for r in df.select(
            "doc_id", winnow_fingerprints("text").alias("fps")
        ).collect()
    }
    assert out[1] & out[2]
