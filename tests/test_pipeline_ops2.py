"""Round-7 pipeline ops, second batch: quality audit, incremental
matview maintenance, bigram-LM scoring, PCA, stratified sampling."""

from __future__ import annotations

import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from lightweight_vector_database_spark.operators import quality_audit as qa
from lightweight_vector_database_spark.operators.incremental import (
    MaterializedAggregate,
)
from lightweight_vector_database_spark.operators.lm import bigram_lm_scores
from lightweight_vector_database_spark.operators.pca import (
    pca_project,
    train_pca_np,
)
from lightweight_vector_database_spark.operators.sampling import (
    stratified_sample,
)
from lightweight_vector_database_spark.sources.delta_snapshots import (
    DeltaSnapshotStore,
)


# --- quality audit ----------------------------------------------------------


@pytest.fixture()
def audit_df(spark):
    rows = [
        (1, "alice", 10.0, "click"),
        (2, "bob", -5.0, "view"),       # in_range violation
        (2, None, 50.0, "click"),       # duplicate id + null name
        (3, "Carol", 200.0, "ERROR"),   # range + accepted + regex violations
        (4, "dave", None, "view"),      # null value: not a range violation
    ]
    return spark.createDataFrame(
        rows, "id long, name string, value double, kind string"
    )


def test_audit_row_local_counts(spark, audit_df):
    rep = {
        r["constraint"]: r
        for r in qa.audit(
            audit_df,
            [
                qa.complete("name"),
                qa.unique("id"),
                qa.in_range("value", 0.0, 100.0),
                qa.accepted("kind", ["click", "view"]),
                qa.matches("kind", "^[a-z]+$"),
            ],
        ).collect()
    }
    assert all(r["total"] == 5 for r in rep.values())
    assert rep["complete(name)"]["violations"] == 1
    assert rep["unique(id)"]["violations"] == 1  # 5 rows - 4 distinct
    assert rep["in_range(value,0.0,100.0)"]["violations"] == 2
    assert rep["accepted(kind)"]["violations"] == 1
    assert rep["matches(kind)"]["violations"] == 1
    assert not rep["in_range(value,0.0,100.0)"]["passed"]


def test_audit_referential_and_pass_flag(spark, audit_df):
    dim = spark.createDataFrame([(1,), (2,), (3,)], "k long")
    rep = {
        r["constraint"]: r
        for r in qa.audit(
            audit_df,
            [
                qa.complete("id"),
                qa.references("id", dim, "k", "ref(id->dim)"),
            ],
        ).collect()
    }
    ref = rep["ref(id->dim)"]
    assert ref["total"] == 5 and ref["violations"] == 1  # id=4 orphan
    assert rep["complete(id)"]["passed"]


def test_audit_single_scan_plan(spark, audit_df):
    """All row-local constraints + total fold into ONE aggregation over
    one scan — the Deequ design point (no per-constraint jobs)."""
    rep = qa.audit(
        audit_df,
        [
            qa.complete("name"),
            qa.in_range("value", 0.0, 100.0),
            qa.accepted("kind", ["click", "view"]),
            qa.matches("kind", "^[a-z]+$"),
        ],
    )
    plan = rep._jdf.queryExecution().optimizedPlan().toString()
    assert plan.lower().count("logicalrdd") == 1  # the input appears once


# --- incremental materialized aggregate -------------------------------------


def _mat_fixture(spark, tmp_path):
    base = DeltaSnapshotStore(spark, str(tmp_path / "base"), id_col="rid")
    view = DeltaSnapshotStore(spark, str(tmp_path / "view"), id_col="g")
    mat = MaterializedAggregate(base, view, "g", ["v"])
    rows = spark.range(100).selectExpr(
        "id AS rid", "CAST(id % 7 AS LONG) AS g", "CAST(id AS DOUBLE) AS v"
    )
    return base, view, mat, rows


def _as_map(df):
    return {r["g"]: (r["n"], r["sum_v"]) for r in df.collect()}


def test_incremental_matches_full_recompute(spark, tmp_path):
    base, view, mat, rows = _mat_fixture(spark, tmp_path)
    k = F.col("rid")

    base.commit_full(rows.filter(k < 60))
    mat.refresh()
    assert mat.last_refresh_mode == "full"

    base.commit_append(rows.filter(k >= 60))
    mat.refresh()
    assert mat.last_refresh_mode == "incremental"
    base.commit_delete(rows.filter(k % 3 == 0).select("rid"))
    mat.refresh()
    assert mat.last_refresh_mode == "incremental"

    expected = _as_map(
        base.read().groupBy("g").agg(
            F.count(F.lit(1)).alias("n"), F.sum("v").alias("sum_v")
        )
    )
    got = _as_map(mat.read())
    assert set(got) == set(expected)
    for g in expected:
        assert got[g][0] == expected[g][0]
        assert got[g][1] == pytest.approx(expected[g][1], abs=1e-6)


def test_incremental_drops_zeroed_groups(spark, tmp_path):
    base, view, mat, rows = _mat_fixture(spark, tmp_path)
    base.commit_full(rows)
    mat.refresh()
    # delete EVERY row of group 3
    base.commit_delete(rows.filter(F.col("g") == 3).select("rid"))
    mat.refresh()
    assert mat.last_refresh_mode == "incremental"
    assert 3 not in _as_map(mat.read())
    # untouched groups still present and correct
    assert _as_map(mat.read())[0][0] == 15


def test_incremental_full_rebuild_across_rewrite(spark, tmp_path):
    """A compaction breaks the change feed (read_changes refuses);
    refresh must detect that and fall back to a full rebuild rather
    than corrupt the view."""
    base, view, mat, rows = _mat_fixture(spark, tmp_path)
    k = F.col("rid")
    base.commit_full(rows.filter(k < 50))
    mat.refresh()
    base.commit_append(rows.filter(k >= 50))
    base.compact()
    mat.refresh()
    assert mat.last_refresh_mode == "full"
    expected = _as_map(
        base.read().groupBy("g").agg(
            F.count(F.lit(1)).alias("n"), F.sum("v").alias("sum_v")
        )
    )
    assert _as_map(mat.read()) == expected


def test_incremental_view_time_travel(spark, tmp_path):
    """The matview is itself a versioned store: read(version=N) serves
    the aggregate as of refresh N even after later refreshes."""
    base, view, mat, rows = _mat_fixture(spark, tmp_path)
    k = F.col("rid")
    base.commit_full(rows.filter(k < 50))
    v0 = mat.refresh()
    snap0 = _as_map(mat.read())
    base.commit_append(rows.filter(k >= 50))
    mat.refresh()
    assert _as_map(mat.read(version=v0)) == snap0
    assert _as_map(mat.read()) != snap0


def test_incremental_noop_when_base_unmoved(spark, tmp_path):
    base, view, mat, rows = _mat_fixture(spark, tmp_path)
    base.commit_full(rows)
    v = mat.refresh()
    assert mat.refresh() == v
    assert view.latest_version() == v


def test_incremental_rejects_mismatched_view_key(spark, tmp_path):
    base = DeltaSnapshotStore(spark, str(tmp_path / "b"), id_col="rid")
    view = DeltaSnapshotStore(spark, str(tmp_path / "v"), id_col="other")
    with pytest.raises(ValueError, match="group key"):
        MaterializedAggregate(base, view, "g", ["v"])


# --- bigram LM --------------------------------------------------------------


def test_bigram_lm_matches_local_model(spark):
    docs = spark.createDataFrame(
        [
            (1, "a b a b"),
            (2, "a b c"),
            (3, "c c"),
            (4, "x"),  # < 2 tokens: excluded
        ],
        "doc_id long, text string",
    )
    out = {
        r["doc_id"]: (r["n_bigrams"], r["cross_entropy"])
        for r in bigram_lm_scores(docs, "text", "doc_id", k=0.5).collect()
    }
    assert 4 not in out

    # local reference model
    corpus = {1: "a b a b", 2: "a b c", 3: "c c"}
    bigrams = []
    for t in corpus.values():
        w = t.split(" ")
        bigrams += [(w[i], w[i + 1]) for i in range(len(w) - 1)]
    from collections import Counter

    c_bg = Counter(bigrams)
    c_w1 = Counter(b[0] for b in bigrams)
    # vocabulary counts over ALL docs — including doc 4's 'x', which has
    # no bigrams but is still a corpus token
    vocab = {w for t in list(corpus.values()) + ["x"] for w in t.split(" ")}
    v, k = len(vocab), 0.5

    for did, t in corpus.items():
        w = t.split(" ")
        lps = [
            math.log(
                (c_bg[(w[i], w[i + 1])] + k) / (c_w1[w[i]] + k * v)
            )
            for i in range(len(w) - 1)
        ]
        assert out[did][0] == len(lps)
        assert out[did][1] == pytest.approx(-sum(lps) / len(lps), abs=1e-9)


# --- PCA --------------------------------------------------------------------


def test_pca_np_properties():
    rng = np.random.RandomState(7)
    # anisotropic cloud: variance concentrated along a known direction
    base = rng.randn(500, 8) * np.array([10, 5, 2, 1, 1, 1, 1, 1])
    mean, comps, ev = train_pca_np(base, 3)
    # orthonormal components
    assert np.allclose(comps @ comps.T, np.eye(3), atol=1e-9)
    # eigenvalues descending, dominant axis found
    assert ev[0] >= ev[1] >= ev[2]
    assert abs(comps[0][0]) > 0.99
    # sign convention: largest-|.| coordinate positive => deterministic
    mean2, comps2, _ = train_pca_np(base.copy(), 3)
    assert np.array_equal(comps, comps2)
    for c in comps:
        assert c[np.argmax(np.abs(c))] > 0


def test_pca_project_matches_numpy(spark):
    rng = np.random.RandomState(11)
    data = rng.randn(200, 6)
    mean, comps, _ = train_pca_np(data, 2)
    df = spark.createDataFrame(
        [(i, [float(x) for x in row]) for i, row in enumerate(data)],
        "vid long, embedding array<double>",
    )
    got = {
        r["vid"]: (r["pc1"], r["pc2"])
        for r in pca_project(df, mean, comps, vec_col="embedding").collect()
    }
    want = (data - mean) @ comps.T
    for i in range(len(data)):
        assert got[i][0] == pytest.approx(want[i][0], abs=1e-9)
        assert got[i][1] == pytest.approx(want[i][1], abs=1e-9)


def test_pca_rejects_degenerate_sample():
    with pytest.raises(ValueError, match="2-D sample"):
        train_pca_np(np.zeros((1, 4)), 2)


# --- stratified sampling ----------------------------------------------------


def test_stratified_exact_sizes(spark):
    rows = [(i, "big" if i < 90 else "small") for i in range(100)]
    df = spark.createDataFrame(rows, "id long, grp string")
    out = stratified_sample(df, 20, "grp", "id")
    sizes = {
        r["grp"]: r["n"]
        for r in out.groupBy("grp").agg(F.count("*").alias("n")).collect()
    }
    assert sizes == {"big": 20, "small": 10}  # small stratum exhausted


def test_stratified_is_deterministic_and_weighted_variant(spark):
    rows = [(i, "g", float(i % 5)) for i in range(50)]
    df = spark.createDataFrame(rows, "id long, grp string, w double")
    a = sorted(r["id"] for r in stratified_sample(df, 10, "grp", "id").collect())
    b = sorted(r["id"] for r in stratified_sample(df, 10, "grp", "id").collect())
    assert a == b
    # weighted variant: zero-weight rows (i % 5 == 0) can never be drawn
    wout = stratified_sample(df, 10, "grp", "id", weight_col="w").collect()
    assert len(wout) == 10
    assert all(r["id"] % 5 != 0 for r in wout)
