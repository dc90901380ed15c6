"""Round-7 pipeline ops: weighted sampling, shard shuffle, JSONL
round-trip, SemDeDup semantic dedup, bucketed-join query."""

from __future__ import annotations

import math

import numpy as np
import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from lightweight_vector_database_spark.operators.sampling import (
    assign_shards,
    weighted_sample,
)
from lightweight_vector_database_spark.operators.semantic import (
    semantic_drop_summary,
    semantic_pairs,
)
from lightweight_vector_database_spark.operators.similarity import train_centroids
from lightweight_vector_database_spark.sources import load_table
from lightweight_vector_database_spark.sources.jsonl import read_jsonl, write_jsonl


# --- weighted sampling ------------------------------------------------------


def test_weighted_sample_matches_local_replay(spark, sf_dir):
    """The E-S keys recompute exactly from the collected rows: the
    sample IS the top-k of ln(u)/w, u from md5 — no hidden state."""
    docs = load_table(spark, sf_dir, "documents")
    out = weighted_sample(docs, 25, "n_chars", "doc_id").collect()
    assert len(out) == 25

    import hashlib

    rows = docs.select("doc_id", "n_chars").collect()
    keys = {}
    for r in rows:
        if r.n_chars <= 0:
            continue
        h = hashlib.md5(f"wsamp:{r.doc_id}".encode()).hexdigest()
        u = (int(h[:15], 16) + 1) / float(1 << 60)
        keys[r.doc_id] = math.log(u) / float(r.n_chars)
    expect = sorted(keys, key=lambda d: (-keys[d], d))[:25]
    assert [r.doc_id for r in out] == expect
    for r in out:
        assert r.wkey == pytest.approx(keys[r.doc_id], rel=1e-12)


def test_weighted_sample_prefers_heavy_rows(spark):
    """Statistical sanity: with weights 1000:1 the heavy half dominates
    the sample (E-S inclusion probability is weight-proportional)."""
    df = spark.createDataFrame(
        [(i, 1000 if i < 50 else 1) for i in range(100)], "id long, w long"
    )
    got = weighted_sample(df, 20, "w", "id").collect()
    heavy = sum(1 for r in got if r.id < 50)
    assert heavy >= 18  # deterministic draw; expected ~20


def test_weighted_sample_excludes_nonpositive_and_bounds_k(spark):
    df = spark.createDataFrame(
        [(1, 0), (2, -3), (3, 5), (4, 7)], "id long, w long"
    )
    got = weighted_sample(df, 10, "w", "id").collect()
    assert sorted(r.id for r in got) == [3, 4]


# --- deterministic shard assignment ----------------------------------------


def test_assign_shards_equals_global_window(spark, sf_dir):
    """The two-level rank is byte-identical to the single-partition
    global window it replaces."""
    docs = load_table(spark, sf_dir, "documents")
    got = {
        r.doc_id: (r.global_rank, r.shard_id)
        for r in assign_shards(docs, 64, "doc_id").collect()
    }
    okey = F.md5(F.concat(F.lit("shard:"), F.col("doc_id").cast("string")))
    w = Window.orderBy(okey.asc(), F.col("doc_id").asc())
    expect = {
        r.doc_id: (r.rn, (r.rn - 1) // 64)
        for r in docs.select(
            "doc_id", F.row_number().over(w).alias("rn")
        ).collect()
    }
    assert got == expect


def test_assign_shards_sizes(spark):
    df = spark.range(1000).withColumnRenamed("id", "k")
    out = assign_shards(df, 128, "k")
    sizes = {
        r.shard_id: r.n
        for r in out.groupBy("shard_id").agg(F.count("*").alias("n")).collect()
    }
    assert sorted(sizes) == list(range(8))  # ceil(1000/128) = 8 shards
    assert all(sizes[s] == 128 for s in range(7))
    assert sizes[7] == 1000 - 7 * 128


def test_assign_shards_is_partitioned_window(spark, sf_dir):
    """The plan's window runs under a hash partitioning on the prefix
    bucket — NOT the single-partition global sort Spark warns about."""
    docs = load_table(spark, sf_dir, "documents")
    plan = (
        assign_shards(docs, 64, "doc_id")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Window" in plan
    assert "hashpartitioning(__bucket" in plan


# --- JSONL round-trip -------------------------------------------------------

_SCHEMA = "id bigint, text string"


def test_jsonl_roundtrip_preserves_awkward_text(spark, tmp_path):
    rows = [
        (1, 'quote " backslash \\ tab\t'),
        (2, "newline\ninside"),
        (3, "unicode é中😀"),
        (4, None),
        (5, ""),
    ]
    df = spark.createDataFrame(rows, _SCHEMA)
    path = str(tmp_path / "docs.jsonl")
    write_jsonl(df, path)
    back = read_jsonl(spark, path, _SCHEMA)
    assert {(r.id, r.text) for r in back.collect()} == set(rows)


def test_jsonl_gzip_and_distributed_files(spark, tmp_path):
    import glob

    df = spark.range(100).selectExpr("id", "repeat('x', 10) AS text")
    path = str(tmp_path / "gz")
    write_jsonl(df.repartition(4), path)
    files = glob.glob(f"{path}/part-*.json.gz")
    assert len(files) == 4  # one file per task, gzipped
    back = read_jsonl(spark, path, "id bigint, text string")
    assert back.count() == 100


def test_jsonl_corrupt_line_surfaces_not_drops(spark, tmp_path):
    p = tmp_path / "c"
    p.mkdir()
    (p / "part-00000.json").write_text(
        '{"id": 1, "text": "ok"}\nnot json at all\n{"id": 2, "text": "ok2"}\n'
    )
    back = read_jsonl(
        spark,
        str(p),
        "id bigint, text string, _corrupt string",
        corrupt_col="_corrupt",
    )
    rows = back.collect()
    assert len(rows) == 3
    bad = [r for r in rows if r._corrupt is not None]
    assert len(bad) == 1 and bad[0]._corrupt == "not json at all"


# --- SemDeDup semantic dedup ------------------------------------------------


@pytest.fixture(scope="module")
def sem(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    cents = train_centroids(
        emb, n_centroids=4, iters=5, seed=42, sample_id_col="vec_id"
    )
    return emb, cents


def test_semantic_pairs_match_numpy_brute(spark, sem):
    emb, cents = sem
    tau = 0.3
    got = {
        (r.id1, r.id2): (r.cell, r.cos_sim)
        for r in semantic_pairs(emb, cents, tau).collect()
    }

    rows = emb.select("vec_id", "embedding").collect()
    ids = np.array([r.vec_id for r in rows])
    M = np.array([r.embedding for r in rows], dtype=np.float64)
    cell = ((M[:, None, :] - cents[None, :, :]) ** 2).sum(-1).argmin(1)
    N = M / np.linalg.norm(M, axis=1, keepdims=True)
    S = N @ N.T
    expect = {}
    for i in range(len(ids)):
        for j in range(len(ids)):
            if ids[i] < ids[j] and cell[i] == cell[j] and S[i, j] >= tau:
                a, b = int(ids[i]), int(ids[j])
                expect[(a, b)] = (int(cell[i]), S[i, j])
    assert set(got) == set(expect)
    for k in got:
        assert got[k][0] == expect[k][0]
        assert got[k][1] == pytest.approx(expect[k][1], rel=1e-9)


def test_semantic_max_cluster_cap_drops_and_logs(spark, sem, caplog):
    emb, cents = sem
    import logging

    with caplog.at_level(
        logging.WARNING, logger="lightweight_vector_database_spark.operators.semantic"
    ):
        capped = semantic_pairs(emb, cents, 0.3, max_cluster=10)
        got = capped.collect()
    # every cluster at sf0.001 is bigger than 10 -> nothing survives,
    # and the dropped mass is logged, not silent
    assert got == []
    assert any("oversized clusters" in r.message for r in caplog.records)


def test_semantic_drop_summary_consistent(spark, sem):
    emb, cents = sem
    pairs = semantic_pairs(emb, cents, 0.3)
    summary = semantic_drop_summary(emb, pairs, centroids=cents).collect()
    assert sum(r.n_vecs for r in summary) == emb.count()
    dropped_ids = {r.id2 for r in pairs.select("id2").distinct().collect()}
    assert sum(r.n_dropped for r in summary) == len(dropped_ids)
    for r in summary:
        assert 0 <= r.n_dropped <= r.n_vecs


# --- registered bucketed-join query ----------------------------------------


def test_bucketed_query_matches_plain_join(spark, sf_dir):
    from lightweight_vector_database_spark.suite import QUERIES

    got = {
        (r.c_mktsegment, r.n_orders, r.n_customers, r.total_price)
        for r in QUERIES["bucketed_join_customer_orders"](spark, sf_dir).collect()
    }
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    expect = {
        (r.c_mktsegment, r.n_orders, r.n_customers, r.total_price)
        for r in o.join(c, o.o_custkey == c.c_custkey)
        .groupBy("c_mktsegment")
        .agg(
            F.count("*").alias("n_orders"),
            F.countDistinct("c_custkey").alias("n_customers"),
            F.round(F.sum("o_totalprice"), 2).alias("total_price"),
        )
        .collect()
    }
    assert got == expect
