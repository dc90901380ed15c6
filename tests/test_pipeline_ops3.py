"""Round-7 pipeline ops, third batch: fuzzy joins, PageRank."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from lightweight_vector_database_spark.operators.fuzzy import fuzzy_join
from lightweight_vector_database_spark.operators.graph import pagerank


# --- fuzzy join -------------------------------------------------------------


@pytest.fixture()
def names_df(spark):
    rows = [
        (1, "alpha"),
        (2, "alphax"),     # dist 1 to alpha, straddles a band boundary
        (3, "alpja"),      # dist 1 to alpha
        (4, "beta"),
        (5, "betta"),      # dist 1 to beta
        (6, "completely"),
        (7, "alpha"),      # dist 0 duplicate
    ]
    return spark.createDataFrame(rows, "id long, name string")


def _brute_pairs(spark, df, d):
    a = df.selectExpr("id AS id1", "name AS n1")
    b = df.selectExpr("id AS id2", "name AS n2")
    return {
        (r["id1"], r["id2"])
        for r in a.crossJoin(b)
        .filter(
            (F.col("id1") < F.col("id2"))
            & (F.levenshtein("n1", "n2") <= d)
        )
        .collect()
    }


def test_fuzzy_join_matches_brute_force(spark, names_df):
    """Length-band blocking is sound: the blocked join finds EXACTLY
    the brute-force pair set — including 'alpha'/'alphax' whose
    lengths 5 and 6 fall in different bands (band width 2: 2 vs 3)."""
    a = names_df.selectExpr("id AS id1", "name AS n1")
    b = names_df.selectExpr("id AS id2", "name AS n2")
    out = fuzzy_join(a, b, "n1", "n2", max_dist=1)
    got = {
        (r["id1"], r["id2"])
        for r in out.filter(F.col("id1") < F.col("id2")).collect()
    }
    assert got == _brute_pairs(spark, names_df, 1)
    assert (2, 7) in got or (1, 2) in got  # the band-straddling pair


def test_fuzzy_join_dist_column_and_zero(spark, names_df):
    a = names_df.selectExpr("id AS id1", "name AS n1")
    b = names_df.selectExpr("id AS id2", "name AS n2")
    out = fuzzy_join(a, b, "n1", "n2", max_dist=0)
    rows = out.filter(F.col("id1") < F.col("id2")).collect()
    assert {(r["id1"], r["id2"]) for r in rows} == {(1, 7)}
    assert rows[0]["dist"] == 0


def test_fuzzy_join_extra_block_is_applied(spark, names_df):
    """A second blocking key restricts candidates (sound only if the
    caller's matches share it — contract documented)."""
    a = names_df.selectExpr("id AS id1", "name AS n1").withColumn(
        "k1", F.substring("n1", 1, 1)
    )
    b = names_df.selectExpr("id AS id2", "name AS n2").withColumn(
        "k2", F.substring("n2", 1, 1)
    )
    out = fuzzy_join(a, b, "n1", "n2", max_dist=1, extra_block=("k1", "k2"))
    got = {
        (r["id1"], r["id2"])
        for r in out.filter(F.col("id1") < F.col("id2")).collect()
    }
    # same result here (all dist<=1 pairs share their first char)
    assert got == _brute_pairs(spark, names_df, 1)


def test_fuzzy_join_rejects_bad_band_width(spark, names_df):
    a = names_df.selectExpr("id AS id1", "name AS n1")
    b = names_df.selectExpr("id AS id2", "name AS n2")
    with pytest.raises(ValueError, match="band_width"):
        fuzzy_join(a, b, "n1", "n2", max_dist=2, band_width=2)


# --- PageRank ---------------------------------------------------------------


def _local_pagerank(edges, iters, d):
    nodes = sorted({u for e in edges for u in e})
    idx = {u: i for i, u in enumerate(nodes)}
    n = len(nodes)
    out_deg = {u: 0 for u in nodes}
    for s, _ in edges:
        out_deg[s] += 1
    r = np.full(n, 1.0 / n)
    for _ in range(iters):
        nxt = np.full(n, (1 - d) / n)
        for s, t in edges:
            nxt[idx[t]] += d * r[idx[s]] / out_deg[s]
        r = nxt
    return {u: r[idx[u]] for u in nodes}


def test_pagerank_matches_local_power_iteration(spark):
    edges = [(1, 2), (2, 3), (3, 1), (1, 3), (4, 1)]
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {
        r["node"]: r["rank"]
        for r in pagerank(df, iters=6, damping=0.85).collect()
    }
    want = _local_pagerank(edges, 6, 0.85)
    assert set(got) == set(want)
    for u in want:
        assert got[u] == pytest.approx(want[u], abs=1e-12)


def test_pagerank_symmetric_graph_conserves_mass(spark):
    """With symmetrized edges there are no dangling nodes, so total
    rank stays exactly 1 (the mass-conservation invariant the
    registered bipartite query relies on)."""
    fwd = [(i, 100 + (i % 3)) for i in range(10)]
    edges = fwd + [(b, a) for a, b in fwd]
    df = spark.createDataFrame(edges, "src long, dst long")
    ranks = pagerank(df, iters=4).collect()
    assert sum(r["rank"] for r in ranks) == pytest.approx(1.0, abs=1e-9)
    assert all(r["rank"] > 0 for r in ranks)


def test_pagerank_dedups_edges_and_rejects_bad_iters(spark):
    df = spark.createDataFrame(
        [(1, 2), (1, 2), (2, 1)], "src long, dst long"
    )
    got = {r["node"]: r["rank"] for r in pagerank(df, iters=3).collect()}
    # duplicate (1,2) must count once: graph is symmetric -> equal ranks
    assert got[1] == pytest.approx(got[2], abs=1e-12)
    with pytest.raises(ValueError, match="iters"):
        pagerank(df, iters=0)
