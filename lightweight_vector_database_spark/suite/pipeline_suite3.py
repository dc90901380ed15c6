"""Training-pipeline queries, third batch (round 7): fuzzy
(edit-distance) joins and fixed-iteration PageRank.

* ``fuzzy_join_customer_names`` — entity-resolution self-join over
  customer names within edit distance 1 via sound length-band
  blocking + codegen ``levenshtein`` verify
  (operators/fuzzy.py); the oracle replays the whole join as a
  theta-join + levenshtein filter (DuckDB's levenshtein is the same
  textbook definition);
* ``graph_pagerank_bipartite`` — 5 power iterations of PageRank over
  the symmetrized part↔supplier bipartite graph from lineitem
  (operators/graph.pagerank); fixed iteration count means the
  arithmetic replays EXACTLY in unrolled SQL CTEs (r0..r5), pinning
  a driver-looped iterative algorithm against an engine that never
  ran a loop.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.fuzzy import fuzzy_join
from ..operators.graph import pagerank
from ..sources import load_table
from . import register

# --- fuzzy join -------------------------------------------------------------

_FUZZY_MAXK = 300
_FUZZY_D = 1


def _fuzzy_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-duplicate customer names (edit distance <= 1) among the
    first 300 customers, oriented id1 < id2.  The fixture's names are
    fixed-width ('Customer#000000NNN'), so every row lands in one
    length band — blocking is exercised structurally (the banded plan)
    while tests/test_pipeline_ops3.py pins band-straddling recall on
    variable-length strings."""
    c = load_table(spark, sf_dir, "customer").filter(
        F.col("c_custkey") <= _FUZZY_MAXK
    )
    a = c.select(
        F.col("c_custkey").alias("id1"), F.col("c_name").alias("name1")
    )
    b = c.select(
        F.col("c_custkey").alias("id2"), F.col("c_name").alias("name2")
    )
    out = fuzzy_join(a, b, "name1", "name2", max_dist=_FUZZY_D)
    return (
        out.filter(F.col("id1") < F.col("id2"))
        .select("id1", "id2", "dist")
        .distinct()
    )


register(
    "fuzzy_join_customer_names",
    _fuzzy_customers,
    f"""
SELECT a.c_custkey AS id1, b.c_custkey AS id2,
       CAST(levenshtein(a.c_name, b.c_name) AS BIGINT) AS dist
FROM customer a JOIN customer b ON a.c_custkey < b.c_custkey
WHERE a.c_custkey <= {_FUZZY_MAXK} AND b.c_custkey <= {_FUZZY_MAXK}
  AND levenshtein(a.c_name, b.c_name) <= {_FUZZY_D}
""",
)


# --- PageRank ---------------------------------------------------------------

_PR_ITERS = 5
_PR_DAMPING = 0.85
_PR_OFFSET = 10_000_000  # supplier node ids, disjoint from part ids


def _pagerank_bipartite(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    fwd = li.select(
        F.col("l_partkey").alias("src"),
        (F.col("l_suppkey") + _PR_OFFSET).alias("dst"),
    )
    edges = fwd.unionByName(
        fwd.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    ranks = pagerank(edges, iters=_PR_ITERS, damping=_PR_DAMPING)
    return ranks.select("node", F.round("rank", 8).alias("rank"))


def _pagerank_oracle() -> str:
    d = _PR_DAMPING
    prev = "r0"
    iter_ctes = []
    for i in range(1, _PR_ITERS + 1):
        iter_ctes.append(
            f"""r{i} AS (
  SELECT nodes.node,
         (1 - {d}) / (SELECT n FROM n)
           + {d} * coalesce(c.contrib, 0) AS rank
  FROM nodes LEFT JOIN (
    SELECT w.dst AS node, sum({prev}.rank * w.frac) AS contrib
    FROM w JOIN {prev} ON w.src = {prev}.node GROUP BY w.dst
  ) c USING (node)
)"""
        )
        prev = f"r{i}"
    ctes = ",\n".join(iter_ctes)
    return f"""
WITH e AS (
  SELECT DISTINCT l_partkey AS src, l_suppkey + {_PR_OFFSET} AS dst
  FROM lineitem
  UNION
  SELECT DISTINCT l_suppkey + {_PR_OFFSET} AS src, l_partkey AS dst
  FROM lineitem
),
nodes AS (SELECT DISTINCT src AS node FROM e
          UNION SELECT DISTINCT dst FROM e),
n AS (SELECT count(*) AS n FROM nodes),
od AS (SELECT src, count(*) AS outdeg FROM e GROUP BY src),
w AS (SELECT e.src, e.dst, 1.0 / od.outdeg AS frac
      FROM e JOIN od USING (src)),
r0 AS (SELECT node, 1.0 / (SELECT n FROM n) AS rank FROM nodes),
{ctes}
SELECT node, round(rank, 8) AS rank FROM {prev}
"""


register("graph_pagerank_bipartite", _pagerank_bipartite, _pagerank_oracle())
