"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash -> CORRECTNESS_r{N}.json).

The actual suite lives in ``lightweight_vector_database_spark/suite/``;
this module is just the thin driver-facing shim.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query: filtered squared-Euclidean kNN over embeddings
    (the reference's find_k_nearest_neighbors semantics, SURVEY.md
    §2A.5) at sf0.001."""
    from lightweight_vector_database_spark.suite import QUERIES

    return QUERIES["knn_filtered"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from lightweight_vector_database_spark.suite import QUERIES

    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    from lightweight_vector_database_spark.suite import ORACLE

    return dict(ORACLE)
