"""Sinks: parquet/csv/json writers with the partitioning that makes
the 100 TB read path work.

``write_indexed_snapshot`` is the load-bearing one: persisting the
vector snapshot partitioned by ``cell_id`` turns the grid index's
IN-list candidate filters (plans/grid_index.py) into directory-level
partition pruning — a probe query then opens only the candidate
cells' files instead of scanning the table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_parquet(
    df: DataFrame,
    path: str,
    partition_by: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    w = df.write.mode(mode)
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.parquet(path)


def write_indexed_snapshot(assigned: DataFrame, path: str) -> None:
    """Vector snapshot partitioned by grid cell (see module doc).

    Repartitions on ``cell_id`` first so each cell lands in ONE file
    instead of one per (cell x write task): the r6 profile measured the
    uncompacted layout costing ~5x on the serving scan (1690 tiny files
    vs 169 at sf1) — the classic small-file problem. At larger scale,
    pair this with spark.sql.files.maxRecordsPerFile to split a hot
    cell into several size-bounded files rather than one giant one."""
    write_parquet(
        assigned.repartition("cell_id"), path, partition_by=["cell_id"]
    )


def write_jsonl_shards(
    df: DataFrame,
    path: str,
    max_records_per_file: int = 100_000,
    mode: str = "overwrite",
) -> None:
    """Training-data export: gzip-compressed JSONL shards with a
    bounded record count per file — the contract most training loaders
    want (shard-parallel reads, no single giant file, no 10^5 tiny
    ones). maxRecordsPerFile splits oversized task outputs at write
    time without an extra shuffle; upstream partitioning controls the
    lower bound on shard count."""
    (
        df.write.mode(mode)
        .option("maxRecordsPerFile", max_records_per_file)
        .option("compression", "gzip")
        .json(path)
    )


def read_parquet(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.parquet(path)


def write_csv(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    df.write.mode(mode).option("header", True).csv(path)


def read_csv(spark: SparkSession, path: str, schema: str) -> DataFrame:
    return spark.read.option("header", True).schema(schema).csv(path)


def write_json(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    df.write.mode(mode).json(path)


def read_json(spark: SparkSession, path: str, schema: str) -> DataFrame:
    return spark.read.schema(schema).json(path)


def write_orc(
    df: DataFrame,
    path: str,
    partition_by: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    w = df.write.mode(mode)
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.orc(path)


def read_orc(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.orc(path)
