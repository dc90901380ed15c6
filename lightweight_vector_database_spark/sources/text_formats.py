"""CSV and ORC source/sink edges.

Corpora and label sets arrive as CSV more often than anyone likes;
ORC is the other columnar format a Spark-native engine meets in
warehouse migrations (Hive-era tables). Both readers/writers here are
thin, opinionated wrappers over Spark's built-ins with the same
contract as sources/jsonl.py:

* reads ALWAYS take an explicit schema (CSV inference is an extra
  full pass and type-unstable on ragged data);
* CSV quoting is RFC 4180 (quote char doubled as the escape), so
  embedded delimiters/quotes/newlines in text columns survive the
  round trip;
* writes stay one-file-per-task — no coalesce(1) driver funnel.

The reference has no persistence surface (SURVEY.md §2B); these are
engine extras alongside parquet/JSONL/WebDataset/delta.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType

__all__ = ["write_csv", "read_csv", "write_orc", "read_orc"]


def write_csv(
    df: DataFrame,
    path: str,
    header: bool = True,
    compression: str | None = "gzip",
    mode: str = "overwrite",
) -> None:
    w = (
        df.write.mode(mode)
        .option("header", header)
        # RFC 4180: escape a quote by doubling it (Spark's default
        # escape is backslash, which non-Spark readers reject)
        .option("quote", '"')
        .option("escape", '"')
    )
    if compression:
        w = w.option("compression", compression)
    w.csv(path)


def read_csv(
    spark: SparkSession,
    path: str,
    schema: StructType | str,
    header: bool = True,
    mode: str = "PERMISSIVE",
) -> DataFrame:
    return (
        spark.read.schema(schema)
        .option("header", header)
        .option("quote", '"')
        .option("escape", '"')
        .option("mode", mode)
        .csv(path)
    )


def write_orc(
    df: DataFrame, path: str, compression: str = "zlib", mode: str = "overwrite"
) -> None:
    df.write.mode(mode).option("compression", compression).orc(path)


def read_orc(spark: SparkSession, path: str) -> DataFrame:
    # ORC files carry their schema; no inference pass needed.
    return spark.read.orc(path)
