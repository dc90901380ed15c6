"""JSON-Lines source/sink — the lingua franca of LLM corpus exchange.

Training corpora move between pipelines as JSONL (one JSON object per
line: The Pile, RedPajama, Dolma all ship this way), so the engine
needs a round-trip-safe JSONL edge next to its parquet/WebDataset
ones. Spark's native json reader/writer IS line-delimited JSON by
default (one record per line, splittable, per-line parallel parse), so
both directions stay fully distributed — one output file per task, no
driver funnels.

Round-trip contract (pinned by tests/test_pipeline_ops.py and the
``jsonl_roundtrip_docs`` registered query):

* reads ALWAYS take an explicit schema — schema inference is a full
  extra pass over 100 TB and infers unstable types on ragged corpora
  (the classic "column became string in this dump" failure);
* ``columnNameOfCorruptRecord`` surfaces malformed lines as rows in a
  ``_corrupt`` column under PERMISSIVE mode instead of silently
  dropping them (mode='FAILFAST' to refuse instead);
* writes compress with gzip by default — JSONL is ~4x the bytes of
  parquet uncompressed, and every public corpus ships gzipped.

The reference is purely in-memory (no persistence surface at all,
SURVEY.md §2B); this is an engine extra for the LLM-pipeline north
star.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType


def write_jsonl(
    df: DataFrame,
    path: str,
    compression: str | None = "gzip",
    mode: str = "overwrite",
) -> None:
    """Write one JSON object per line, one file per task (distributed;
    no coalesce(1) driver funnel — downstream consumers glob the
    directory exactly as they would a parquet dataset)."""
    w = df.write.mode(mode)
    if compression:
        w = w.option("compression", compression)
    w.json(path)


def read_jsonl(
    spark: SparkSession,
    path: str,
    schema: StructType | str,
    mode: str = "PERMISSIVE",
    corrupt_col: str | None = None,
) -> DataFrame:
    """Schema-enforced JSONL scan. gzip/uncompressed autodetected per
    file; gzip members are non-splittable so at scale the sharding IS
    the parallelism (many files from many tasks — which write_jsonl
    produces naturally)."""
    r = spark.read.schema(schema).option("mode", mode)
    if corrupt_col is not None:
        r = r.option("columnNameOfCorruptRecord", corrupt_col)
    return r.json(path)
