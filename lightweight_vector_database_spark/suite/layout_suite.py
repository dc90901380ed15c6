"""Data-layout queries: Morton (z-order) clustering keys.

The layout machinery itself (quantize + bit interleave +
range-partitioned write) lives in sources/layout.py; the query here
value-checks the z-value computation end to end against a DuckDB
oracle built from the same bit arithmetic. The pruning payoff of the
layout (files skipped under multi-dimensional box predicates) is
pinned by tests/test_layout.py, which inspects the written files'
actual min/max footer ranges.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources import load_table
from ..sources.layout import quantize, zorder_value, zorder_value_sql
from . import register

_BITS = 8


def _zorder_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Morton code over (user_id, event time in seconds) for every
    event — the clustering key a 100 TB events table would be
    z-ordered on so BOTH per-user scans and time-range scans prune.
    Bounds come from one broadcast aggregate; everything else is
    shifts/masks in codegen."""
    ev = load_table(spark, sf_dir, "events").select(
        "event_id",
        "user_id",
        F.expr("unix_micros(ts) div 1000000").alias("ts_s"),
    )
    bounds = ev.agg(
        F.min("user_id").alias("umn"),
        F.max("user_id").alias("umx"),
        F.min("ts_s").alias("tmn"),
        F.max("ts_s").alias("tmx"),
    )
    q = ev.join(F.broadcast(bounds)).select(
        "event_id",
        quantize(F.col("user_id"), F.col("umn"), F.col("umx"), _BITS).alias("qu"),
        quantize(F.col("ts_s"), F.col("tmn"), F.col("tmx"), _BITS).alias("qt"),
    )
    return q.select(
        "event_id", "qu", "qt",
        zorder_value([F.col("qu"), F.col("qt")], _BITS).alias("zval"),
    )


register(
    "zorder_events",
    _zorder_events,
    f"""
WITH ev AS (
  SELECT event_id, user_id, epoch_us(ts) // 1000000 AS ts_s FROM events
), b AS (
  SELECT min(user_id) AS umn, max(user_id) AS umx,
         min(ts_s) AS tmn, max(ts_s) AS tmx
  FROM ev
), q AS (
  SELECT event_id,
         CAST(floor((user_id - umn) * {1 << _BITS} / (umx - umn + 1)) AS BIGINT) AS qu,
         CAST(floor((ts_s - tmn) * {1 << _BITS} / (tmx - tmn + 1)) AS BIGINT) AS qt
  FROM ev CROSS JOIN b
)
SELECT event_id, qu, qt, {zorder_value_sql(['qu', 'qt'], _BITS)} AS zval
FROM q
""",
)


# Fixed box in QUANTIZED coordinates — constants shared by the Spark
# read path and the oracle, so the query is deterministic regardless
# of data bounds.
_BOX_LO = (64, 32)
_BOX_HI = (127, 191)


def _zorder_box_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The z-layout READ path: decompose the box into Morton ranges
    (sources/layout.py::zbox_ranges), push them as BETWEENs on the z
    value, AND the exact box predicate. On a z-ordered table the range
    disjunction reaches the parquet footer stats and skips the files
    outside the box (pinned by tests/test_layout.py); here the oracle
    value-checks that the range algebra loses no rows — the z-filter
    is a proven superset, so the result must equal the plain box scan.
    """
    from ..sources.layout import zbox_filter, zbox_ranges

    ev = load_table(spark, sf_dir, "events").select(
        "event_id",
        "user_id",
        F.expr("unix_micros(ts) div 1000000").alias("ts_s"),
    )
    bounds = ev.agg(
        F.min("user_id").alias("umn"),
        F.max("user_id").alias("umx"),
        F.min("ts_s").alias("tmn"),
        F.max("ts_s").alias("tmx"),
    )
    q = ev.join(F.broadcast(bounds)).select(
        "event_id",
        quantize(F.col("user_id"), F.col("umn"), F.col("umx"), _BITS).alias("qu"),
        quantize(F.col("ts_s"), F.col("tmn"), F.col("tmx"), _BITS).alias("qt"),
    )
    z = q.withColumn(
        "zval", zorder_value([F.col("qu"), F.col("qt")], _BITS)
    )
    ranges = zbox_ranges(list(_BOX_LO), list(_BOX_HI), _BITS, max_ranges=32)
    box = (
        F.col("qu").between(_BOX_LO[0], _BOX_HI[0])
        & F.col("qt").between(_BOX_LO[1], _BOX_HI[1])
    )
    return z.filter(zbox_filter(F.col("zval"), ranges) & box)


register(
    "zorder_box_read",
    _zorder_box_read,
    f"""
WITH ev AS (
  SELECT event_id, user_id, epoch_us(ts) // 1000000 AS ts_s FROM events
), b AS (
  SELECT min(user_id) AS umn, max(user_id) AS umx,
         min(ts_s) AS tmn, max(ts_s) AS tmx
  FROM ev
), q AS (
  SELECT event_id,
         CAST(floor((user_id - umn) * {1 << _BITS} / (umx - umn + 1)) AS BIGINT) AS qu,
         CAST(floor((ts_s - tmn) * {1 << _BITS} / (tmx - tmn + 1)) AS BIGINT) AS qt
  FROM ev CROSS JOIN b
)
SELECT event_id, qu, qt, {zorder_value_sql(['qu', 'qt'], _BITS)} AS zval
FROM q
WHERE qu BETWEEN {_BOX_LO[0]} AND {_BOX_HI[0]}
  AND qt BETWEEN {_BOX_LO[1]} AND {_BOX_HI[1]}
""",
)
