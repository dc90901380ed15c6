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
