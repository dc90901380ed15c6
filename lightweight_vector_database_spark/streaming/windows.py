"""Streaming windows with batch twins.

Every aggregation here is written against a plain DataFrame, so the
SAME function runs in two modes:

- batch: called with ``load_table(...)`` — this is what the driver's
  DuckDB oracle checks (window semantics are identical);
- streaming: called with ``stream_events(...)`` (file-source readStream)
  plus a watermark — verified in tests/test_streaming.py with a memory
  sink and availableNow trigger.

This twin design is the point: Structured Streaming's incremental
execution of `window()`/`session_window()` produces the same results
as the batch plan, so correctness is checked once and the streaming
path only adds watermark/state semantics (covered by tests).

State scale: tumbling/sliding state is bounded by (#keys x windows in
watermark horizon); dropDuplicatesWithinWatermark state by distinct
keys per horizon. Both shuffle on (key, window) — skew-safe for
events-like data where keys are users.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

EVENTS_SCHEMA = (
    "event_id long, ts timestamp, user_id long, event_type string, "
    "value double, props string"
)


def stream_events(spark: SparkSession, sf_dir: str, watermark: str = "1 hour") -> DataFrame:
    """events as a file-source stream.

    Spark's file source requires a *directory*; the fixture is a single
    parquet file, so we stage a symlink directory under /tmp (per
    sf_dir, idempotent). The fixture's ts physical type drifts across
    environments (TIMESTAMP(NANOS) -> bigint under nanosAsLong,
    TIMESTAMP(MICROS) NTZ, or plain TIMESTAMP); probe the batch reader
    once to pick the matching stream schema, then normalize to
    TIMESTAMP — same choke-point policy as sources/tables.load_table.
    """
    import hashlib
    import os

    tag = hashlib.md5(sf_dir.encode()).hexdigest()[:8]
    stage = f"/tmp/lvdb_stream_{tag}"
    os.makedirs(stage, exist_ok=True)
    link = f"{stage}/events.parquet"
    if not os.path.exists(link):
        os.symlink(f"{sf_dir}/events.parquet", link)

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    ts_type = dict(spark.read.parquet(link).dtypes).get("ts")
    raw = "event_id long, ts {}, user_id long, event_type string, value double, props string"
    if ts_type == "bigint":  # TIMESTAMP(NANOS) read as long -> truncate to micros
        df = (
            spark.readStream.schema(raw.format("long"))
            .parquet(stage)
            .withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))
        )
    elif ts_type == "timestamp_ntz":  # naive micros; session TZ is UTC
        df = (
            spark.readStream.schema(raw.format("timestamp_ntz"))
            .parquet(stage)
            .withColumn("ts", F.col("ts").cast("timestamp"))
        )
    else:
        df = spark.readStream.schema(raw.format("timestamp")).parquet(stage)
    return df.withWatermark("ts", watermark)


def _q6(col):  # floor-quantized sum, deterministic under parallelism
    return F.sum(F.floor(col * F.lit(1e6)).cast("long")).cast("double") / F.lit(1e6)


def tumbling_agg(
    events: DataFrame, duration: str = "1 hour", keys: tuple[str, ...] = ("event_type",)
) -> DataFrame:
    """Tumbling-window count + value sum. Works on batch and stream."""
    return (
        events.groupBy(F.window("ts", duration).alias("w"), *keys)
        .agg(F.count(F.lit(1)).alias("n"), _q6(F.col("value")).alias("sum_value"))
        .select(
            F.unix_micros(F.col("w.start")).alias("window_start_us"),
            *keys,
            "n",
            "sum_value",
        )
    )


def sliding_agg(
    events: DataFrame, duration: str = "1 hour", slide: str = "15 minutes"
) -> DataFrame:
    """Sliding-window event counts (each event lands in dur/slide windows)."""
    return (
        events.groupBy(F.window("ts", duration, slide).alias("w"))
        .agg(F.count(F.lit(1)).alias("n"), _q6(F.col("value")).alias("sum_value"))
        .select(
            F.unix_micros(F.col("w.start")).alias("window_start_us"),
            "n",
            "sum_value",
        )
    )


def session_agg(events: DataFrame, gap: str = "30 minutes") -> DataFrame:
    """Per-user session windows (gap-based). Works on batch and stream;
    in batch it compiles to the same gaps-and-islands result the SQL
    oracle computes."""
    return (
        events.groupBy(F.session_window("ts", gap).alias("w"), "user_id")
        .agg(F.count(F.lit(1)).alias("n"), _q6(F.col("value")).alias("sum_value"))
        .select(
            F.col("user_id"),
            F.unix_micros(F.col("w.start")).alias("session_start_us"),
            "n",
            "sum_value",
        )
    )


def windowed_topk(
    events: DataFrame,
    duration: str = "1 hour",
    k: int = 3,
    key: str = "event_type",
) -> DataFrame:
    """Per-window heavy hitters: top-``k`` keys by count inside each
    tumbling window, with rank (ties to the lexicographically smallest
    key so the result is total-ordered).

    Works on batch directly. On a STREAM, ranking over an aggregate is
    not expressible inside one streaming plan (no window function over
    a streaming agg) — run ``tumbling_agg`` in the stream and apply
    this ranking in the sink (``foreachBatch``), which is what
    tests/test_streaming.py pins against this batch form.

    Scale shape: the count agg is map-side-combinable; the rank window
    partitions by window_start over the (windows x keys) aggregate —
    vocabulary-sized, never event-sized.
    """
    from pyspark.sql import Window

    counts = (
        events.groupBy(F.window("ts", duration).alias("w"), key)
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            F.unix_micros(F.col("w.start")).alias("window_start_us"),
            key,
            "n",
        )
    )
    return rank_topk(counts, k, key=key)


def rank_topk(
    counts: DataFrame, k: int, key: str = "event_type"
) -> DataFrame:
    """Rank the per-(window, key) count relation to its per-window
    top-k — the sink-side half of streaming ``windowed_topk``."""
    from pyspark.sql import Window

    w = Window.partitionBy("window_start_us").orderBy(
        F.col("n").desc(), F.col(key).asc()
    )
    return (
        counts.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .select("window_start_us", key, "n", "rank")
    )


def first_event_per_key(
    events: DataFrame, keys: tuple[str, ...] = ("user_id", "event_type")
) -> DataFrame:
    """Deterministic batch twin of streaming dedup-within-watermark:
    keep the FIRST event (by ts, then event_id) per key.

    Streaming form: ``events.withWatermark('ts', h)
    .dropDuplicatesWithinWatermark([*keys])`` — keeps the first
    arrival; with an ordered replay that is the same row this twin
    selects deterministically.
    """
    w = Window.partitionBy(*[F.col(k) for k in keys]).orderBy(
        F.col("ts").asc(), F.col("event_id").asc()
    )
    return (
        events.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )
