"""Parquet sources for the driver fixture tables (TESTDATA.md).

All reads go through ``spark.read.parquet`` so Catalyst gets predicate
pushdown + column pruning for free — at 100 TB these tables would be
partitioned parquet/iceberg and the same code path applies.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]


# (session, sf_dir, table) -> DataFrame plan. A DataFrame is an
# immutable logical plan, so handing every caller the same object is
# safe — and skips the repeated file-listing + parquet-footer schema
# read that spark.read.parquet pays per call (measured 0.1-0.5s of
# pure driver overhead per query at bench time). Holding the session
# reference keeps ids unique for the (rare) multi-session processes.
_CACHE: dict[tuple[int, str, str], tuple[SparkSession, DataFrame]] = {}


def load_table(
    spark: SparkSession, sf_dir: str, name: str, fan_out: bool = False
) -> DataFrame:
    """``fan_out=True`` returns the table behind a parallelism-raising
    round-robin repartition (see :func:`fan_out`) — for call sites whose
    per-row work (hash folds, n-gram explodes, aggregation) dominates
    the scan. The fanned-out plan is memoized like the plain one, so
    the partition-count probe runs once per (session, sf_dir, table)."""
    key = (id(spark), sf_dir.rstrip("/"), name, bool(fan_out))
    hit = _CACHE.get(key)
    if hit is not None and hit[0] is spark:
        return hit[1]
    if fan_out:
        df = globals()["fan_out"](load_table(spark, sf_dir, name))
    else:
        df = _load_table_uncached(spark, sf_dir, name)
    _CACHE[key] = (spark, df)
    return df


def fan_out(df: DataFrame) -> DataFrame:
    """Raise a CPU-heavy upstream's parallelism to the cluster default.

    Input splits are sized by BYTES (``spark.sql.files.maxPartitionBytes``),
    so a table that is small on disk — a single sub-128MB file, or one
    parquet row group, which is unsplittable by row — gives the whole
    scan stage ONE task. Every derived per-row computation above it
    (signature folds, n-gram explodes, distance expressions, partial
    aggregation) then runs on one core regardless of cluster size: the
    scan-parallelism analogue of input skew (optimization guide §2.5 —
    "repartition immediately after the read"; §6 — ``minPartitionNum``
    cannot split a single row group).

    Round-robin repartition to ``defaultParallelism`` when the plan has
    fewer partitions; a NO-OP (returns ``df`` unchanged, no shuffle)
    wherever the scan already spans the cluster — i.e. at any real
    scale — and on streaming DataFrames. The shuffle this adds moves
    only the bytes the single task would otherwise have processed
    alone, so it pays for itself whenever downstream per-row work
    exceeds one serialize/deserialize of the rows.
    """
    if df.isStreaming:
        return df
    spark = df.sparkSession
    target = spark.sparkContext.defaultParallelism
    try:
        n = df.rdd.getNumPartitions()
    except Exception:
        return df
    if n >= target:
        return df
    return df.repartition(target)


def _load_table_uncached(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; expected one of {TABLES}")
    if name == "events":
        # events.ts drifts across environments: parquet TIMESTAMP(NANOS) may
        # surface as bigint (with nanosAsLong), TIMESTAMP_NTZ, or TIMESTAMP.
        # Normalize to TIMESTAMP here — the single choke point — so every
        # downstream call site (unix_micros, window(), session_window()) sees
        # one type. Session TZ is UTC (session.py), so NTZ -> TIMESTAMP is
        # value-identical to DuckDB's naive-timestamp interpretation.
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
        from pyspark.sql import functions as F

        ts_type = dict(df.dtypes).get("ts")
        if ts_type == "bigint":
            df = df.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))
        elif ts_type != "timestamp":
            df = df.withColumn("ts", F.col("ts").cast("timestamp"))
        return df
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def load_all(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {t: load_table(spark, sf_dir, t) for t in TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every fixture table as a temp view for spark.sql use."""
    for t in TABLES:
        load_table(spark, sf_dir, t).createOrReplaceTempView(t)
