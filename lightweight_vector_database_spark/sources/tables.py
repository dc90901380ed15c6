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


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    key = (id(spark), sf_dir.rstrip("/"), name)
    hit = _CACHE.get(key)
    if hit is not None and hit[0] is spark:
        return hit[1]
    df = _load_table_uncached(spark, sf_dir, name)
    _CACHE[key] = (spark, df)
    return df


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
