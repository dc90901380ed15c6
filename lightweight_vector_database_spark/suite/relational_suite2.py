"""Engine surface, part 2: pivot, percentiles, subqueries, advanced
window frames, UDAF/UDTF boundaries, null handling, limit/offset."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources import load_table
from . import register

def _vtag(sf_dir: str) -> str:
    # unique per sf_dir so concurrent runs across scale factors
    # can't clobber each other's temp views
    return "".join(c for c in sf_dir if c.isalnum())

from .relational_suite import _dsum, _dsum_sql


# --- pivot -----------------------------------------------------------------

def _pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .pivot("l_linestatus", ["F", "O"])
        .agg(F.count(F.lit(1)))
        .withColumnRenamed("F", "n_f")
        .withColumnRenamed("O", "n_o")
        .na.fill(0, ["n_f", "n_o"])
    )


register(
    "pivot_lineitem_status",
    _pivot,
    """
SELECT l_returnflag,
       count(*) FILTER (l_linestatus = 'F') AS n_f,
       count(*) FILTER (l_linestatus = 'O') AS n_o
FROM lineitem GROUP BY l_returnflag
""",
)


# --- exact percentiles ------------------------------------------------------

def _percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    return orders.groupBy("o_orderpriority").agg(
        F.round(F.expr("percentile(o_totalprice, 0.5)"), 4).alias("median_price"),
        F.round(F.expr("percentile(o_totalprice, 0.9)"), 4).alias("p90_price"),
        F.count(F.lit(1)).alias("n"),
    )


register(
    "percentiles_orders",
    _percentiles,
    """
SELECT o_orderpriority,
       round(quantile_cont(o_totalprice, 0.5), 4) AS median_price,
       round(quantile_cont(o_totalprice, 0.9), 4) AS p90_price,
       count(*) AS n
FROM orders GROUP BY o_orderpriority
""",
)


# --- subqueries -------------------------------------------------------------

def _scalar_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = _vtag(sf_dir)
    load_table(spark, sf_dir, "customer").createOrReplaceTempView(f"__cust_sq_{t}")
    load_table(spark, sf_dir, "orders").createOrReplaceTempView(f"__ord_sq_{t}")
    return spark.sql(
        f"""
        SELECT c_custkey, c_acctbal,
               (SELECT round(max(o_totalprice), 4) FROM __ord_sq_{t}
                WHERE o_custkey = c_custkey) AS max_order
        FROM __cust_sq_{t} WHERE c_custkey < 50
        """
    )


register(
    "correlated_scalar_subquery",
    _scalar_subquery,
    """
SELECT c_custkey, c_acctbal,
       (SELECT round(max(o_totalprice), 4) FROM orders
        WHERE o_custkey = c_custkey) AS max_order
FROM customer WHERE c_custkey < 50
""",
)


def _in_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = _vtag(sf_dir)
    load_table(spark, sf_dir, "customer").createOrReplaceTempView(f"__cust_in_{t}")
    load_table(spark, sf_dir, "orders").createOrReplaceTempView(f"__ord_in_{t}")
    return spark.sql(
        f"""
        SELECT c_custkey FROM __cust_in_{t}
        WHERE c_custkey IN (SELECT o_custkey FROM __ord_in_{t}
                            WHERE o_totalprice > 450000)
        """
    )


register(
    "in_subquery_customers",
    _in_subquery,
    """
SELECT c_custkey FROM customer
WHERE c_custkey IN (SELECT o_custkey FROM orders WHERE o_totalprice > 450000)
""",
)


# --- advanced window frames -------------------------------------------------

def _range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders").filter(F.col("o_custkey") < 20)
    w = (
        Window.partitionBy("o_custkey")
        .orderBy(F.col("o_totalprice"))
        .rangeBetween(-1000, 1000)
    )
    return orders.select(
        "o_orderkey",
        "o_custkey",
        F.count(F.lit(1)).over(w).alias("n_within_1k"),
    )


register(
    "window_range_frame",
    _range_frame,
    """
SELECT o_orderkey, o_custkey,
       count(*) OVER (PARTITION BY o_custkey ORDER BY o_totalprice
                      RANGE BETWEEN 1000 PRECEDING AND 1000 FOLLOWING) AS n_within_1k
FROM orders WHERE o_custkey < 20
""",
)


def _ntile_percent(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 500)
    w = Window.partitionBy("o_orderpriority").orderBy(
        F.col("o_totalprice").asc(), F.col("o_orderkey").asc()
    )
    return orders.select(
        "o_orderkey",
        "o_orderpriority",
        F.ntile(4).over(w).cast("long").alias("quartile"),
        F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
        F.round(F.cume_dist().over(w), 6).alias("cume"),
    )


register(
    "window_ntile_percent",
    _ntile_percent,
    """
SELECT o_orderkey, o_orderpriority,
       ntile(4) OVER w AS quartile,
       round(percent_rank() OVER w, 6) AS pct_rank,
       round(cume_dist() OVER w, 6) AS cume
FROM orders WHERE o_orderkey < 500
WINDOW w AS (PARTITION BY o_orderpriority ORDER BY o_totalprice ASC, o_orderkey ASC)
""",
)


# --- null handling ----------------------------------------------------------

def _null_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").filter(F.col("event_id") < 300)
    v = F.col("value")
    capped = F.nullif(v, F.lit(0.0))
    return ev.select(
        "event_id",
        F.round(F.coalesce(capped, F.lit(-1.0)), 6).alias("value_or_neg1"),
        F.round(F.least(v, F.lit(0.5)), 6).alias("capped_low"),
        F.round(F.greatest(v, F.lit(0.5)), 6).alias("capped_high"),
        v.isNull().alias("is_null"),
        F.isnan(v).alias("is_nan"),
    )


register(
    "null_handling_events",
    _null_funcs,
    """
SELECT event_id,
       round(coalesce(nullif(value, 0.0), -1.0), 6) AS value_or_neg1,
       round(least(value, 0.5), 6) AS capped_low,
       round(greatest(value, 0.5), 6) AS capped_high,
       value IS NULL AS is_null,
       isnan(value) AS is_nan
FROM events WHERE event_id < 300
""",
)


# --- limit / offset ---------------------------------------------------------

def _limit_offset(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        load_table(spark, sf_dir, "orders")
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey").asc())
        .offset(5)
        .limit(10)
        .select("o_orderkey", "o_totalprice")
    )


register(
    "limit_offset_orders",
    _limit_offset,
    """
SELECT o_orderkey, o_totalprice FROM orders
ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 10 OFFSET 5
""",
)


# --- UDAF: grouped-agg pandas_udf ------------------------------------------

def _udaf_grouped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom UDAF through the Arrow grouped-agg boundary. The UDAF
    sums integer-quantized value*k products, so the result is exact
    under any row order (float-sum order-dependence would flake the
    oracle hash)."""
    import numpy as np
    import pandas as pd
    from pyspark.sql.functions import PandasUDFType, pandas_udf

    # explicit functionType: the type-hint path can't resolve
    # annotations for locally-imported pandas under postponed evaluation
    @pandas_udf("long", PandasUDFType.GROUPED_AGG)
    def qsum_vk(v, k):
        # SQL-SUM null semantics: rows where either operand is NULL
        # contribute nothing; an all-NULL group yields the -1 sentinel
        # (SUM -> NULL -> COALESCE(-1) on the oracle side).
        mask = v.notna().to_numpy() & k.notna().to_numpy()
        if not mask.any():
            return -1
        vi = np.floor(v.to_numpy()[mask] * 1e6).astype("int64")
        ki = k.to_numpy()[mask].astype("int64")
        return int((vi * ki).sum())

    ev = load_table(spark, sf_dir, "events")
    k = F.get_json_object(F.col("props"), "$.k").cast("long")
    return (
        ev.withColumn("k", k)
        .groupBy("event_type")
        .agg(qsum_vk(F.col("value"), F.col("k")).cast("long").alias("qsum"))
    )


register(
    "udaf_grouped_events",
    _udaf_grouped,
    """
SELECT event_type,
       CAST(COALESCE(SUM(CAST(floor(value * 1000000.0) AS BIGINT)
                         * CAST(props->>'k' AS BIGINT)), -1) AS BIGINT) AS qsum
FROM events GROUP BY event_type
""",
)


# --- UDTF-style explode -----------------------------------------------------

def _bigram_explode(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.text import word_ngrams

    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 20)
    return docs.select(
        "doc_id",
        F.posexplode(word_ngrams("text", 2)).alias("pos", "bigram"),
    ).withColumn("pos", F.col("pos").cast("long"))


register(
    "udtf_bigram_explode",
    _bigram_explode,
    """
SELECT doc_id, u.pos, u.bigram
FROM (
  SELECT doc_id,
         unnest(list_transform(range(1, len(w)),
           i -> {'pos': i - 1, 'bigram': concat_ws(' ', w[i], w[i+1])})) AS u
  FROM (SELECT doc_id, string_split(text, ' ') AS w FROM documents
        WHERE doc_id < 20)
)
""",
)


# --- approximate aggregates (engine-specific -> rows-only) ------------------

def _approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HLL estimates are engine-specific, so the oracle can't reproduce
    them — instead the query emits a boolean ``within_tol`` computed
    from Spark's own estimate vs the exact count, and the oracle emits
    literal TRUE.  The driver hash then goes green exactly when the
    HLL estimate is within the documented 5% relative error, turning
    the old permanent ``no_oracle`` row into a real correctness gate."""
    li = load_table(spark, sf_dir, "lineitem")
    agg = li.groupBy("l_returnflag").agg(
        F.approx_count_distinct("l_partkey", rsd=0.02).alias("approx_parts"),
        F.countDistinct("l_partkey").alias("exact_parts"),
    )
    within = (
        F.abs(F.col("approx_parts") - F.col("exact_parts"))
        <= F.col("exact_parts") * F.lit(0.05)
    )
    return agg.select(
        "l_returnflag",
        F.col("exact_parts").cast("long").alias("exact_parts"),
        within.alias("within_tol"),
    )


register(
    "agg_approx_distinct",
    _approx_distinct,
    """
SELECT l_returnflag,
       CAST(count(DISTINCT l_partkey) AS BIGINT) AS exact_parts,
       TRUE AS within_tol
FROM lineitem GROUP BY l_returnflag
""",
)
