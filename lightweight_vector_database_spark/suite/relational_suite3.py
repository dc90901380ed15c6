"""Engine surface, part 3: TF-IDF, vector arithmetic, a 6-way TPC-H
Q5-style join, string distance, first/last/nth window values, date
series generation, nested struct / from_json."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.text import tokens
from ..sources import load_table
from . import register
from .relational_suite import _dsum, _dsum_sql


# --- TF-IDF ----------------------------------------------------------------

def _tfidf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 TF-IDF terms per doc (doc_id < 30). idf = ln((N+1)/(df+1))+1;
    integer tf/df counts -> the only float op is one ln + one divide,
    identical in both engines."""
    docs = load_table(spark, sf_dir, "documents")
    n_docs = docs.select(F.count(F.lit(1)).alias("n"))
    tf = (
        docs.select("doc_id", F.explode(tokens("text")).alias("term"))
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    df_counts = tf.groupBy("term").agg(F.countDistinct("doc_id").alias("df"))
    scored = (
        tf.join(F.broadcast(df_counts), "term")
        .join(F.broadcast(n_docs))
        .withColumn(
            "tfidf",
            F.round(
                F.col("tf")
                * (F.log((F.col("n") + 1) / (F.col("df") + 1)) + F.lit(1.0)),
                6,
            ),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(
        F.col("tfidf").desc(), F.col("term").asc()
    )
    return (
        scored.filter(F.col("doc_id") < 30)
        .withColumn("rnk", F.row_number().over(w).cast("long"))
        .filter(F.col("rnk") <= 3)
        .select("doc_id", "term", "tfidf", "rnk")
    )


register(
    "tfidf_top_terms",
    _tfidf,
    """
WITH tf AS (
  SELECT doc_id, term, count(*) AS tf
  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents)
  GROUP BY doc_id, term
), dfc AS (
  SELECT term, count(DISTINCT doc_id) AS df FROM tf GROUP BY term
), n AS (SELECT count(*) AS n FROM documents),
scored AS (
  SELECT tf.doc_id, tf.term,
         round(tf.tf * (ln((n.n + 1.0) / (dfc.df + 1.0)) + 1.0), 6) AS tfidf
  FROM tf JOIN dfc USING (term) CROSS JOIN n
)
SELECT doc_id, term, tfidf, rnk FROM (
  SELECT doc_id, term, tfidf,
         row_number() OVER (PARTITION BY doc_id
                            ORDER BY tfidf DESC, term ASC) AS rnk
  FROM scored WHERE doc_id < 30
) WHERE rnk <= 3
""",
)


# --- vector arithmetic ------------------------------------------------------

def _vector_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Normalize / scale / add as higher-order functions (vec_id < 30):
    the vector-math surface beyond distances."""
    emb = load_table(spark, sf_dir, "embeddings").filter(F.col("vec_id") < 30)
    v = F.col("embedding").cast("array<double>")
    norm = F.sqrt(F.aggregate(F.zip_with(v, v, lambda a, b: a * b), F.lit(0.0), lambda acc, x: acc + x))
    unit = F.transform(v, lambda x: x / norm)
    return emb.select(
        "vec_id",
        F.round(norm, 6).alias("l2"),
        F.round(F.element_at(unit, 1), 6).alias("unit_0"),
        F.round(
            F.aggregate(
                F.zip_with(unit, unit, lambda a, b: a * b),
                F.lit(0.0),
                lambda acc, x: acc + x,
            ),
            6,
        ).alias("unit_norm_sq"),
        F.round(F.element_at(F.transform(v, lambda x: x * 2.0 + 1.0), 2), 6).alias(
            "scaled_1"
        ),
    )


register(
    "vector_arithmetic",
    _vector_ops,
    """
WITH v AS (
  SELECT vec_id,
         list_transform(embedding, x -> CAST(x AS DOUBLE)) AS vd
  FROM embeddings WHERE vec_id < 30
), n AS (
  SELECT vec_id, vd,
         sqrt(list_sum(list_transform(vd, x -> x * x))) AS l2 FROM v
)
SELECT vec_id, round(l2, 6) AS l2,
       round(vd[1] / l2, 6) AS unit_0,
       round(list_sum(list_transform(vd, x -> (x / l2) * (x / l2))), 6) AS unit_norm_sq,
       round(vd[2] * 2.0 + 1.0, 6) AS scaled_1
FROM n
""",
)


# --- Q5-style 6-way join ----------------------------------------------------

def _q5(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    revenue = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("r_name", "n_name")
        .agg(_dsum(revenue, 4).alias("revenue"), F.count(F.lit(1)).alias("n_items"))
    )


register(
    "q5_revenue_by_nation",
    _q5,
    f"""
SELECT r_name, n_name,
       {_dsum_sql('l_extendedprice * (1 - l_discount)', 4)} AS revenue,
       count(*) AS n_items
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey  = c_custkey
JOIN supplier ON l_suppkey  = s_suppkey
JOIN nation   ON s_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
GROUP BY r_name, n_name
""",
)


# --- string distance --------------------------------------------------------

def _string_distance(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load_table(spark, sf_dir, "part").filter(F.col("p_partkey") < 60)
    return part.select(
        "p_partkey",
        F.levenshtein(F.col("p_brand"), F.lit("Brand#22")).cast("long").alias(
            "lev_to_b22"
        ),
        F.levenshtein(
            F.split(F.col("p_name"), " ").getItem(0),
            F.split(F.col("p_name"), " ").getItem(1),
        ).cast("long").alias("lev_first_two"),
    )


register(
    "string_distance_part",
    _string_distance,
    """
SELECT p_partkey,
       CAST(levenshtein(p_brand, 'Brand#22') AS BIGINT) AS lev_to_b22,
       CAST(levenshtein(split_part(p_name, ' ', 1),
                        split_part(p_name, ' ', 2)) AS BIGINT) AS lev_first_two
FROM part WHERE p_partkey < 60
""",
)


# --- first/last/nth window values ------------------------------------------

def _first_last(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders").filter(F.col("o_custkey") < 30)
    w = (
        Window.partitionBy("o_custkey")
        .orderBy(F.col("o_orderdate").asc(), F.col("o_orderkey").asc())
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    return orders.select(
        "o_orderkey",
        "o_custkey",
        F.first("o_orderkey").over(w).alias("first_order"),
        F.last("o_orderkey").over(w).alias("last_order"),
        F.nth_value("o_orderkey", 2).over(w).alias("second_order"),
    )


register(
    "window_first_last_nth",
    _first_last,
    """
SELECT o_orderkey, o_custkey,
       first_value(o_orderkey) OVER w AS first_order,
       last_value(o_orderkey) OVER w AS last_order,
       nth_value(o_orderkey, 2) OVER w AS second_order
FROM orders WHERE o_custkey < 30
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate ASC, o_orderkey ASC
             ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
""",
)


# --- generated date series --------------------------------------------------

def _date_series(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Calendar generation (sequence + explode) left-joined with order
    counts per month — the time-dimension pattern."""
    orders = load_table(spark, sf_dir, "orders")
    months = spark.range(1).select(
        F.explode(
            F.sequence(
                F.lit("1995-01-01").cast("date"),
                F.lit("1996-12-01").cast("date"),
                F.expr("interval 1 month"),
            )
        ).alias("month_start")
    )
    per_month = orders.groupBy(
        F.date_trunc("month", F.col("o_orderdate")).cast("date").alias("month_start")
    ).agg(F.count(F.lit(1)).alias("n_orders"))
    return (
        months.join(per_month, "month_start", "left")
        .na.fill(0, ["n_orders"])
        .select(
            F.date_format("month_start", "yyyy-MM-dd").alias("month"), "n_orders"
        )
    )


register(
    "date_series_order_counts",
    _date_series,
    """
WITH months AS (
  SELECT unnest(generate_series(DATE '1995-01-01', DATE '1996-12-01',
                                INTERVAL 1 MONTH))::DATE AS month_start
), per_month AS (
  SELECT date_trunc('month', o_orderdate)::DATE AS month_start,
         count(*) AS n_orders
  FROM orders GROUP BY 1
)
SELECT strftime(m.month_start, '%Y-%m-%d') AS month,
       coalesce(p.n_orders, 0) AS n_orders
FROM months m LEFT JOIN per_month p USING (month_start)
""",
)


# --- Q7-ish: supplier-vs-customer nation volume by year --------------------

def _q7(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    n1 = nation.select(
        F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("supp_nation")
    )
    n2 = nation.select(
        F.col("n_nationkey").alias("c_nk"), F.col("n_name").alias("cust_nation")
    )
    revenue = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(n1), supp.s_nationkey == n1.s_nk)
        .join(F.broadcast(n2), cust.c_nationkey == n2.c_nk)
        .filter(F.col("supp_nation") != F.col("cust_nation"))
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year(F.col("l_shipdate")).cast("long").alias("l_year"),
        )
        .agg(_dsum(revenue, 4).alias("revenue"))
    )


register(
    "q7_nation_volume",
    _q7,
    f"""
SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
       CAST(year(l_shipdate) AS BIGINT) AS l_year,
       {_dsum_sql('l_extendedprice * (1 - l_discount)', 4)} AS revenue
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey  = c_custkey
JOIN supplier ON l_suppkey  = s_suppkey
JOIN nation n1 ON s_nationkey = n1.n_nationkey
JOIN nation n2 ON c_nationkey = n2.n_nationkey
WHERE n1.n_name <> n2.n_name
GROUP BY 1, 2, 3
""",
)


# --- Q10-ish: top returned-revenue customers --------------------------------

def _q10(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    revenue = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .groupBy("c_custkey", "c_name")
        .agg(_dsum(revenue, 4).alias("lost_revenue"))
        .orderBy(F.col("lost_revenue").desc(), F.col("c_custkey").asc())
        .limit(20)
    )


register(
    "q10_returned_revenue",
    _q10,
    f"""
SELECT c_custkey, c_name,
       {_dsum_sql('l_extendedprice * (1 - l_discount)', 4)} AS lost_revenue
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey  = c_custkey
WHERE l_returnflag = 'R'
GROUP BY c_custkey, c_name
ORDER BY lost_revenue DESC, c_custkey ASC
LIMIT 20
""",
)


# --- generic per-group top-k (operators/topk.py) ----------------------------

def _topk_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.topk import topk_per_group

    li = load_table(spark, sf_dir, "lineitem")
    out = topk_per_group(
        li,
        ["l_suppkey"],
        "l_extendedprice",
        k=2,
        tiebreak=["l_orderkey", "l_linenumber"],
    )
    return out.select(
        "l_suppkey",
        "l_orderkey",
        F.col("l_linenumber").cast("long").alias("line_no"),
        "l_extendedprice",
        F.col("rank").cast("long").alias("rank"),
    )


register(
    "topk_per_supplier",
    _topk_group,
    """
SELECT l_suppkey, l_orderkey, CAST(l_linenumber AS BIGINT) AS line_no,
       l_extendedprice, rank FROM (
  SELECT l_suppkey, l_orderkey, l_linenumber, l_extendedprice,
         row_number() OVER (PARTITION BY l_suppkey
                            ORDER BY l_extendedprice DESC, l_orderkey ASC,
                                     l_linenumber ASC) AS rank
  FROM lineitem
) WHERE rank <= 2
""",
)


# --- aggregate extras: min_by/max_by, sorted list agg, bool aggs ------------

def _agg_extras(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    # make the ordering value unique so min_by/max_by ties can't differ
    # between engines: price + orderkey * 1e-9 is injective here
    uniq = F.col("o_totalprice") + F.col("o_orderkey") / F.lit(1e9)
    return (
        orders.withColumn("__u", uniq)
        .groupBy("o_orderpriority")
        .agg(
            F.expr("max_by(o_orderkey, __u)").alias("top_order"),
            F.expr("min_by(o_orderkey, __u)").alias("bottom_order"),
            F.sort_array(F.collect_set("o_orderstatus")).alias("statuses"),
            F.every(F.col("o_totalprice") > 0).alias("all_positive"),
            F.bool_or(F.col("o_totalprice") > 450_000).alias("any_jumbo"),
        )
    )


register(
    "agg_extras_orders",
    _agg_extras,
    """
SELECT o_orderpriority,
       arg_max(o_orderkey, o_totalprice + o_orderkey / 1000000000.0) AS top_order,
       arg_min(o_orderkey, o_totalprice + o_orderkey / 1000000000.0) AS bottom_order,
       list_sort(list_distinct(list(o_orderstatus))) AS statuses,
       bool_and(o_totalprice > 0) AS all_positive,
       bool_or(o_totalprice > 450000) AS any_jumbo
FROM orders GROUP BY o_orderpriority
""",
)


# --- Q6-style: forecast revenue change (filter -> single-row agg) -----------

def _q6(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01 00:00:00").cast("timestamp"))
            & (F.col("l_discount") >= 0.05)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            _dsum(F.col("l_extendedprice") * F.col("l_discount"), 4).alias("revenue"),
            F.count(F.lit(1)).alias("n"),
        )
    )


register(
    "q6_forecast_revenue",
    _q6,
    f"""
SELECT {_dsum_sql('l_extendedprice * l_discount', 4)} AS revenue, count(*) AS n
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
  AND l_discount BETWEEN 0.05 AND 0.07
  AND l_quantity < 24
""",
)


# --- Q4-style: order priority counts with EXISTS ----------------------------

def _q4(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01 00:00:00").cast("timestamp"))
    )
    late_lines = load_table(spark, sf_dir, "lineitem")
    # semi join: orders having at least one lineitem shipped after the
    # order date (the fixture's analogue of commit < receipt)
    with_late = orders.join(
        late_lines,
        (orders.o_orderkey == late_lines.l_orderkey)
        & (late_lines.l_shipdate > orders.o_orderdate),
        "left_semi",
    )
    return with_late.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("order_count")
    )


register(
    "q4_priority_counts",
    _q4,
    """
SELECT o_orderpriority, count(*) AS order_count
FROM orders
WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'
  AND EXISTS (SELECT 1 FROM lineitem
              WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate)
GROUP BY o_orderpriority
""",
)


# --- unpivot (melt) ---------------------------------------------------------

def _unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wide -> long: melt per-part numeric attributes into
    (attribute, value) rows."""
    part = load_table(spark, sf_dir, "part").filter(F.col("p_partkey") < 60)
    wide = part.select(
        "p_partkey",
        F.col("p_size").cast("double").alias("size"),
        F.col("p_retailprice").alias("retailprice"),
    )
    return wide.unpivot(
        ["p_partkey"], ["size", "retailprice"], "attribute", "value"
    )


register(
    "unpivot_part_attrs",
    _unpivot,
    """
SELECT p_partkey, attribute, value FROM (
  SELECT p_partkey, CAST(p_size AS DOUBLE) AS size, p_retailprice AS retailprice
  FROM part WHERE p_partkey < 60
) UNPIVOT (value FOR attribute IN (size, retailprice))
""",
)


# --- statistical aggregates: corr/covar from quantized component sums -------

def _stats_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pearson corr + covariance of (quantity, discount) per returnflag,
    assembled from floor-quantized integer component sums (sum x, sum y,
    sum xy, sum x^2, sum y^2) so the float math happens once, on
    identical inputs, in both engines."""
    li = load_table(spark, sf_dir, "lineitem")
    s = 1e4
    qx = F.floor(F.col("l_quantity") * s).cast("long")
    qy = F.floor(F.col("l_discount") * s).cast("long")
    agg = li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(qx).alias("sx"),
        F.sum(qy).alias("sy"),
        F.sum(qx * qy).alias("sxy"),
        F.sum(qx * qx).alias("sxx"),
        F.sum(qy * qy).alias("syy"),
    )
    n = F.col("n").cast("double")
    sx, sy = F.col("sx").cast("double"), F.col("sy").cast("double")
    sxy = F.col("sxy").cast("double")
    sxx, syy = F.col("sxx").cast("double"), F.col("syy").cast("double")
    cov = (sxy - sx * sy / n) / n / F.lit(s * s)
    corr = (n * sxy - sx * sy) / (
        F.sqrt(n * sxx - sx * sx) * F.sqrt(n * syy - sy * sy)
    )
    return agg.select(
        "l_returnflag",
        "n",
        F.round(cov, 8).alias("cov_qty_disc"),
        F.round(corr, 8).alias("corr_qty_disc"),
    )


register(
    "agg_stats_corr",
    _stats_agg,
    """
WITH q AS (
  SELECT l_returnflag,
         CAST(floor(l_quantity * 10000.0) AS BIGINT) AS qx,
         CAST(floor(l_discount * 10000.0) AS BIGINT) AS qy
  FROM lineitem
), a AS (
  SELECT l_returnflag, count(*) AS n,
         SUM(qx) AS sx, SUM(qy) AS sy, SUM(qx * qy) AS sxy,
         SUM(qx * qx) AS sxx, SUM(qy * qy) AS syy
  FROM q GROUP BY l_returnflag
)
SELECT l_returnflag, n,
       round((CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE)
              / CAST(n AS DOUBLE)) / CAST(n AS DOUBLE) / 100000000.0, 8)
         AS cov_qty_disc,
       round((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
              - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
             / (sqrt(CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                     - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                * sqrt(CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
                       - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))), 8)
         AS corr_qty_disc
FROM a
""",
)


def _approx_percentile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """approx_percentile (Greenwald-Khanna sketch) promoted to an
    EXACT oracle the same way as agg_approx_distinct: output the exact
    interpolated median plus a within-tolerance flag. GK with accuracy
    A returns an element whose RANK is within n/A of the target, so
    its value must lie between the exact quantiles at p +- 1/A (2/A
    used for slack); the oracle recomputes the exact columns and pins
    the flag to literal TRUE — the hash goes green exactly when the
    sketch honors its documented error bound."""
    orders = load_table(spark, sf_dir, "orders")
    agg = orders.groupBy("o_orderstatus").agg(
        F.expr("approx_percentile(o_totalprice, 0.5, 1000)").alias("__approx"),
        F.expr("percentile(o_totalprice, 0.5)").alias("__exact"),
        F.expr("percentile(o_totalprice, 0.498)").alias("__lo"),
        F.expr("percentile(o_totalprice, 0.502)").alias("__hi"),
        F.count(F.lit(1)).alias("n"),
    )
    within = (F.col("__approx") >= F.col("__lo")) & (
        F.col("__approx") <= F.col("__hi")
    )
    return agg.select(
        "o_orderstatus",
        F.round(F.col("__exact"), 2).alias("exact_median"),
        F.col("n"),
        within.alias("within_tol"),
    )


register(
    "agg_approx_percentile",
    _approx_percentile,
    """
SELECT o_orderstatus,
       round(quantile_cont(o_totalprice, 0.5), 2) AS exact_median,
       count(*) AS n,
       TRUE AS within_tol
FROM orders GROUP BY o_orderstatus
""",
)


# --- nested struct / from_json ---------------------------------------------

def _struct_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").filter(F.col("event_id") < 200)
    parsed = F.from_json(F.col("props"), "k int")
    nested = F.struct(
        F.col("event_type").alias("etype"),
        parsed["k"].alias("k"),
    )
    return ev.withColumn("info", nested).select(
        "event_id",
        F.col("info.etype").alias("etype"),
        (F.col("info.k") * 2).cast("long").alias("k2"),
        F.to_json(F.struct(F.col("info.k").alias("k"))).alias("rejson"),
    )


register(
    "struct_json_events",
    _struct_json,
    """
SELECT event_id, event_type AS etype,
       CAST(CAST(props->>'k' AS INTEGER) * 2 AS BIGINT) AS k2,
       concat('{"k":', CAST(props->>'k' AS INTEGER), '}') AS rejson
FROM events WHERE event_id < 200
""",
)
