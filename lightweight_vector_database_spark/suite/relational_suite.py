"""Relational engine surface (SURVEY.md §2B) over the TPC-H-ish tables.

Determinism rules applied uniformly so the driver's value hash matches
DuckDB exactly:

- Cross-row float sums are NEVER done in double (addition order is
  nondeterministic under parallel aggregation): per-row values are
  rounded, cast to DECIMAL, summed exactly, and the final result cast
  back to double. Same formula on both sides.
- Averages = exact decimal sum cast to double, divided by the count
  (one double division of identical operands).
- Timestamps in outputs go through epoch-micros (long) or an explicit
  yyyy-MM-dd string — never raw timestamp collection.
- Every top-k / rank has a total tie-break.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..operators.asof import asof_join
from ..sources import load_table
from . import register

def _vtag(sf_dir: str) -> str:
    # unique per sf_dir so concurrent runs across scale factors
    # can't clobber each other's temp views
    return "".join(c for c in sf_dir if c.isalnum())



def _dsum(col, scale: int = 2):
    """Exact distributed sum of a double column: floor-quantize to an
    integer grid (IEEE multiply + floor are bit-identical in Spark and
    DuckDB — unlike round(), which the two engines implement
    differently at decimal halfway points), sum exactly as BIGINT,
    rescale. Deterministic under any partitioning."""
    s = float(10**scale)
    return F.sum(F.floor(col * F.lit(s)).cast("long")).cast("double") / F.lit(s)


def _dsum_sql(expr: str, scale: int = 2) -> str:
    s = float(10**scale)
    return f"(CAST(SUM(CAST(floor(({expr}) * {s}) AS BIGINT)) AS DOUBLE) / {s})"


# --- Q1: pricing summary (scan -> filter -> hash agg) -----------------

def _q1(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            _dsum(F.col("l_quantity")).alias("sum_qty"),
            _dsum(F.col("l_extendedprice")).alias("sum_base_price"),
            _dsum(disc_price, 4).alias("sum_disc_price"),
            _dsum(charge, 4).alias("sum_charge"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .withColumn("avg_qty", F.round(F.col("sum_qty") / F.col("count_order"), 6))
        .withColumn(
            "avg_price", F.round(F.col("sum_base_price") / F.col("count_order"), 6)
        )
    )


_Q1_ORACLE = f"""
SELECT l_returnflag, l_linestatus,
       {_dsum_sql('l_quantity')} AS sum_qty,
       {_dsum_sql('l_extendedprice')} AS sum_base_price,
       {_dsum_sql('l_extendedprice * (1 - l_discount)', 4)} AS sum_disc_price,
       {_dsum_sql('l_extendedprice * (1 - l_discount) * (1 + l_tax)', 4)} AS sum_charge,
       count(*) AS count_order,
       round({_dsum_sql('l_quantity')} / count(*), 6) AS avg_qty,
       round({_dsum_sql('l_extendedprice')} / count(*), 6) AS avg_price
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
"""

register("q1_pricing_summary", _q1, _Q1_ORACLE)


# --- Q3-ish: 3-way join + agg + top-k ---------------------------------

def _q3(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    revenue = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .groupBy("l_orderkey")
        .agg(_dsum(revenue, 4).alias("revenue"))
        .orderBy(F.col("revenue").desc(), F.col("l_orderkey").asc())
        .limit(10)
    )


_Q3_ORACLE = f"""
SELECT l_orderkey, {_dsum_sql('l_extendedprice * (1 - l_discount)', 4)} AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
WHERE c_mktsegment = 'BUILDING'
GROUP BY l_orderkey
ORDER BY revenue DESC, l_orderkey ASC
LIMIT 10
"""

register("q3_top_revenue_orders", _q3, _Q3_ORACLE)


# --- broadcast join: nation x region ----------------------------------

def _join_broadcast(spark: SparkSession, sf_dir: str) -> DataFrame:
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    return (
        nation.join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("r_name")
        .agg(F.count(F.lit(1)).alias("n_nations"))
    )


register(
    "join_broadcast_nation_region",
    _join_broadcast,
    """
SELECT r_name, count(*) AS n_nations
FROM nation JOIN region ON n_regionkey = r_regionkey
GROUP BY r_name
""",
)


# --- semi / anti joins -------------------------------------------------

def _join_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left_semi")
        .groupBy("c_mktsegment")
        .agg(F.count(F.lit(1)).alias("n_cust"))
    )


register(
    "join_semi_customers_with_orders",
    _join_semi,
    """
SELECT c_mktsegment, count(*) AS n_cust
FROM customer
WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
GROUP BY c_mktsegment
""",
)


def _join_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    big = load_table(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 400_000)
    return cust.join(big, cust.c_custkey == big.o_custkey, "left_anti").select(
        "c_custkey", "c_name"
    )


register(
    "join_anti_customers_without_big_orders",
    _join_anti,
    """
SELECT c_custkey, c_name FROM customer
WHERE NOT EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey AND o_totalprice > 400000)
""",
)


# --- theta / range join ------------------------------------------------

def _join_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    supp = load_table(spark, sf_dir, "supplier")
    cust = load_table(spark, sf_dir, "customer")
    cond = (cust.c_acctbal >= supp.s_acctbal - 500) & (cust.c_acctbal <= supp.s_acctbal)
    return (
        cust.join(F.broadcast(supp), cond)
        .groupBy("s_suppkey")
        .agg(F.count(F.lit(1)).alias("n_cust"))
    )


register(
    "join_range_acctbal",
    _join_range,
    """
SELECT s_suppkey, count(*) AS n_cust
FROM customer JOIN supplier
  ON c_acctbal >= s_acctbal - 500 AND c_acctbal <= s_acctbal
GROUP BY s_suppkey
""",
)


# --- as-of join: each purchase -> user's latest prior click ------------

def _asof_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts", "value"
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts", "value"
    )
    out = asof_join(
        purchases,
        clicks.withColumnRenamed("event_id", "click_id").withColumnRenamed(
            "ts", "click_ts"
        ),
        on=["user_id"],
        left_ts="ts",
        right_ts="click_ts",
        right_cols=["click_id", "click_ts", "value"],
        tiebreak="click_id",
        prefix="last_",
    )
    return out.select(
        "event_id",
        "user_id",
        F.unix_micros(F.col("ts")).alias("ts_us"),
        F.col("last_click_id"),
        F.unix_micros(F.col("last_click_ts")).alias("last_click_ts_us"),
        F.round(F.col("last_value"), 6).alias("last_click_value"),
    )


_ASOF_ORACLE = """
WITH purchases AS (
  SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase'
), clicks AS (
  SELECT event_id AS click_id, user_id, ts AS click_ts, value FROM events
  WHERE event_type = 'click'
), ranked AS (
  SELECT p.event_id, p.user_id, p.ts, c.click_id, c.click_ts, c.value,
         row_number() OVER (
           PARTITION BY p.event_id
           ORDER BY c.click_ts DESC NULLS LAST, c.click_id DESC NULLS LAST
         ) AS rn
  FROM purchases p
  LEFT JOIN clicks c ON c.user_id = p.user_id AND c.click_ts <= p.ts
)
SELECT event_id, user_id, epoch_us(ts) AS ts_us, click_id AS last_click_id,
       epoch_us(click_ts) AS last_click_ts_us,
       round(value, 6) AS last_click_value
FROM ranked WHERE rn = 1
"""

register("asof_join_purchase_click", _asof_events, _ASOF_ORACLE)


# --- rollup / cube / grouping sets ------------------------------------

def _rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.rollup("l_returnflag", "l_linestatus").agg(
        F.count(F.lit(1)).alias("n"), _dsum(F.col("l_quantity")).alias("sum_qty")
    )


register(
    "agg_rollup_lineitem",
    _rollup,
    f"""
SELECT l_returnflag, l_linestatus, count(*) AS n, {_dsum_sql('l_quantity')} AS sum_qty
FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
""",
)


def _cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    return orders.cube("o_orderstatus", "o_orderpriority").agg(
        F.count(F.lit(1)).alias("n")
    )


register(
    "agg_cube_orders",
    _cube,
    """
SELECT o_orderstatus, o_orderpriority, count(*) AS n
FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)
""",
)


def _grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    view = f"__li_gs_{_vtag(sf_dir)}"
    load_table(spark, sf_dir, "lineitem").createOrReplaceTempView(view)
    return spark.sql(
        f"""
        SELECT l_returnflag, l_linestatus, count(*) AS n
        FROM {view}
        GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
        """
    )


register(
    "agg_grouping_sets",
    _grouping_sets,
    """
SELECT l_returnflag, l_linestatus, count(*) AS n
FROM lineitem GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
""",
)


# --- window functions ---------------------------------------------------

def _window_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders").filter(F.col("o_custkey") < 100)
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey").asc()
    )
    return (
        orders.withColumn("rnk", F.row_number().over(w).cast("long"))
        .filter(F.col("rnk") <= 3)
        .select("o_custkey", "o_orderkey", "o_totalprice", "rnk")
    )


register(
    "window_rank_orders",
    _window_rank,
    """
SELECT o_custkey, o_orderkey, o_totalprice, rnk FROM (
  SELECT o_custkey, o_orderkey, o_totalprice,
         row_number() OVER (PARTITION BY o_custkey
                            ORDER BY o_totalprice DESC, o_orderkey ASC) AS rnk
  FROM orders WHERE o_custkey < 100
) WHERE rnk <= 3
""",
)


def _window_running(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").filter(F.col("user_id") < 20)
    w = Window.partitionBy("user_id").orderBy(F.col("ts").asc(), F.col("event_id").asc())
    run = F.sum(F.floor(F.col("value") * F.lit(1e6)).cast("long")).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    ).cast("double") / F.lit(1e6)
    delta = F.col("value") - F.lag("value", 1).over(w)
    return ev.select(
        "event_id",
        "user_id",
        F.round(run, 6).alias("running_value"),
        F.round(delta, 6).alias("delta_prev"),
    )


register(
    "window_running_events",
    _window_running,
    """
SELECT event_id, user_id,
       round(CAST(sum(CAST(floor(value * 1000000.0) AS BIGINT)) OVER (
         PARTITION BY user_id ORDER BY ts ASC, event_id ASC
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) / 1000000.0, 6) AS running_value,
       round(value - lag(value, 1) OVER (
         PARTITION BY user_id ORDER BY ts ASC, event_id ASC), 6) AS delta_prev
FROM events WHERE user_id < 20
""",
)


# --- global top-k -------------------------------------------------------

def _topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        load_table(spark, sf_dir, "orders")
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey").asc())
        .limit(20)
        .select("o_orderkey", "o_totalprice")
    )


register(
    "topk_orders_by_price",
    _topk,
    "SELECT o_orderkey, o_totalprice FROM orders ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 20",
)


# --- set operations ------------------------------------------------------

def _set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    rich = cust.filter(F.col("c_acctbal") > 1000).select(
        F.col("c_custkey").alias("custkey")
    )
    buyers = orders.select(F.col("o_custkey").alias("custkey")).distinct()
    both = rich.intersect(buyers).withColumn("tag", F.lit("rich_buyer"))
    only_rich = rich.exceptAll(buyers).withColumn("tag", F.lit("rich_only"))
    return both.unionByName(only_rich)


register(
    "set_ops_customers",
    _set_ops,
    """
WITH rich AS (SELECT c_custkey AS custkey FROM customer WHERE c_acctbal > 1000),
     buyers AS (SELECT DISTINCT o_custkey AS custkey FROM orders)
SELECT custkey, 'rich_buyer' AS tag FROM (SELECT * FROM rich INTERSECT SELECT * FROM buyers)
UNION ALL
SELECT custkey, 'rich_only' AS tag FROM (SELECT * FROM rich EXCEPT ALL SELECT * FROM buyers)
""",
)


# --- scalar functions: string / date / math / array / json --------------

def _string_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load_table(spark, sf_dir, "part").filter(F.col("p_partkey") < 100)
    return part.select(
        "p_partkey",
        F.upper(F.col("p_name")).alias("name_upper"),
        F.length(F.col("p_name")).cast("long").alias("name_len"),
        F.split(F.col("p_name"), " ").getItem(0).alias("first_word"),
        F.size(F.split(F.col("p_type"), " ")).cast("long").alias("type_words"),
        F.substring(F.col("p_brand"), 7, 2).alias("brand_code"),
        F.col("p_name").like("%green%").alias("has_green"),
        F.concat_ws("|", F.col("p_brand"), F.col("p_type")).alias("brand_type"),
        F.regexp_extract(F.col("p_name"), "([a-z]+)", 1).alias("first_lower_run"),
        F.trim(F.lit("  pad  ")).alias("trimmed"),
    )


register(
    "scalar_string_part",
    _string_funcs,
    """
SELECT p_partkey,
       upper(p_name) AS name_upper,
       CAST(length(p_name) AS BIGINT) AS name_len,
       split_part(p_name, ' ', 1) AS first_word,
       CAST(length(string_split(p_type, ' ')) AS BIGINT) AS type_words,
       substring(p_brand, 7, 2) AS brand_code,
       p_name LIKE '%green%' AS has_green,
       concat_ws('|', p_brand, p_type) AS brand_type,
       coalesce(regexp_extract(p_name, '([a-z]+)', 1), '') AS first_lower_run,
       trim('  pad  ') AS trimmed
FROM part WHERE p_partkey < 100
""",
)


def _date_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 200)
    d = F.col("o_orderdate")
    return orders.select(
        "o_orderkey",
        F.year(d).cast("long").alias("yr"),
        F.month(d).cast("long").alias("mon"),
        F.dayofmonth(d).cast("long").alias("dom"),
        F.quarter(d).cast("long").alias("qtr"),
        F.date_format(F.date_trunc("month", d), "yyyy-MM-dd").alias("month_start"),
        F.datediff(F.lit("2000-01-01").cast("date"), d.cast("date"))
        .cast("long")
        .alias("days_to_y2k"),
        F.date_format(F.date_add(d.cast("date"), 30), "yyyy-MM-dd").alias("plus_30d"),
    )


register(
    "scalar_date_orders",
    _date_funcs,
    """
SELECT o_orderkey,
       CAST(year(o_orderdate) AS BIGINT) AS yr,
       CAST(month(o_orderdate) AS BIGINT) AS mon,
       CAST(day(o_orderdate) AS BIGINT) AS dom,
       CAST(quarter(o_orderdate) AS BIGINT) AS qtr,
       strftime(date_trunc('month', o_orderdate), '%Y-%m-%d') AS month_start,
       CAST(date_diff('day', CAST(o_orderdate AS DATE), DATE '2000-01-01') AS BIGINT) AS days_to_y2k,
       strftime(CAST(o_orderdate AS DATE) + INTERVAL 30 DAY, '%Y-%m-%d') AS plus_30d
FROM orders WHERE o_orderkey < 200
""",
)


def _math_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") < 100)
    q = F.col("l_quantity")
    return li.select(
        "l_orderkey",
        F.col("l_linenumber").cast("long").alias("line_no"),
        F.round(F.sqrt(q), 6).alias("sqrt_qty"),
        F.round(F.pow(q, 2), 6).alias("qty_sq"),
        F.round(F.log(q + 1), 6).alias("log_qty"),
        F.round(F.abs(F.col("l_discount") - 0.05), 6).alias("abs_disc_delta"),
        F.floor(F.col("l_extendedprice")).cast("long").alias("price_floor"),
        F.ceil(F.col("l_extendedprice")).cast("long").alias("price_ceil"),
    )


register(
    "scalar_math_lineitem",
    _math_funcs,
    """
SELECT l_orderkey,
       CAST(l_linenumber AS BIGINT) AS line_no,
       round(sqrt(l_quantity), 6) AS sqrt_qty,
       round(pow(l_quantity, 2), 6) AS qty_sq,
       round(ln(l_quantity + 1), 6) AS log_qty,
       round(abs(l_discount - 0.05), 6) AS abs_disc_delta,
       CAST(floor(l_extendedprice) AS BIGINT) AS price_floor,
       CAST(ceil(l_extendedprice) AS BIGINT) AS price_ceil
FROM lineitem WHERE l_orderkey < 100
""",
)


def _array_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings").filter(F.col("vec_id") < 50)
    arr = F.col("embedding").cast("array<double>")
    head4 = F.slice(arr, 1, 4)
    return emb.select(
        "vec_id",
        F.size(F.col("embedding")).cast("long").alias("dim"),
        F.round(F.array_max(arr), 6).alias("vmax"),
        F.round(F.array_min(arr), 6).alias("vmin"),
        F.round(
            F.aggregate(head4, F.lit(0.0), lambda acc, v: acc + v), 6
        ).alias("head4_sum"),
        F.round(F.element_at(arr, 1), 6).alias("first_coord"),
    )


register(
    "scalar_array_embeddings",
    _array_funcs,
    """
SELECT vec_id,
       CAST(len(embedding) AS BIGINT) AS dim,
       round(list_max(list_transform(embedding, x -> CAST(x AS DOUBLE))), 6) AS vmax,
       round(list_min(list_transform(embedding, x -> CAST(x AS DOUBLE))), 6) AS vmin,
       round(list_sum(list_transform(embedding[1:4], x -> CAST(x AS DOUBLE))), 6) AS head4_sum,
       round(CAST(embedding[1] AS DOUBLE), 6) AS first_coord
FROM embeddings WHERE vec_id < 50
""",
)


def _json_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Hash-canonical formulation: nullable integer aggregates are
    # coalesced to -1 on BOTH engines (a NULL bigint turns the whole
    # pandas column into float64 NaN on one side but not the other),
    # and n_with_k carries the null count explicitly.
    ev = load_table(spark, sf_dir, "events")
    k = F.get_json_object(F.col("props"), "$.k").cast("long")
    return (
        ev.withColumn("k", k)
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.count("k").alias("n_with_k"),
            F.coalesce(F.sum("k"), F.lit(-1)).cast("long").alias("sum_k"),
            F.coalesce(F.min("k"), F.lit(-1)).cast("long").alias("min_k"),
            F.coalesce(F.max("k"), F.lit(-1)).cast("long").alias("max_k"),
        )
    )


register(
    "scalar_json_events",
    _json_funcs,
    """
SELECT event_type, count(*) AS n,
       COUNT(CAST(props->>'k' AS BIGINT)) AS n_with_k,
       CAST(COALESCE(SUM(CAST(props->>'k' AS BIGINT)), -1) AS BIGINT) AS sum_k,
       CAST(COALESCE(MIN(CAST(props->>'k' AS BIGINT)), -1) AS BIGINT) AS min_k,
       CAST(COALESCE(MAX(CAST(props->>'k' AS BIGINT)), -1) AS BIGINT) AS max_k
FROM events GROUP BY event_type
""",
)


# --- distinct aggregates / having / case-when ---------------------------

def _distinct_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.countDistinct("l_suppkey").alias("n_supp"),
        F.countDistinct("l_partkey").alias("n_part"),
        F.count(F.lit(1)).alias("n"),
    )


register(
    "agg_distinct_lineitem",
    _distinct_agg,
    """
SELECT l_returnflag, count(DISTINCT l_suppkey) AS n_supp,
       count(DISTINCT l_partkey) AS n_part, count(*) AS n
FROM lineitem GROUP BY l_returnflag
""",
)


def _having(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_partkey")
        .agg(_dsum(F.col("l_quantity")).alias("total_qty"))
        .filter(F.col("total_qty") > 300)
    )


register(
    "agg_having_partkey",
    _having,
    f"""
SELECT l_partkey, {_dsum_sql('l_quantity')} AS total_qty
FROM lineitem GROUP BY l_partkey
HAVING {_dsum_sql('l_quantity')} > 300
""",
)


def _case_when(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    bucket = (
        F.when(F.col("o_totalprice") < 50_000, "low")
        .when(F.col("o_totalprice") < 150_000, "mid")
        .otherwise("high")
    )
    return (
        orders.withColumn("bucket", bucket)
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n"),
            _dsum(F.col("o_totalprice")).alias("sum_price"),
        )
    )


register(
    "case_when_order_buckets",
    _case_when,
    f"""
SELECT CASE WHEN o_totalprice < 50000 THEN 'low'
            WHEN o_totalprice < 150000 THEN 'mid'
            ELSE 'high' END AS bucket,
       count(*) AS n, {_dsum_sql('o_totalprice')} AS sum_price
FROM orders GROUP BY 1
""",
)


# --- multimodal join: documents x embeddings ----------------------------

def _multimodal(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    emb = load_table(spark, sf_dir, "embeddings")
    norm_sq = F.aggregate(
        F.col("embedding").cast("array<double>"),
        F.lit(0.0),
        lambda acc, v: acc + v * v,
    )
    joined = docs.join(emb, docs.doc_id == emb.vec_id).withColumn(
        "norm_sq", norm_sq
    )
    # total_chars: DuckDB SUM(BIGINT) yields HUGEINT (float64 in
    # pandas) — outer CAST AS BIGINT on the oracle side keeps both
    # engines on int64 so the driver hash is canonical. sum_norm is
    # emitted as integer micro-units (BIGINT) for the same reason.
    return joined.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n"),
        F.coalesce(F.sum("n_chars"), F.lit(0)).cast("long").alias("total_chars"),
        F.coalesce(
            F.sum(F.floor(F.col("norm_sq") * F.lit(1e6)).cast("long")), F.lit(0)
        ).cast("long").alias("sum_norm_micro"),
    )


register(
    "multimodal_docs_embeddings",
    _multimodal,
    """
SELECT lang, count(*) AS n,
       CAST(COALESCE(SUM(n_chars), 0) AS BIGINT) AS total_chars,
       CAST(COALESCE(SUM(CAST(floor(list_sum(list_transform(range(1, 65), i -> CAST(embedding[i] AS DOUBLE) * CAST(embedding[i] AS DOUBLE))) * 1000000.0) AS BIGINT)), 0) AS BIGINT) AS sum_norm_micro
FROM documents JOIN embeddings ON doc_id = vec_id
GROUP BY lang
""",
)


def _join_range_banded(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Same semantics as join_range_acctbal, through the banded
    equi-join rewrite (operators/range_join.py) — the plan that
    survives both sides being large at 100 TB: shuffle hash join on
    floor(acctbal / W) instead of a nested loop."""
    from ..operators.range_join import banded_range_join

    supp = load_table(spark, sf_dir, "supplier").withColumn(
        "lo", F.col("s_acctbal") - 500
    )
    cust = load_table(spark, sf_dir, "customer")
    joined = banded_range_join(
        cust, supp, "c_acctbal", "lo", "s_acctbal", band_width=500.0
    )
    return joined.groupBy("s_suppkey").agg(F.count(F.lit(1)).alias("n_cust"))


register(
    "join_range_banded",
    _join_range_banded,
    """
SELECT s_suppkey, count(*) AS n_cust
FROM customer JOIN supplier
  ON c_acctbal >= s_acctbal - 500 AND c_acctbal <= s_acctbal
GROUP BY s_suppkey
""",
)
