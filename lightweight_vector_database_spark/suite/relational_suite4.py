"""Engine surface, part 4: the remaining TPC-H-shaped queries that fit
the driver's simplified star schema (no partsupp / shipmode / phone
columns exist, so Q8/Q13/Q14/Q18/Q19/Q22 are adapted accordingly).

Spark-first notes (100 TB story):
- Dimension sides (part, customer, nation, region, the scalar
  threshold row) are broadcast; only lineitem⋈orders shuffles, and AQE
  picks the strategy at runtime.
- All money sums use the exact quantized BIGINT sum (`_dsum`) so the
  result is deterministic under any partitioning — including the Q22
  threshold, which feeds a *filter* (a nondeterministic double avg
  could flip borderline rows between runs/engines).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources import load_table
from . import register
from .relational_suite import _dsum, _dsum_sql

def _revenue():
    # deferred: building a Column requires an active SparkContext
    return F.col("l_extendedprice") * (1 - F.col("l_discount"))


# --- Q8: market share (adapted: PROMO parts, ASIA customer market) ----------

def _q8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Supplier-nation NATION_5's share of PROMO-part revenue sold to
    ASIA customers, by order year. Reference capability: multi-way
    join + conditional aggregation (SURVEY.md §2B joins/aggs)."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    part = load_table(spark, sf_dir, "part").filter(F.col("p_type") == "PROMO")
    cust = load_table(spark, sf_dir, "customer")
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")

    cust_in_asia = (
        cust.join(
            F.broadcast(
                nation.join(
                    F.broadcast(region),
                    nation.n_regionkey == region.r_regionkey,
                )
            ),
            cust.c_nationkey == nation.n_nationkey,
        ).select("c_custkey")
    )
    supp_nation = supp.join(
        F.broadcast(nation.select("n_nationkey", "n_name")),
        supp.s_nationkey == nation.n_nationkey,
    ).select("s_suppkey", F.col("n_name").alias("supp_nation"))

    vol = _revenue()
    nation5_vol = F.when(F.col("supp_nation") == "NATION_5", vol).otherwise(0.0)
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust_in_asia), orders.o_custkey == F.col("c_custkey"))
        .join(F.broadcast(supp_nation), li.l_suppkey == F.col("s_suppkey"))
        .groupBy(F.year("o_orderdate").cast("long").alias("o_year"))
        .agg(
            _dsum(nation5_vol, 4).alias("nation_vol"),
            _dsum(vol, 4).alias("total_vol"),
        )
        .withColumn(
            "mkt_share", F.round(F.col("nation_vol") / F.col("total_vol"), 6)
        )
    )


register(
    "q8_market_share",
    _q8,
    f"""
WITH vols AS (
  SELECT year(o_orderdate) AS o_year,
         l_extendedprice * (1 - l_discount) AS vol,
         CASE WHEN sn.n_name = 'NATION_5'
              THEN l_extendedprice * (1 - l_discount) ELSE 0.0 END AS nvol
  FROM lineitem
  JOIN part ON l_partkey = p_partkey AND p_type = 'PROMO'
  JOIN orders ON l_orderkey = o_orderkey
  JOIN customer ON o_custkey = c_custkey
  JOIN nation cn ON c_nationkey = cn.n_nationkey
  JOIN region ON cn.n_regionkey = r_regionkey AND r_name = 'ASIA'
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation sn ON s_nationkey = sn.n_nationkey
)
SELECT o_year, {_dsum_sql('nvol', 4)} AS nation_vol,
       {_dsum_sql('vol', 4)} AS total_vol,
       round({_dsum_sql('nvol', 4)} / {_dsum_sql('vol', 4)}, 6) AS mkt_share
FROM vols GROUP BY o_year
""",
)


# --- Q13: customer order-count distribution ---------------------------------

def _q13(spark: SparkSession, sf_dir: str) -> DataFrame:
    """How many customers placed N orders (urgent-ish orders excluded,
    standing in for TPC-H's comment filter). Left join keeps 0-order
    customers — the distribution's head."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") != "5-LOW"
    )
    per_cust = (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
        .select("c_count", "custdist")
    )


register(
    "q13_order_distribution",
    _q13,
    """
SELECT c_count, count(*) AS custdist FROM (
  SELECT c_custkey, count(o_orderkey) AS c_count
  FROM customer
  LEFT JOIN orders ON c_custkey = o_custkey AND o_orderpriority <> '5-LOW'
  GROUP BY c_custkey
) GROUP BY c_count
""",
)


# --- Q14: promotion effect --------------------------------------------------

def _q14(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Percent of January-1997 revenue from PROMO parts. Single-row
    conditional-aggregate ratio; part side broadcast."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-02-01").cast("timestamp"))
    )
    part = load_table(spark, sf_dir, "part")
    promo_rev = F.when(F.col("p_type") == "PROMO", _revenue()).otherwise(0.0)
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .agg(
            _dsum(promo_rev, 4).alias("promo_rev"),
            _dsum(_revenue(), 4).alias("total_rev"),
        )
        .withColumn(
            "promo_pct",
            F.round(F.lit(100.0) * F.col("promo_rev") / F.col("total_rev"), 6),
        )
    )


register(
    "q14_promo_revenue",
    _q14,
    f"""
SELECT {_dsum_sql("CASE WHEN p_type = 'PROMO' THEN l_extendedprice * (1 - l_discount) ELSE 0.0 END", 4)} AS promo_rev,
       {_dsum_sql('l_extendedprice * (1 - l_discount)', 4)} AS total_rev,
       round(100.0 * {_dsum_sql("CASE WHEN p_type = 'PROMO' THEN l_extendedprice * (1 - l_discount) ELSE 0.0 END", 4)}
             / {_dsum_sql('l_extendedprice * (1 - l_discount)', 4)}, 6) AS promo_pct
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE l_shipdate >= TIMESTAMP '1997-01-01'
  AND l_shipdate < TIMESTAMP '1997-02-01'
""",
)


# --- Q18: large-volume customers --------------------------------------------

def _q18(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Orders whose total quantity exceeds 300, with their customer.
    The HAVING runs on the lineitem agg BEFORE the joins, so only the
    ~0.3% qualifying orders reach the join — at 100 TB the semi-join
    side is tiny and both joins broadcast."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    big = (
        li.groupBy("l_orderkey")
        .agg(_dsum(F.col("l_quantity")).alias("sum_qty"))
        .filter(F.col("sum_qty") > 300)
    )
    return (
        orders.join(F.broadcast(big), orders.o_orderkey == big.l_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .select(
            "c_name",
            "c_custkey",
            "o_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("o_date"),
            "o_totalprice",
            "sum_qty",
        )
    )


register(
    "q18_large_volume",
    _q18,
    f"""
SELECT c_name, c_custkey, o_orderkey,
       strftime(o_orderdate, '%Y-%m-%d') AS o_date, o_totalprice, sum_qty
FROM orders
JOIN (
  SELECT l_orderkey, {_dsum_sql('l_quantity')} AS sum_qty
  FROM lineitem GROUP BY l_orderkey HAVING sum_qty > 300
) big ON o_orderkey = big.l_orderkey
JOIN customer ON o_custkey = c_custkey
""",
)


# --- Q19: discounted revenue (OR-of-ANDs join predicate) --------------------

def _q19(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Disjunctive brand/size/quantity predicate (container/shipmode
    columns don't exist in this schema). The equi-join on partkey stays
    a join key; the OR lands as a post-join filter Catalyst can't push,
    which is exactly TPC-H Q19's planning challenge."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    q = F.col("l_quantity")
    sz = F.col("p_size")
    b = F.col("p_brand")
    cond = (
        ((b == "Brand#12") & sz.between(1, 15) & q.between(1, 11))
        | ((b == "Brand#23") & sz.between(1, 25) & q.between(10, 20))
        | ((b == "Brand#34") & sz.between(1, 35) & q.between(20, 30))
    )
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .filter(cond)
        .agg(_dsum(_revenue(), 4).alias("revenue"))
    )


register(
    "q19_discounted_revenue",
    _q19,
    f"""
SELECT {_dsum_sql('l_extendedprice * (1 - l_discount)', 4)} AS revenue
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 1 AND 11)
   OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 25 AND l_quantity BETWEEN 10 AND 20)
   OR (p_brand = 'Brand#34' AND p_size BETWEEN 1 AND 35 AND l_quantity BETWEEN 20 AND 30)
""",
)


# --- Q22: idle high-balance customers ---------------------------------------

def _q22(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customers with above-average positive balance and no URGENT
    orders, bucketed by custkey mod 7 (standing in for the phone
    country code, which this schema lacks; TPC-H's "no orders at all"
    is empty on this dense fixture). The scalar threshold uses the
    exact quantized sum so the *filter* is deterministic; it
    broadcasts, and the no-urgent-orders test is a left-anti join."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") == "1-URGENT"
    )
    thr = (
        cust.filter(F.col("c_acctbal") > 0)
        .agg(
            (_dsum(F.col("c_acctbal")) / F.count(F.lit(1))).alias("avg_bal")
        )
    )
    return (
        cust.join(F.broadcast(thr))
        .filter(F.col("c_acctbal") > F.col("avg_bal"))
        .join(orders, cust.c_custkey == orders.o_custkey, "left_anti")
        .groupBy((F.col("c_custkey") % 7).alias("code"))
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            _dsum(F.col("c_acctbal")).alias("totacctbal"),
        )
    )


register(
    "q22_idle_customers",
    _q22,
    f"""
WITH thr AS (
  SELECT {_dsum_sql('c_acctbal')} / count(*) AS avg_bal
  FROM customer WHERE c_acctbal > 0
)
SELECT c_custkey % 7 AS code, count(*) AS numcust,
       {_dsum_sql('c_acctbal')} AS totacctbal
FROM customer CROSS JOIN thr
WHERE c_acctbal > avg_bal
  AND NOT EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey
                    AND o_orderpriority = '1-URGENT')
GROUP BY code
""",
)


# --- interval (temporal range) self-join ------------------------------------

_ATTR_WINDOW_US = 3_600_000_000  # 1 hour


def _interval_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Attribution-style temporal join: purchases within one hour
    AFTER a click by the same user. Equi-key on user_id keeps the
    join a hash join (the range lands as a post-join filter), so the
    worst case is bounded per user — the standard shape for
    time-interval joins at scale (vs an unbounded theta join)."""
    ev = load_table(spark, sf_dir, "events")
    us = F.unix_micros(F.col("ts"))
    clicks = ev.filter(F.col("event_type") == "click").select(
        F.col("user_id").alias("u"),
        F.col("event_id").alias("click_id"),
        us.alias("t_click"),
    )
    buys = ev.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("u"),
        F.col("event_id").alias("purchase_id"),
        us.alias("t_buy"),
    )
    gap = F.col("t_buy") - F.col("t_click")
    return (
        clicks.join(buys, "u")
        .filter((gap >= 0) & (gap <= _ATTR_WINDOW_US))
        .select(
            F.col("u").alias("user_id"),
            "click_id",
            "purchase_id",
            gap.alias("gap_us"),
        )
    )


register(
    "interval_join_attribution",
    _interval_join,
    f"""
SELECT c.user_id, c.event_id AS click_id, p.event_id AS purchase_id,
       epoch_us(p.ts) - epoch_us(c.ts) AS gap_us
FROM events c JOIN events p ON c.user_id = p.user_id
WHERE c.event_type = 'click' AND p.event_type = 'purchase'
  AND epoch_us(p.ts) - epoch_us(c.ts) BETWEEN 0 AND {_ATTR_WINDOW_US}
""",
)


# --- Q15: top supplier by quarterly revenue ---------------------------------

def _q15(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Suppliers achieving the maximum Q1-1997 revenue (TPC-H Q15's
    view + scalar-max pattern). The max is a broadcast single row; the
    revenue agg shuffles once on suppkey."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-04-01").cast("timestamp"))
    )
    supp = load_table(spark, sf_dir, "supplier")
    rev = li.groupBy("l_suppkey").agg(
        _dsum(_revenue(), 4).alias("total_rev")
    )
    mx = rev.agg(F.max("total_rev").alias("max_rev"))
    return (
        rev.join(F.broadcast(mx))
        .filter(F.col("total_rev") == F.col("max_rev"))
        .join(F.broadcast(supp), rev.l_suppkey == supp.s_suppkey)
        .select("s_suppkey", "s_name", "total_rev")
    )


register(
    "q15_top_supplier",
    _q15,
    f"""
WITH rev AS (
  SELECT l_suppkey, {_dsum_sql('l_extendedprice * (1 - l_discount)', 4)} AS total_rev
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1997-01-01'
    AND l_shipdate < TIMESTAMP '1997-04-01'
  GROUP BY l_suppkey
)
SELECT s_suppkey, s_name, total_rev
FROM rev JOIN supplier ON l_suppkey = s_suppkey
WHERE total_rev = (SELECT max(total_rev) FROM rev)
""",
)


# --- Q17: small-quantity-order revenue --------------------------------------

def _q17(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Average yearly revenue lost if small orders (< 20% of a part's
    average quantity) were not filled — Q17's correlated-average
    pattern for Brand#11. Both the part filter and the per-part
    averages broadcast; lineitem never shuffles."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#11")
    li_b = li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
    avg_qty = li_b.groupBy("l_partkey").agg(
        ((_dsum(F.col("l_quantity")) / F.count(F.lit(1))) * 0.2).alias("qty_cut")
    )
    return (
        li_b.join(F.broadcast(avg_qty), "l_partkey")
        .filter(F.col("l_quantity") < F.col("qty_cut"))
        .agg(
            F.round(_dsum(F.col("l_extendedprice")) / 7.0, 6).alias("avg_yearly")
        )
    )


register(
    "q17_small_qty_revenue",
    _q17,
    f"""
WITH li_b AS (
  SELECT l_partkey, l_quantity, l_extendedprice
  FROM lineitem JOIN part ON l_partkey = p_partkey
  WHERE p_brand = 'Brand#11'
), cuts AS (
  SELECT l_partkey,
         ({_dsum_sql('l_quantity')} / count(*)) * 0.2 AS qty_cut
  FROM li_b GROUP BY l_partkey
)
SELECT round({_dsum_sql('l_extendedprice')} / 7.0, 6) AS avg_yearly
FROM li_b JOIN cuts USING (l_partkey)
WHERE l_quantity < qty_cut
""",
)


# --- null semantics: null-safe equality, explicit null ordering -------------

def _null_semantics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null-handling surface in one query: a derived nullable key,
    null-safe equality join (<=> / IS NOT DISTINCT FROM), nullif/
    coalesce, and an explicit NULLS LAST rank (Spark defaults to nulls
    first ascending, DuckDB to nulls last — portable queries must pin
    it)."""
    cust = load_table(spark, sf_dir, "customer").filter(F.col("c_custkey") < 200)
    # nullable key: NULL for negative balances
    keyed = cust.select(
        "c_custkey",
        "c_mktsegment",
        F.when(F.col("c_acctbal") >= 0, (F.col("c_custkey") % 5)).alias("grp"),
        F.col("c_acctbal").alias("bal"),
    )
    # null-safe self-join counts: rows pair when grp <=> grp (NULL pairs NULL)
    a = keyed.alias("a")
    b = keyed.alias("b")
    pair_counts = (
        a.join(b, F.col("a.grp").eqNullSafe(F.col("b.grp")))
        .groupBy(F.col("a.c_custkey").alias("c_custkey"))
        .agg(F.count(F.lit(1)).alias("n_grp_peers"))
    )
    from pyspark.sql import Window

    w = Window.orderBy(F.col("grp").asc_nulls_last(), F.col("c_custkey").asc())
    ranked = keyed.withColumn("rnk", F.row_number().over(w).cast("long"))
    return (
        ranked.join(pair_counts, "c_custkey")
        .select(
            "c_custkey",
            F.coalesce(F.col("grp"), F.lit(-1)).alias("grp_filled"),
            F.nullif(F.col("c_mktsegment"), F.lit("BUILDING")).alias("seg_or_null"),
            "n_grp_peers",
            "rnk",
        )
    )


register(
    "null_semantics_customers",
    _null_semantics,
    """
WITH keyed AS (
  SELECT c_custkey, c_mktsegment,
         CASE WHEN c_acctbal >= 0 THEN c_custkey % 5 END AS grp,
         c_acctbal AS bal
  FROM customer WHERE c_custkey < 200
), pair_counts AS (
  SELECT a.c_custkey, count(*) AS n_grp_peers
  FROM keyed a JOIN keyed b ON a.grp IS NOT DISTINCT FROM b.grp
  GROUP BY a.c_custkey
), ranked AS (
  SELECT c_custkey, c_mktsegment, grp,
         row_number() OVER (ORDER BY grp ASC NULLS LAST, c_custkey ASC) AS rnk
  FROM keyed
)
SELECT r.c_custkey, coalesce(r.grp, -1) AS grp_filled,
       nullif(r.c_mktsegment, 'BUILDING') AS seg_or_null,
       p.n_grp_peers, r.rnk
FROM ranked r JOIN pair_counts p ON r.c_custkey = p.c_custkey
""",
)


# --- bitwise / base-conversion scalar surface --------------------------------

def _bitwise(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bitwise ops + hex/binary rendering over order keys — the last
    scalar-function family not yet pinned by an oracle (hash
    partitioners, bloom filters and bucket math all live on these)."""
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 500)
    k = F.col("o_orderkey")
    c = F.col("o_custkey")
    return o.select(
        "o_orderkey",
        (k.bitwiseAND(F.lit(255))).alias("and_255"),
        (k.bitwiseOR(c)).alias("or_cust"),
        (k.bitwiseXOR(c)).alias("xor_cust"),
        F.shiftleft(k, 3).alias("shl3"),
        F.shiftright(k, 2).alias("shr2"),
        F.hex(k).alias("hex_key"),
        F.bin(k).alias("bin_key"),
        F.bit_count(k).cast("long").alias("popcount"),
    )


register(
    "scalar_bitwise_orders",
    _bitwise,
    """
SELECT o_orderkey,
       o_orderkey & 255 AS and_255,
       o_orderkey | o_custkey AS or_cust,
       xor(o_orderkey, o_custkey) AS xor_cust,
       o_orderkey << 3 AS shl3,
       o_orderkey >> 2 AS shr2,
       to_hex(o_orderkey) AS hex_key,
       bin(o_orderkey) AS bin_key,
       CAST(bit_count(o_orderkey) AS BIGINT) AS popcount
FROM orders WHERE o_orderkey < 500
""",
)


# --- string similarity / manipulation, part 3 --------------------------------

def _string3(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Edit distance + the remaining string builtins not yet pinned
    (translate/repeat/reverse/ascii/chr/locate/left/right).
    Levenshtein against a fixed probe name is the fuzzy-matching
    primitive for entity resolution over metadata columns."""
    c = load_table(spark, sf_dir, "customer").filter(F.col("c_custkey") < 300)
    name = F.col("c_name")
    return c.select(
        "c_custkey",
        F.levenshtein(name, F.lit("Customer#000000042")).cast("long").alias("edit_dist"),
        F.translate(name, "0#", "_@").alias("translated"),
        F.reverse(F.substring(name, -4, 4)).alias("rev_tail"),
        F.repeat(F.substring(name, 1, 2), 2).alias("rep2"),
        F.ascii(name).cast("long").alias("first_ascii"),
        F.chr(F.lit(65) + (F.col("c_custkey") % 26)).alias("bucket_chr"),
        F.locate("0", name).cast("long").alias("first_zero_pos"),
        F.concat(name.substr(F.lit(1), F.lit(3)), F.lit("..")).alias("prefix3"),
    )


register(
    "scalar_string3_customers",
    _string3,
    """
SELECT c_custkey,
       levenshtein(c_name, 'Customer#000000042') AS edit_dist,
       translate(c_name, '0#', '_@') AS translated,
       reverse(right(c_name, 4)) AS rev_tail,
       repeat(left(c_name, 2), 2) AS rep2,
       CAST(ascii(c_name) AS BIGINT) AS first_ascii,
       chr(CAST(65 + c_custkey % 26 AS INT)) AS bucket_chr,
       strpos(c_name, '0') AS first_zero_pos,
       left(c_name, 3) || '..' AS prefix3
FROM customer WHERE c_custkey < 300
""",
)


# --- conditional aggregates ---------------------------------------------------

def _cond_aggs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """count_if / filtered aggregates / exact median per priority —
    the conditional-aggregation surface (FILTER clauses in SQL)."""
    o = load_table(spark, sf_dir, "orders")
    big = F.col("o_totalprice") > 200000
    return o.groupBy("o_orderpriority").agg(
        F.count_if(big).alias("n_big"),
        F.count_if(~big).alias("n_small"),
        _dsum(F.when(big, F.col("o_totalprice")).otherwise(0.0)).alias("big_total"),
        F.round(F.median("o_totalprice"), 6).alias("median_price"),
        F.count(F.lit(1)).alias("n"),
    )


register(
    "agg_conditional_orders",
    _cond_aggs,
    f"""
SELECT o_orderpriority,
       CAST(count_if(o_totalprice > 200000) AS BIGINT) AS n_big,
       CAST(count_if(NOT (o_totalprice > 200000)) AS BIGINT) AS n_small,
       {_dsum_sql("CASE WHEN o_totalprice > 200000 THEN o_totalprice ELSE 0.0 END")} AS big_total,
       round(CAST(median(o_totalprice) AS DOUBLE), 6) AS median_price,
       count(*) AS n
FROM orders GROUP BY o_orderpriority
""",
)
