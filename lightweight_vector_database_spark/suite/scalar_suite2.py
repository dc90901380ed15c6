"""Scalar-function breadth, part 2: more string ops, array set ops,
map construction/access."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources import load_table
from . import register


def _string2(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load_table(spark, sf_dir, "part").filter(F.col("p_partkey") < 80)
    return part.select(
        "p_partkey",
        F.initcap(F.col("p_name")).alias("name_title"),
        F.lpad(F.col("p_brand"), 12, "*").alias("brand_lpad"),
        F.rpad(F.col("p_brand"), 12, "-").alias("brand_rpad"),
        F.translate(F.col("p_type"), "aeiou", "AEIOU").alias("type_vowels"),
        F.repeat(F.lit("ab"), 3).alias("repeated"),
        F.reverse(F.col("p_brand")).alias("brand_rev"),
        F.instr(F.col("p_name"), "a").cast("long").alias("first_a"),
        F.regexp_replace(F.col("p_name"), "[aeiou]", "_").alias("devoweled"),
        F.ascii(F.substring(F.col("p_brand"), 1, 1)).cast("long").alias("first_ascii"),
    )


register(
    "scalar_string2_part",
    _string2,
    """
SELECT p_partkey,
       -- DuckDB has no initcap; title-case each space-separated word
       array_to_string(list_transform(string_split(lower(p_name), ' '),
         w -> CASE WHEN length(w) = 0 THEN w
                   ELSE upper(w[1]) || w[2:] END), ' ') AS name_title,
       lpad(p_brand, 12, '*') AS brand_lpad,
       rpad(p_brand, 12, '-') AS brand_rpad,
       translate(p_type, 'aeiou', 'AEIOU') AS type_vowels,
       repeat('ab', 3) AS repeated,
       reverse(p_brand) AS brand_rev,
       CAST(instr(p_name, 'a') AS BIGINT) AS first_a,
       regexp_replace(p_name, '[aeiou]', '_', 'g') AS devoweled,
       CAST(ascii(substring(p_brand, 1, 1)) AS BIGINT) AS first_ascii
FROM part WHERE p_partkey < 80
""",
)


def _array2(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings").filter(F.col("vec_id") < 40)
    head = F.slice(F.col("embedding").cast("array<double>"), 1, 6)
    a = F.transform(head, lambda x: F.round(x * 10).cast("long"))
    b = F.sequence(F.lit(-2).cast("long"), F.lit(2).cast("long"))
    return emb.select(
        "vec_id",
        F.array_sort(F.array_union(a, b)).alias("u"),
        F.array_sort(F.array_intersect(a, b)).alias("i"),
        F.array_sort(F.array_except(a, b)).alias("x"),
        F.array_position(b, -2).cast("long").alias("pos_neg2"),
        F.array_sort(F.array_remove(a, 0)).alias("no_zero"),
        F.array_sort(F.array_distinct(a)).alias("dedup"),
        F.flatten(F.array(a, b)).alias("flat"),
    )


register(
    "scalar_array2_embeddings",
    _array2,
    """
WITH t AS (
  SELECT vec_id,
         list_transform(embedding[1:6],
                        x -> CAST(round(CAST(x AS DOUBLE) * 10, 0) AS BIGINT)) AS a,
         [-2, -1, 0, 1, 2]::BIGINT[] AS b
  FROM embeddings WHERE vec_id < 40
)
SELECT vec_id,
       list_sort(list_distinct(list_concat(a, b))) AS u,
       list_sort(list_distinct(list_intersect(a, b))) AS i,
       list_sort(list_distinct(list_filter(a, x -> NOT list_contains(b, x)))) AS x,
       CAST(list_position(b, -2) AS BIGINT) AS pos_neg2,
       list_sort(list_filter(a, x -> x <> 0)) AS no_zero,
       list_sort(list_distinct(a)) AS dedup,
       list_concat(a, b) AS flat
FROM t
""",
)


def _map_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").filter(F.col("event_id") < 150)
    m = F.create_map(
        F.lit("type"), F.col("event_type"),
        F.lit("uid"), F.col("user_id").cast("string"),
    )
    return ev.select(
        "event_id",
        F.map_keys(m).alias("ks"),
        F.element_at(m, "type").alias("etype"),
        F.element_at(m, "uid").alias("uid_str"),
        F.size(m).cast("long").alias("n_entries"),
    )


register(
    "scalar_map_events",
    _map_ops,
    """
SELECT event_id,
       ['type', 'uid'] AS ks,
       event_type AS etype,
       CAST(user_id AS VARCHAR) AS uid_str,
       CAST(2 AS BIGINT) AS n_entries
FROM events WHERE event_id < 150
""",
)


# --- Spark 4 VARIANT: semi-structured props without a schema ----------
# The modern twin of scalar_json_events (get_json_object on strings):
# parse once to VARIANT, extract typed fields with variant_get. At
# scale VARIANT beats per-access string re-parsing (binary encoding,
# shreddable); integer-only extraction keeps the oracle exact.
def _variant_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_table(spark, sf_dir, "events").createOrReplaceTempView("__lvdb_events_var")
    return spark.sql("""
SELECT event_type,
       count(*) AS n,
       sum(variant_get(v, '$.k', 'bigint')) AS sum_k,
       min(variant_get(v, '$.k', 'bigint')) AS min_k,
       max(variant_get(v, '$.k', 'bigint')) AS max_k,
       count(CASE WHEN variant_get(v, '$.k', 'bigint') % 2 = 0 THEN 1 END) AS n_even
FROM (SELECT event_type, parse_json(props) AS v FROM __lvdb_events_var)
GROUP BY event_type
""")


register(
    "variant_props_events",
    _variant_events,
    """
SELECT event_type,
       count(*) AS n,
       CAST(sum(CAST(props->>'k' AS BIGINT)) AS BIGINT) AS sum_k,
       min(CAST(props->>'k' AS BIGINT)) AS min_k,
       max(CAST(props->>'k' AS BIGINT)) AS max_k,
       count(CASE WHEN CAST(props->>'k' AS BIGINT) % 2 = 0 THEN 1 END) AS n_even
FROM events
GROUP BY event_type
""",
)
