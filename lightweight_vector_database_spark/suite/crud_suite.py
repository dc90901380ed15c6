"""CRUD snapshot pipeline — reference write-path semantics as dataflow.

One composite query exercises delete -> insert (monotonic id minting)
-> update_metadata -> update_position and outputs the full final
snapshot (id, label, vector norm), so the oracle checks every mutation
including the vector payloads. Plus point-lookup and count queries
(reference get_entry / __len__).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    FloatType,
    IntegerType,
    LongType,
    StructField,
    StructType,
)

from ..operators import crud
from ..probes import DIM, probe_vector
from ..sources import load_table
from . import register

NEW_VECS = [probe_vector(seed=20 + i) for i in range(3)]
NEW_LABELS = [100, 101, 102]
MOVED_VEC = probe_vector(seed=30)
MOVED_IDS = [1, 2, 3]


def _sql_float_array(values: list[float]) -> str:
    return "[" + ", ".join(repr(v) for v in values) + "]::FLOAT[]"


def _norm_sq_sql(col: str) -> str:
    x = f"CAST({col}[i] AS DOUBLE)"
    return f"list_sum(list_transform(range(1, {DIM + 1}), i -> {x} * {x}))"


def _crud_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    snap = load_table(spark, sf_dir, "embeddings")

    # 1. delete every 7th id (reference delete, batched)
    snap, _removed = crud.delete(snap, F.col("vec_id") % 7 == 0)

    # 2. insert 3 new rows; ids minted monotonically in label order
    vec_t = ArrayType(FloatType())
    new_rows = spark.createDataFrame(
        [([float(v) for v in vec], lab) for vec, lab in zip(NEW_VECS, NEW_LABELS)],
        StructType(
            [StructField("embedding", vec_t), StructField("label", IntegerType())]
        ),
    )
    snap = crud.insert(snap, new_rows, id_col="vec_id", order_by=["label"])

    # 3. update_metadata: every 11th id gets label + 100
    meta_updates = snap.filter(F.col("vec_id") % 11 == 0).select(
        "vec_id", (F.col("label") + 100).alias("label")
    )
    snap = crud.update_metadata(snap, meta_updates, id_col="vec_id")

    # 4. update_position: move ids 1..3 to a fixed vector
    pos_updates = spark.createDataFrame(
        [(int(i), [float(v) for v in MOVED_VEC]) for i in MOVED_IDS],
        StructType(
            [StructField("vec_id", LongType()), StructField("embedding", vec_t)]
        ),
    )
    snap = crud.update_positions(snap, pos_updates, id_col="vec_id")

    norm = F.aggregate(
        F.col("embedding").cast("array<double>"),
        F.lit(0.0),
        lambda acc, v: acc + v * v,
    )
    return snap.select("vec_id", "label", F.round(norm, 6).alias("norm_sq"))


_VALUES = ", ".join(
    f"({i + 1}, {_sql_float_array(vec)}, {lab})"
    for i, (vec, lab) in enumerate(zip(NEW_VECS, NEW_LABELS))
)

_CRUD_ORACLE = f"""
WITH remaining AS (
  SELECT * FROM embeddings WHERE vec_id % 7 <> 0
), mx AS (
  SELECT max(vec_id) AS m FROM remaining
), new_rows(rn, emb, label) AS (
  VALUES {_VALUES}
), inserted AS (
  SELECT m + rn AS vec_id, emb AS embedding, label FROM new_rows CROSS JOIN mx
), snap1 AS (
  SELECT vec_id, embedding, label FROM remaining
  UNION ALL
  SELECT vec_id, embedding, label FROM inserted
), snap2 AS (
  SELECT vec_id, embedding,
         CASE WHEN vec_id % 11 = 0 THEN label + 100 ELSE label END AS label
  FROM snap1
), snap3 AS (
  SELECT vec_id,
         CASE WHEN vec_id IN ({", ".join(str(i) for i in MOVED_IDS)})
              THEN {_sql_float_array(MOVED_VEC)} ELSE embedding END AS embedding,
         label
  FROM snap2
)
SELECT vec_id, label, round({_norm_sq_sql('embedding')}, 6) AS norm_sq FROM snap3
"""

register("crud_pipeline", _crud_pipeline, _CRUD_ORACLE)


def _get_entry(spark: SparkSession, sf_dir: str) -> DataFrame:
    snap = load_table(spark, sf_dir, "embeddings")
    norm = F.aggregate(
        F.col("embedding").cast("array<double>"),
        F.lit(0.0),
        lambda acc, v: acc + v * v,
    )
    return crud.get_entry(snap, 123).select(
        "vec_id", "label", F.round(norm, 6).alias("norm_sq")
    )


register(
    "get_entry",
    _get_entry,
    f"""
SELECT vec_id, label, round({_norm_sq_sql('embedding')}, 6) AS norm_sq
FROM embeddings WHERE vec_id = 123
""",
)


def _count_after_delete(spark: SparkSession, sf_dir: str) -> DataFrame:
    snap = load_table(spark, sf_dir, "embeddings")
    remaining, removed = crud.delete(snap, F.col("label") >= 5)
    return crud.count_rows(remaining).join(
        removed.agg(F.count(F.lit(1)).alias("n_removed"))
    )


register(
    "count_after_delete",
    _count_after_delete,
    """
SELECT (SELECT count(*) FROM embeddings WHERE NOT (label >= 5)) AS n,
       (SELECT count(*) FROM embeddings WHERE label >= 5) AS n_removed
""",
)


def _merge_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGE/upsert snapshot semantics (full-outer-join + coalesce):
    every 100th customer gets a balance bump (WHEN MATCHED UPDATE),
    every 250th spawns a new 'NEW'-segment customer (WHEN NOT MATCHED
    INSERT); summarized per segment so the effect of both branches is
    visible in one small result."""
    from ..operators.crud import merge_upsert
    from .relational_suite import _dsum

    cust = load_table(spark, sf_dir, "customer")
    updated = (
        cust.filter(F.col("c_custkey") % 100 == 0)
        .withColumn("c_acctbal", F.col("c_acctbal") + 100.0)
        .withColumn("c_name", F.concat(F.lit("M-"), F.col("c_name")))
    )
    inserted = cust.filter(F.col("c_custkey") % 250 == 0).select(
        (F.col("c_custkey") + 1000000).alias("c_custkey"),
        F.concat(F.lit("N-"), F.col("c_name")).alias("c_name"),
        F.lit(0).cast("long").alias("c_nationkey"),
        F.lit(500.0).alias("c_acctbal"),
        F.lit("NEW").alias("c_mktsegment"),
    )
    merged = merge_upsert(cust, updated.unionByName(inserted), key="c_custkey")
    return merged.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).alias("n"),
        _dsum(F.col("c_acctbal")).alias("sum_bal"),
    )


from .relational_suite import _dsum_sql as _dsum_sql_  # noqa: E402

register(
    "crud_merge_upsert",
    _merge_upsert,
    f"""
WITH upd AS (
  SELECT c_custkey, 'M-' || c_name AS c_name, c_nationkey,
         c_acctbal + 100.0 AS c_acctbal, c_mktsegment
  FROM customer WHERE c_custkey % 100 = 0
  UNION ALL
  SELECT c_custkey + 1000000, 'N-' || c_name, CAST(0 AS BIGINT), 500.0, 'NEW'
  FROM customer WHERE c_custkey % 250 = 0
), merged AS (
  SELECT coalesce(u.c_custkey, b.c_custkey) AS c_custkey,
         coalesce(u.c_name, b.c_name) AS c_name,
         coalesce(u.c_nationkey, b.c_nationkey) AS c_nationkey,
         coalesce(u.c_acctbal, b.c_acctbal) AS c_acctbal,
         coalesce(u.c_mktsegment, b.c_mktsegment) AS c_mktsegment
  FROM customer b FULL OUTER JOIN upd u ON b.c_custkey = u.c_custkey
)
SELECT c_mktsegment, count(*) AS n, {_dsum_sql_('c_acctbal')} AS sum_bal
FROM merged GROUP BY c_mktsegment
""",
)
