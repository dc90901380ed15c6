"""CRUD snapshot invariants, mirroring the reference's test style
(tests/test_kd_tree_database.py:30-52: count invariants across a
mutation sequence; :79-94 update_position; :96-106 iteration)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    FloatType,
    IntegerType,
    LongType,
    StructField,
    StructType,
)

from lightweight_vector_database_spark.operators import crud
from lightweight_vector_database_spark.operators.knn import knn
from lightweight_vector_database_spark.probes import probe_vector
from lightweight_vector_database_spark.sources import load_table


@pytest.fixture()
def snap(spark, sf_dir):
    return load_table(spark, sf_dir, "embeddings")


def test_insert_mints_monotonic_ids(spark, snap):
    n0 = snap.count()
    max0 = snap.agg(F.max("vec_id")).first()[0]
    new_rows = spark.createDataFrame(
        [([0.0] * 64, 7), ([0.1] * 64, 8)],
        StructType(
            [
                StructField("embedding", ArrayType(FloatType())),
                StructField("label", IntegerType()),
            ]
        ),
    )
    out = crud.insert(snap, new_rows, order_by=["label"])
    assert out.count() == n0 + 2
    minted = sorted(
        r.vec_id for r in out.filter(F.col("vec_id") > max0).collect()
    )
    assert minted == [max0 + 1, max0 + 2]
    # ids never reused: delete then insert mints fresh ids
    remaining, _ = crud.delete_ids(out, [max0 + 2])
    out2 = crud.insert(remaining, new_rows.limit(1), order_by=["label"])
    assert out2.agg(F.max("vec_id")).first()[0] == max0 + 2  # max+1 of remaining


def test_delete_returns_removed(snap):
    remaining, removed = crud.delete(snap, F.col("vec_id") < 10)
    assert removed.count() == 10
    assert remaining.count() == snap.count() - 10
    # delete of absent ids removes nothing (reference returns None)
    r2, rm2 = crud.delete_ids(snap, [10_000_000])
    assert rm2.count() == 0 and r2.count() == snap.count()


def test_update_position_moves_row(spark, snap):
    # reference tests:79-94 — after a move, kNN finds the row at its
    # new position with dist > 0 from the old probe
    target = probe_vector(seed=99)
    upd = spark.createDataFrame(
        [(42, [float(v) for v in target])],
        StructType(
            [
                StructField("vec_id", LongType()),
                StructField("embedding", ArrayType(FloatType())),
            ]
        ),
    )
    moved = crud.update_positions(snap, upd)
    top = knn(moved, target, 1).first()
    assert top.vec_id == 42
    assert top.dist < 1e-9  # float32 storage of the exact target
    assert moved.count() == snap.count()  # metadata/rows untouched


def test_update_metadata_only(spark, snap):
    upd = spark.createDataFrame(
        [(7, 99)],
        StructType(
            [StructField("vec_id", LongType()), StructField("label", IntegerType())]
        ),
    )
    out = crud.update_metadata(snap, upd)
    assert out.filter(F.col("vec_id") == 7).first().label == 99
    # vector untouched
    v0 = snap.filter(F.col("vec_id") == 7).first().embedding
    v1 = out.filter(F.col("vec_id") == 7).first().embedding
    assert v0 == v1


def test_get_entry_and_count(snap):
    assert crud.get_entry(snap, 123).count() == 1
    assert crud.get_entry(snap, -5).count() == 0
    assert crud.count_rows(snap).first().n == snap.count()


def test_merge_upsert_updates_and_inserts(spark):
    from lightweight_vector_database_spark.operators.crud import merge_upsert

    base = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0)], "id long, name string, bal double"
    )
    updates = spark.createDataFrame(
        [(2, "b2", 25.0), (9, "new", 1.0)], "id long, name string, bal double"
    )
    got = {r.id: (r.name, r.bal) for r in merge_upsert(base, updates, "id").collect()}
    assert got == {
        1: ("a", 10.0),   # untouched carries over
        2: ("b2", 25.0),  # matched -> update wins
        3: ("c", 30.0),
        9: ("new", 1.0),  # unmatched update -> insert
    }
    # schema mismatch is rejected early
    import pytest as _pytest

    with _pytest.raises(ValueError):
        merge_upsert(base, updates.drop("bal"), "id")


def test_merge_upsert_writes_explicit_null(spark):
    # update is wholesale replacement (kd_tree_database.py:310-316): an
    # update row carrying NULL must overwrite the old value with NULL,
    # not silently keep it (the coalesce trap).
    from lightweight_vector_database_spark.operators.crud import merge_upsert

    base = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0)], "id long, name string, bal double"
    )
    updates = spark.createDataFrame(
        [(2, None, None)], "id long, name string, bal double"
    )
    got = {r.id: (r.name, r.bal) for r in merge_upsert(base, updates, "id").collect()}
    assert got == {1: ("a", 10.0), 2: (None, None)}


def test_mint_ids_contiguous_order_aligned_and_distributed(spark):
    # ADVICE r5: id minting must not serialize the batch through a
    # single-partition global window. Contract: ids are exactly
    # next_id..next_id+n-1, assigned in ascending order_by order, and
    # the plan range-shuffles (the two-level scan) instead of moving
    # everything to one task.
    rows = [(float(i % 97), i) for i in range(500)]
    df = spark.createDataFrame(rows, "sort_key double, payload int")
    out = crud.mint_ids(df, 1000, id_col="vec_id", order_by=["sort_key", "payload"])

    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "rangepartitioning" in plan, "expected a range shuffle, not a global window"

    got = out.orderBy("vec_id").collect()
    assert [r.vec_id for r in got] == list(range(1000, 1500))
    # ids follow the requested total order
    keys = [(r.sort_key, r.payload) for r in got]
    assert keys == sorted(keys)


def test_insert_ids_continue_after_max_distributed(spark):
    base = spark.createDataFrame(
        [(10, 1.0), (42, 2.0)], "vec_id long, val double"
    )
    new = spark.createDataFrame(
        [(5.0,), (3.0,), (4.0,)], "val double"
    ).withColumn("vec_id", F.lit(None).cast("long")).select("vec_id", "val")
    out = crud.insert(base, new.drop("vec_id"), order_by=["val"])
    got = sorted((r.vec_id, r.val) for r in out.collect())
    assert got == [(10, 1.0), (42, 2.0), (43, 3.0), (44, 4.0), (45, 5.0)]
