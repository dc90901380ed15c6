"""Snapshot store: versioned CRUD survives re-read, time travel works,
manifest pointer swap is atomic-ish."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from lightweight_vector_database_spark.operators import crud
from lightweight_vector_database_spark.sources import load_table
from lightweight_vector_database_spark.sources.snapshots import SnapshotStore


def test_versioned_crud_lifecycle(spark, sf_dir, tmp_path):
    store = SnapshotStore(spark, str(tmp_path / "snaps"))
    emb = load_table(spark, sf_dir, "embeddings")

    v0 = store.commit(emb)
    assert v0 == 0 and store.latest_version() == 0
    n0 = store.read().count()

    remaining, removed = crud.delete(store.read(), F.col("vec_id") % 5 == 0)
    v1 = store.commit(remaining)
    assert v1 == 1

    # latest reflects the delete; time travel still sees v0
    assert store.read().count() == n0 - removed.count()
    assert store.read(v0).count() == n0
    assert store.versions() == [0, 1]

    # a fresh store handle (simulated restart) sees the same state
    store2 = SnapshotStore(spark, str(tmp_path / "snaps"))
    assert store2.latest_version() == 1
    assert store2.read().count() == n0 - removed.count()


def test_read_missing_version_raises(spark, tmp_path):
    store = SnapshotStore(spark, str(tmp_path / "empty"))
    with pytest.raises(KeyError):
        store.read()
    with pytest.raises(KeyError):
        store.read(3)


def test_partitioned_commit(spark, sf_dir, tmp_path):
    from lightweight_vector_database_spark.plans.grid_index import GridIndex, build_index
    from lightweight_vector_database_spark.probes import DIM

    store = SnapshotStore(spark, str(tmp_path / "part"))
    emb = load_table(spark, sf_dir, "embeddings")
    idx = GridIndex([-0.5] * DIM, [0.5] * DIM, 2, 4)
    store.commit(build_index(emb, idx), partition_by=["cell_id"])
    back = store.read()
    plan = back.filter(F.col("cell_id") == 0)._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan


def test_vacuum_retention(spark, tmp_path):
    import os

    store = SnapshotStore(spark, str(tmp_path / "s"))
    df = spark.range(5).withColumnRenamed("id", "vec_id")
    for _ in range(4):
        store.commit(df)
    assert store.versions() == [0, 1, 2, 3]

    dropped = store.vacuum(keep_last=2)
    assert dropped == [0, 1]
    assert store.versions() == [2, 3]
    assert store.read().count() == 5  # latest still readable
    assert store.read(2).count() == 5  # retained history readable
    with pytest.raises(KeyError):
        store.read(0)
    assert not os.path.exists(str(tmp_path / "s" / "v0"))
    assert store.vacuum(keep_last=2) == []  # idempotent
    with pytest.raises(ValueError):
        store.vacuum(keep_last=0)
