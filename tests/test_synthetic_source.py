"""Spark 4 Python DataSource API connector (sources/synthetic.py):
partition-parallel Arrow-batched generation, deterministic and
partition-layout independent."""

from __future__ import annotations

import pytest

from lightweight_vector_database_spark.sources.synthetic import (
    SyntheticVectorsDataSource,
)


@pytest.fixture(scope="module", autouse=True)
def _register(spark):
    spark.dataSource.register(SyntheticVectorsDataSource)


def _read(spark, **opts):
    r = spark.read.format("synthetic_vectors")
    for k, v in opts.items():
        r = r.option(k, v)
    return r.load()


def test_schema_count_and_content(spark):
    df = _read(spark, n=500, dim=16, partitions=4, seed=7)
    assert df.schema.simpleString() == (
        "struct<vec_id:bigint,embedding:array<float>,label:int>"
    )
    rows = df.collect()
    assert len(rows) == 500
    assert sorted(r.vec_id for r in rows) == list(range(500))
    assert all(len(r.embedding) == 16 for r in rows[:20])
    assert all(r.label == r.vec_id % 10 for r in rows)
    assert df.rdd.getNumPartitions() == 4


def test_deterministic_across_partition_layouts(spark):
    a = {r.vec_id: r.embedding for r in _read(spark, n=300, dim=10, partitions=3, seed=5).collect()}
    b = {r.vec_id: r.embedding for r in _read(spark, n=300, dim=10, partitions=7, seed=5).collect()}
    assert a == b


def test_seed_changes_content(spark):
    a = {r.vec_id: r.embedding for r in _read(spark, n=50, dim=8, seed=1).collect()}
    b = {r.vec_id: r.embedding for r in _read(spark, n=50, dim=8, seed=2).collect()}
    assert a != b


def test_feeds_engine_operators(spark):
    # the connector output drops straight into the kNN path
    from lightweight_vector_database_spark.operators.knn import knn

    df = _read(spark, n=2000, dim=8, partitions=8, seed=9)
    out = knn(df, [0.0] * 8, 5).collect()
    assert len(out) == 5
    assert out == sorted(out, key=lambda r: (r.dist, r.vec_id))


def test_stream_reader_feeds_vector_ingest(spark, tmp_path):
    """Custom streaming source -> ingestion sink, end-to-end: the
    drained stream's snapshot holds exactly the batch reader's rows."""
    from lightweight_vector_database_spark.plans.grid_index import GridIndex
    from lightweight_vector_database_spark.sources.snapshots import SnapshotStore
    from lightweight_vector_database_spark.streaming.ingest import VectorIngest

    opts = dict(n=240, dim=8, seed=13, rows_per_batch=80)
    stream = spark.readStream.format("synthetic_vectors")
    for k, v in opts.items():
        stream = stream.option(k, v)

    store = SnapshotStore(spark, str(tmp_path / "snap"))
    index = GridIndex([-1.0] * 8, [1.0] * 8, num_splits=2, depth=4)
    ingest = VectorIngest(store, index)
    q = ingest.start(
        stream.load().drop("vec_id"), checkpoint=str(tmp_path / "ckpt")
    )
    q.awaitTermination(120)

    snap = store.read()
    assert snap.count() == 240
    assert sum(ingest.stats.values()) == 240
    batch = {
        tuple(r.embedding)
        for r in _read(spark, n=240, dim=8, seed=13).collect()
    }
    streamed = {tuple(r.embedding) for r in snap.collect()}
    assert streamed == batch
