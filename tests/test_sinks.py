"""Sink round-trips and the partition-pruning payoff of the indexed
snapshot layout."""

from __future__ import annotations

import tempfile

import pytest
from pyspark.sql import functions as F

from lightweight_vector_database_spark.plans.grid_index import GridIndex, build_index
from lightweight_vector_database_spark.probes import DIM
from lightweight_vector_database_spark.sources import load_table
from lightweight_vector_database_spark.sources.sinks import (
    read_csv,
    read_json,
    read_parquet,
    write_csv,
    write_indexed_snapshot,
    write_json,
)


@pytest.fixture(scope="module")
def tmp(tmp_path_factory):
    return str(tmp_path_factory.mktemp("sinks"))


def test_indexed_snapshot_partition_pruning(spark, sf_dir, tmp):
    emb = load_table(spark, sf_dir, "embeddings")
    idx = GridIndex([-0.5] * DIM, [0.5] * DIM, 2, 4)
    assigned = build_index(emb, idx)
    path = f"{tmp}/emb_indexed"
    write_indexed_snapshot(assigned, path)

    back = read_parquet(spark, path)
    assert back.count() == emb.count()

    some_cell = back.select("cell_id").first().cell_id
    pruned = back.filter(F.col("cell_id") == some_cell)
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    # the cell filter must hit the directory layout, not the rows
    assert "PartitionFilters" in plan and "cell_id" in plan.split("PartitionFilters")[1][:200]
    assert pruned.count() > 0


def test_csv_roundtrip(spark, sf_dir, tmp):
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "lang", "n_chars")
    path = f"{tmp}/docs_csv"
    write_csv(docs, path)
    back = read_csv(spark, path, "doc_id long, lang string, n_chars long")
    assert {tuple(r) for r in back.collect()} == {tuple(r) for r in docs.collect()}


def test_json_roundtrip(spark, sf_dir, tmp):
    ev = load_table(spark, sf_dir, "events").select("event_id", "event_type", "user_id")
    path = f"{tmp}/events_json"
    write_json(ev, path)
    back = read_json(spark, path, "event_id long, event_type string, user_id long")
    assert back.count() == ev.count()
    assert {r.event_id for r in back.collect()} == {r.event_id for r in ev.collect()}


def test_orc_roundtrip(spark, sf_dir, tmp):
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "lang")
    path = f"{tmp}/docs_orc"
    docs.write.mode("overwrite").orc(path)
    back = spark.read.orc(path)
    assert {tuple(r) for r in back.collect()} == {tuple(r) for r in docs.collect()}


def test_text_lines_roundtrip(spark, sf_dir, tmp):
    docs = load_table(spark, sf_dir, "documents").select("text")
    path = f"{tmp}/docs_text"
    docs.write.mode("overwrite").text(path)
    back = spark.read.text(path)
    assert back.count() == docs.count()
    assert {r.value for r in back.collect()} == {r.text for r in docs.collect()}
