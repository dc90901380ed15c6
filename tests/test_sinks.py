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
    from lightweight_vector_database_spark.sources.sinks import (
        read_orc,
        write_orc,
    )

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "lang")
    path = f"{tmp}/docs_orc"
    write_orc(docs, path, partition_by=["lang"])
    back = read_orc(spark, path)
    assert {(r.doc_id, r.lang) for r in back.collect()} == {
        (r.doc_id, r.lang) for r in docs.collect()
    }


def test_text_lines_roundtrip(spark, sf_dir, tmp):
    docs = load_table(spark, sf_dir, "documents").select("text")
    path = f"{tmp}/docs_text"
    docs.write.mode("overwrite").text(path)
    back = spark.read.text(path)
    assert back.count() == docs.count()
    assert {r.value for r in back.collect()} == {r.text for r in docs.collect()}


def test_zorder_layout_skips_files_on_both_dims(spark, sf_dir, tmp):
    # three layouts of lineitem, 16 files each; parquet footer min/max
    # per file decides whether a point predicate must read it. Z-order
    # must skip on BOTH partkey and suppkey; a single-column sort only
    # skips on its own column.
    import glob

    import pyarrow.parquet as pq

    from lightweight_vector_database_spark.functions.zorder import zorder_key

    li = load_table(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey")
    pk_max = li.agg(F.max("l_partkey")).first()[0]
    sk_max = li.agg(F.max("l_suppkey")).first()[0]
    zkey = zorder_key(
        ["l_partkey", "l_suppkey"], [(0, pk_max + 1), (0, sk_max + 1)], bits=12
    )

    layouts = {
        "natural": li.repartition(16),
        "sort_pk": li.repartitionByRange(16, "l_partkey").sortWithinPartitions("l_partkey"),
        "zorder": li.withColumn("zk", zkey)
        .repartitionByRange(16, "zk")
        .sortWithinPartitions("zk")
        .drop("zk"),
    }

    def files_touched(path: str, col: str, value: int) -> float:
        files = glob.glob(f"{path}/*.parquet")
        hit = 0
        for f in files:
            md = pq.ParquetFile(f).metadata
            names = md.schema.names
            ci = names.index(col)
            stats = [md.row_group(i).column(ci).statistics for i in range(md.num_row_groups)]
            lo = min(s.min for s in stats)
            hi = max(s.max for s in stats)
            if lo <= value <= hi:
                hit += 1
        return hit / len(files)

    frac = {}
    for name, df in layouts.items():
        path = f"{tmp}/zorder_{name}"
        df.write.mode("overwrite").parquet(path)
        frac[name] = {
            "pk": files_touched(path, "l_partkey", int(pk_max // 3)),
            "sk": files_touched(path, "l_suppkey", int(sk_max // 3)),
        }

    # natural layout: every file spans the full key range on both dims
    assert frac["natural"]["pk"] == 1.0 and frac["natural"]["sk"] == 1.0
    # single-column sort: perfect on its dim, useless on the other
    assert frac["sort_pk"]["pk"] <= 2 / 16
    assert frac["sort_pk"]["sk"] == 1.0
    # z-order: substantial skipping on BOTH dims
    assert frac["zorder"]["pk"] <= 0.5
    assert frac["zorder"]["sk"] <= 0.5


def test_write_jsonl_shards_bounds_records_per_file(spark, tmp_path):
    import glob
    import gzip
    import json as _json

    from lightweight_vector_database_spark.sources.sinks import write_jsonl_shards

    df = spark.range(1000).select(
        F.col("id").alias("doc_id"), F.concat(F.lit("t"), F.col("id")).alias("text")
    ).coalesce(2)
    out = str(tmp_path / "shards")
    write_jsonl_shards(df, out, max_records_per_file=150)
    files = sorted(glob.glob(out + "/part-*.json.gz"))
    assert len(files) >= 7  # 1000 rows / 150 cap -> at least ceil
    seen = []
    for f in files:
        with gzip.open(f, "rt") as fh:
            lines = fh.read().splitlines()
        assert 0 < len(lines) <= 150  # the per-file bound holds
        seen.extend(_json.loads(ln)["doc_id"] for ln in lines)
    assert sorted(seen) == list(range(1000))  # lossless export


def test_indexed_snapshot_is_one_file_per_cell(spark, tmp_path):
    import glob

    from lightweight_vector_database_spark.sources.sinks import (
        write_indexed_snapshot,
    )

    df = spark.range(2000).select(
        F.col("id").alias("vec_id"), (F.col("id") % 7).alias("cell_id")
    ).repartition(16)  # many write tasks -> uncompacted would fan out
    out = str(tmp_path / "snap")
    write_indexed_snapshot(df, out)
    for cell_dir in glob.glob(out + "/cell_id=*"):
        parts = glob.glob(cell_dir + "/part-*.parquet")
        assert len(parts) == 1, cell_dir  # compacted: one file per cell
