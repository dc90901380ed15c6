"""Sequence packing: the distributed two-level prefix sum must be
byte-identical to the naive single-partition global window."""

from __future__ import annotations

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from lightweight_vector_database_spark.functions.text import token_count
from lightweight_vector_database_spark.operators.packing import pack_sequences
from lightweight_vector_database_spark.sources import load_table

SEQ = 512


def _naive(docs, seq_len):
    w = (
        Window.orderBy(F.col("doc_id").asc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    sized = docs.select(
        "doc_id", token_count("text").cast("long").alias("n_tokens")
    )
    start = F.coalesce(F.sum("n_tokens").over(w), F.lit(0))
    end_incl = start + F.greatest(F.col("n_tokens"), F.lit(1)) - 1
    return sized.select(
        "doc_id",
        "n_tokens",
        start.alias("start_offset"),
        F.floor(start / seq_len).cast("long").alias("chunk_id"),
        (F.floor(end_incl / seq_len) - F.floor(start / seq_len) + 1)
        .cast("long")
        .alias("n_chunks"),
    )


def test_matches_global_window(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    want = {tuple(r) for r in _naive(docs, SEQ).collect()}
    for buckets in (1, 7, 64):  # result must be bucketing-invariant
        got = {
            tuple(r)
            for r in pack_sequences(docs, SEQ, n_buckets=buckets).collect()
        }
        assert got == want, f"n_buckets={buckets}"


def test_offsets_are_contiguous(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    rows = sorted(
        pack_sequences(docs, SEQ).collect(), key=lambda r: r.doc_id
    )
    acc = 0
    for r in rows:
        assert r.start_offset == acc
        acc += r.n_tokens
    # a doc spanning k chunks covers exactly its token range
    for r in rows:
        if r.n_tokens:
            assert r.chunk_id * SEQ <= r.start_offset
            assert (r.chunk_id + r.n_chunks) * SEQ > r.start_offset + r.n_tokens - 1


def test_plan_has_no_global_window(spark, sf_dir):
    # the point of the operator: no single-partition window anywhere
    docs = load_table(spark, sf_dir, "documents")
    plan = (
        pack_sequences(docs, SEQ)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # a partitioned window shows its partition spec; the dangerous form
    # is a Window with an empty partition clause
    assert "Window [" not in plan or "__bucket" in plan


def test_guards_and_empty(spark):
    empty = spark.createDataFrame([], "doc_id long, text string")
    assert pack_sequences(empty, SEQ).count() == 0
    with pytest.raises(ValueError, match="seq_len"):
        pack_sequences(empty, 0)
    with pytest.raises(ValueError, match="n_buckets"):
        pack_sequences(empty, SEQ, n_buckets=0)
