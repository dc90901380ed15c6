"""Round-7 pipeline ops, sixth batch: hard-negative mining, CSV/ORC
interchange edges."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from lightweight_vector_database_spark.operators.mining import hard_negatives
from lightweight_vector_database_spark.sources.text_formats import (
    read_csv,
    read_orc,
    write_csv,
    write_orc,
)


# --- hard negatives ------------------------------------------------------------


def _emb(spark, rows):
    return spark.createDataFrame(
        rows, "vec_id long, label int, embedding array<float>"
    )


def test_hard_negatives_nearest_other_label(spark):
    base = _emb(
        spark,
        [
            (1, 0, [0.0, 0.0]),
            (2, 0, [0.1, 0.0]),   # same label as anchor — never a negative
            (3, 1, [1.0, 0.0]),   # nearest different-label
            (4, 1, [5.0, 0.0]),
            (5, 2, [2.0, 0.0]),
        ],
    )
    anchors = base.filter(F.col("vec_id") == 1)
    r = hard_negatives(anchors, base).collect()[0]
    assert (r["anchor_id"], r["neg_id"], r["neg_label"]) == (1, 3, 1)
    assert r["dist"] == pytest.approx(1.0)


def test_hard_negatives_tie_breaks_to_smaller_id(spark):
    base = _emb(
        spark,
        [
            (1, 0, [0.0, 0.0]),
            (7, 1, [1.0, 0.0]),
            (3, 1, [-1.0, 0.0]),  # same distance, smaller id wins
        ],
    )
    anchors = base.filter(F.col("vec_id") == 1)
    assert hard_negatives(anchors, base).collect()[0]["neg_id"] == 3


def test_hard_negatives_unknown_metric(spark):
    df = _emb(spark, [(1, 0, [0.0])])
    with pytest.raises(KeyError):
        hard_negatives(df, df, metric="nope")


def test_hard_negatives_cosine_metric(spark):
    base = _emb(
        spark,
        [
            (1, 0, [1.0, 0.0]),
            (2, 1, [0.9, 0.1]),   # nearly parallel -> cosine-nearest
            (3, 1, [0.0, 1.0]),   # orthogonal
        ],
    )
    anchors = base.filter(F.col("vec_id") == 1)
    r = hard_negatives(anchors, base, metric="cosine").collect()[0]
    assert r["neg_id"] == 2


# --- CSV / ORC edges -----------------------------------------------------------

_NASTY = [
    (1, 'comma, inside', "en"),
    (2, 'quote " inside', "de"),
    (3, "newline\ninside", "fr"),
    (4, "both, \"and\"\nmore", "en"),
    (5, "plain", "es"),
]
_SCHEMA = "id bigint, text string, lang string"


def test_csv_roundtrip_rfc4180(spark, tmp_path):
    df = spark.createDataFrame(_NASTY, _SCHEMA)
    path = os.path.join(str(tmp_path), "csv")
    write_csv(df, path, compression=None)
    # Spark's CSV reader needs multiLine for embedded newlines; the
    # writer quotes them correctly — prove the written bytes parse.
    back = (
        spark.read.schema(_SCHEMA)
        .option("header", True)
        .option("quote", '"')
        .option("escape", '"')
        .option("multiLine", True)
        .csv(path)
    )
    got = {(r["id"], r["text"], r["lang"]) for r in back.collect()}
    assert got == set(_NASTY)


def test_csv_roundtrip_simple_no_multiline(spark, tmp_path):
    rows = [(i, f"text {i} with, commas and \"quotes\"", "en") for i in range(10)]
    df = spark.createDataFrame(rows, _SCHEMA)
    path = os.path.join(str(tmp_path), "csv2")
    write_csv(df, path)  # gzip default
    got = {
        (r["id"], r["text"], r["lang"])
        for r in read_csv(spark, path, _SCHEMA).collect()
    }
    assert got == set(rows)


def test_orc_roundtrip_with_array_column(spark, tmp_path):
    rows = [(i, [float(i), float(i) / 2], f"t{i}") for i in range(20)]
    df = spark.createDataFrame(rows, "id bigint, vec array<double>, s string")
    path = os.path.join(str(tmp_path), "orc")
    write_orc(df, path)
    back = read_orc(spark, path)
    assert back.schema.simpleString() == df.schema.simpleString()
    got = {(r["id"], tuple(r["vec"]), r["s"]) for r in back.collect()}
    assert got == {(i, (float(i), float(i) / 2), f"t{i}") for i in range(20)}
