"""Round-7 pipeline ops, ninth batch: distributed linear-probe GD."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from lightweight_vector_database_spark.operators.linear import (
    prediction_expr,
    train_linear_gd,
)


def _fixture(spark):
    # y = 0.5 + 0.25 * x, exactly representable weights
    rows = [(1.0, x / 4.0, 0.5 + 0.25 * (x / 4.0)) for x in range(-8, 9)]
    return spark.createDataFrame(rows, "x0 double, x1 double, y double")


def _mse(df, w):
    resid = prediction_expr(w, ["x0", "x1"]) - F.col("y")
    return df.agg(F.avg(resid * resid)).collect()[0][0]


def test_gd_descends_and_approaches_truth(spark):
    df = _fixture(spark)
    w1 = train_linear_gd(df, ["x0", "x1"], "y", iters=1, lr=0.2)
    w30 = train_linear_gd(df, ["x0", "x1"], "y", iters=30, lr=0.2)
    assert _mse(df, w30) < _mse(df, w1) < _mse(df, [0.0, 0.0])
    assert w30[0] == pytest.approx(0.5, abs=0.05)
    assert w30[1] == pytest.approx(0.25, abs=0.05)


def test_gd_deterministic_across_runs(spark):
    df = _fixture(spark).repartition(7)  # layout must not matter
    a = train_linear_gd(df, ["x0", "x1"], "y", iters=5, lr=0.2)
    b = train_linear_gd(df, ["x0", "x1"], "y", iters=5, lr=0.2)
    assert a == b  # exact — integer micro-unit gradient sums


def test_gd_validates_args(spark):
    df = _fixture(spark)
    with pytest.raises(ValueError):
        train_linear_gd(df, [], "y", iters=1, lr=0.1)
    with pytest.raises(ValueError):
        train_linear_gd(df, ["x0"], "y", iters=0, lr=0.1)
    with pytest.raises(ValueError):
        train_linear_gd(df.filter(F.lit(False)), ["x0"], "y", iters=1, lr=0.1)


def test_prediction_expr_association(spark):
    df = spark.createDataFrame([(2.0, 3.0)], "a double, b double")
    got = df.select(
        prediction_expr([10.0, 100.0], ["a", "b"]).alias("p")
    ).collect()[0]["p"]
    assert got == 10.0 * 2.0 + 100.0 * 3.0
