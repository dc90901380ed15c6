"""as-of join semantics vs a hand-built expected result."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

from lightweight_vector_database_spark.operators.asof import asof_join


def _t(s: str) -> dt.datetime:
    return dt.datetime.fromisoformat(s)


@pytest.fixture(scope="module")
def frames(spark):
    trades = spark.createDataFrame(
        [
            (1, "A", _t("2024-01-01 10:00:00")),
            (2, "A", _t("2024-01-01 10:05:00")),
            (3, "B", _t("2024-01-01 10:00:30")),
            (4, "C", _t("2024-01-01 09:00:00")),  # no quote yet -> null
        ],
        StructType(
            [
                StructField("trade_id", LongType()),
                StructField("sym", StringType()),
                StructField("ts", TimestampType()),
            ]
        ),
    )
    quotes = spark.createDataFrame(
        [
            (10, "A", _t("2024-01-01 09:59:00"), 1.0),
            (11, "A", _t("2024-01-01 10:00:00"), 2.0),  # tie with trade 1: inclusive
            (12, "A", _t("2024-01-01 10:04:00"), 3.0),
            (13, "B", _t("2024-01-01 10:00:00"), 4.0),
            (14, "B", _t("2024-01-01 10:00:00"), 5.0),  # same ts: max quote_id wins
            (15, "C", _t("2024-01-01 12:00:00"), 9.0),
        ],
        StructType(
            [
                StructField("quote_id", LongType()),
                StructField("sym", StringType()),
                StructField("qts", TimestampType()),
                StructField("px", DoubleType()),
            ]
        ),
    )
    return trades, quotes


def test_asof_backward(frames):
    trades, quotes = frames
    out = asof_join(
        trades, quotes, on=["sym"], left_ts="ts", right_ts="qts",
        right_cols=["quote_id", "px"], tiebreak="quote_id",
    )
    got = {r.trade_id: (r.asof_quote_id, r.asof_px) for r in out.collect()}
    assert got[1] == (11, 2.0)  # equal ts is inclusive
    assert got[2] == (12, 3.0)
    assert got[3] == (14, 5.0)  # tie at same ts -> max tiebreak
    assert got[4] == (None, None)  # nothing at-or-before


def test_asof_forward(frames):
    trades, quotes = frames
    out = asof_join(
        trades, quotes, on=["sym"], left_ts="ts", right_ts="qts",
        right_cols=["quote_id", "px"], tiebreak="quote_id",
        direction="forward",
    )
    got = {r.trade_id: r.asof_quote_id for r in out.collect()}
    assert got[1] == 11  # equal ts inclusive in forward too
    assert got[2] is None  # no quote after 10:05
    assert got[4] == 15


def test_asof_matches_pandas_merge_asof(spark):
    """Differential vs pandas.merge_asof on seeded random data — an
    independent implementation of the same semantics."""
    import numpy as np
    import pandas as pd

    rng = np.random.RandomState(7)
    base = pd.Timestamp("2024-01-01")
    left = pd.DataFrame(
        {
            "lid": np.arange(200),
            "key": rng.randint(0, 5, 200),
            "ts": base + pd.to_timedelta(rng.randint(0, 100_000, 200), unit="s"),
        }
    ).sort_values("ts").reset_index(drop=True)
    right = pd.DataFrame(
        {
            "rid": np.arange(300),
            "key": rng.randint(0, 5, 300),
            "rts": base + pd.to_timedelta(rng.randint(0, 100_000, 300), unit="s"),
            "px": rng.randn(300).round(6),
        }
    ).sort_values("rts").reset_index(drop=True)
    # make (key, rts) unique so the match is unambiguous for both impls
    right = right.drop_duplicates(["key", "rts"]).reset_index(drop=True)

    expected = pd.merge_asof(
        left, right, left_on="ts", right_on="rts", by="key", direction="backward"
    )

    ldf = spark.createDataFrame(left)
    rdf = spark.createDataFrame(right)
    got = {
        r.lid: r.asof_rid
        for r in asof_join(
            ldf, rdf, on=["key"], left_ts="ts", right_ts="rts",
            right_cols=["rid", "px"], tiebreak="rid",
        ).collect()
    }
    for _, row in expected.iterrows():
        exp = None if pd.isna(row["rid"]) else int(row["rid"])
        assert got[int(row["lid"])] == exp
