"""Training-pipeline queries, ninth batch (round 7): distributed
supervised training.

* ``quality_linear_probe`` — a linear quality/language probe (the
  CCNet/fasttext-style classifier slot in a curation pipeline) trained
  by 3 full-batch gradient-descent steps over cheap text features,
  entirely in dataflow (operators/linear.train_linear_gd). Squared
  loss, no transcendentals, micro-unit-quantized gradient sums — so
  the complete training run (every prediction, every gradient, every
  weight update) replays EXACTLY in unrolled SQL CTEs
  (w0 -> g1/w1 -> g2/w2 -> g3/w3), extending the fixed-iteration
  pinning family (PageRank, k-means, MMR) to supervised learning.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions import text as T
from ..operators.linear import prediction_expr, train_linear_gd
from ..sources import load_table
from . import register
from .text_suite import _NTOK, _PUNCT, _UNIQR

_LP_ITERS = 3
_LP_LR = 0.1
_LP_FEATURES = ["x0", "x1", "x2", "x3"]
_LP_NAMES = ["bias", "uniq_ratio", "punct_ratio", "len_term"]


def _features(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        F.lit(1.0).alias("x0"),
        T.uniq_token_ratio("text").alias("x1"),
        T.punct_ratio("text").alias("x2"),
        F.least(
            T.token_count("text").cast("double") / F.lit(64.0), F.lit(1.0)
        ).alias("x3"),
        F.when(F.col("lang") == "en", F.lit(1.0))
        .otherwise(F.lit(0.0))
        .alias("y"),
    )


def _linear_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    f = _features(spark, sf_dir)
    w = train_linear_gd(f, _LP_FEATURES, "y", iters=_LP_ITERS, lr=_LP_LR)
    resid = prediction_expr(w, _LP_FEATURES) - F.col("y")
    mse = f.agg(
        F.sum(F.floor((resid * resid) * F.lit(1e6)).cast("long")).alias("se"),
        F.count(F.lit(1)).alias("cnt"),
    ).select(
        F.lit("__mse").alias("feature"),
        F.round((F.col("se") / F.lit(1e6)) / F.col("cnt"), 6).alias("value"),
    )
    rows = None
    for name, wj in zip(_LP_NAMES, w):
        one = spark.range(1).select(
            F.lit(name).alias("feature"),
            F.round(F.lit(wj), 6).alias("value"),
        )
        rows = one if rows is None else rows.unionByName(one)
    return rows.unionByName(mse)


def _linear_oracle() -> str:
    nf = len(_LP_FEATURES)

    def pred(w: str) -> str:
        terms = [f"({w}.c{j} * f.x{j})" for j in range(nf)]
        e = terms[0]
        for t in terms[1:]:
            e = f"({e} + {t})"
        return e

    parts = [
        f"""f AS (
  SELECT 1.0 AS x0, {_UNIQR} AS x1, {_PUNCT} AS x2,
         least({_NTOK}::DOUBLE / 64.0, 1.0) AS x3,
         CASE WHEN lang = 'en' THEN 1.0 ELSE 0.0 END AS y
  FROM documents
), nn AS (SELECT count(*) AS n FROM f),
w0 AS (SELECT {', '.join(f'0.0 AS c{j}' for j in range(nf))})"""
    ]
    prev = "w0"
    for t in range(1, _LP_ITERS + 1):
        sums = ", ".join(
            f"sum(CAST(floor((({pred('w')} - f.y) * f.x{j}) * 1000000.0)"
            f" AS BIGINT)) AS s{j}"
            for j in range(nf)
        )
        updates = ", ".join(
            f"w.c{j} - {_LP_LR} * (((g.s{j} / 1000000.0) / nn.n) * 2.0) AS c{j}"
            for j in range(nf)
        )
        parts.append(
            f"""g{t} AS (
  SELECT {sums} FROM f CROSS JOIN {prev} w
), w{t} AS (
  SELECT {updates} FROM {prev} w CROSS JOIN g{t} g CROSS JOIN nn
)"""
        )
        prev = f"w{t}"
    ctes = ",\n".join(parts)
    weight_rows = "\nUNION ALL\n".join(
        f"SELECT '{name}' AS feature, round(c{j}, 6) AS value FROM {prev}"
        for j, name in enumerate(_LP_NAMES)
    )
    return f"""
WITH {ctes},
mse AS (
  SELECT sum(CAST(floor(((pred - y) * (pred - y)) * 1000000.0) AS BIGINT))
           AS se,
         count(*) AS cnt
  FROM (SELECT {pred('w')} AS pred, f.y FROM f CROSS JOIN {prev} w)
)
{weight_rows}
UNION ALL
SELECT '__mse', round((se / 1000000.0) / cnt, 6) FROM mse
"""


register("quality_linear_probe", _linear_probe, _linear_oracle())
