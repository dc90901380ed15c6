"""Training-pipeline queries, sixth batch (round 7): hard-negative
mining and the CSV / ORC interchange edges.

* ``mine_hard_negatives`` — per-anchor nearest different-label vector
  (operators/mining.py), the contrastive-pair mining op; one
  partial-aggregating min(struct) per anchor, no window;
* ``csv_roundtrip_docs`` / ``orc_roundtrip_docs`` — corpus out to
  RFC-4180 gzipped CSV / zlib ORC and back, value-checked against the
  parquet source with an order-insensitive md5 content checksum (same
  contract as ``jsonl_roundtrip_docs``) — a hash match proves the edge
  round-trips every row and every text byte.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.mining import hard_negatives
from ..probes import DIM
from ..sources import load_table
from ..sources.text_formats import read_csv, read_orc, write_csv, write_orc
from . import register
from .pipeline_suite import _DOCS_SCHEMA, _REPO_ROOT, _sf_tag

# --- hard negatives ----------------------------------------------------------

_HN_MAX_ANCHOR = 20


def _mine_hard_negatives(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    anchors = emb.filter(F.col("vec_id") <= _HN_MAX_ANCHOR)
    out = hard_negatives(anchors, emb, metric="euclidean_sq")
    return out.select(
        "anchor_id",
        "anchor_label",
        "neg_id",
        "neg_label",
        F.round(F.col("dist"), 6).alias("dist"),
    )


register(
    "mine_hard_negatives",
    _mine_hard_negatives,
    f"""
WITH a AS (
  SELECT vec_id AS anchor_id, label AS anchor_label, embedding AS av
  FROM embeddings WHERE vec_id <= {_HN_MAX_ANCHOR}
), p AS (
  SELECT a.anchor_id, a.anchor_label,
         e.vec_id AS neg_id, e.label AS neg_label,
         list_sum(list_transform(range(1, {DIM + 1}),
           i -> (CAST(e.embedding[i] AS DOUBLE) - CAST(a.av[i] AS DOUBLE))
              * (CAST(e.embedding[i] AS DOUBLE) - CAST(a.av[i] AS DOUBLE))))
           AS dist
  FROM embeddings e JOIN a ON e.label <> a.anchor_label
), r AS (
  SELECT *, row_number() OVER (
    PARTITION BY anchor_id ORDER BY dist ASC, neg_id ASC) AS rn
  FROM p
)
SELECT anchor_id, anchor_label, neg_id, neg_label, round(dist, 6) AS dist
FROM r WHERE rn = 1
""",
)


# --- CSV / ORC round trips -----------------------------------------------------

_ROUNDTRIP_ORACLE = """
SELECT source, count(*) AS n_docs,
       CAST(sum(n_chars) AS BIGINT) AS sum_chars,
       CAST(sum(('0x' || substr(md5(text), 1, 8))::BIGINT) AS BIGINT)
         AS text_checksum
FROM documents GROUP BY source
"""


def _checksum_stats(back: DataFrame) -> DataFrame:
    checksum = F.conv(F.substring(F.md5(F.col("text")), 1, 8), 16, 10).cast(
        "long"
    )
    return back.groupBy("source").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_chars").alias("sum_chars"),
        F.sum(checksum).alias("text_checksum"),
    )


def _csv_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    root = os.path.join(_REPO_ROOT, ".csv_cache")
    path = os.path.join(root, f"docs_{_sf_tag(sf_dir)}")
    if not os.path.exists(os.path.join(path, "_SUCCESS")):
        os.makedirs(root, exist_ok=True)
        write_csv(load_table(spark, sf_dir, "documents"), path)
    return _checksum_stats(read_csv(spark, path, _DOCS_SCHEMA))


register("csv_roundtrip_docs", _csv_roundtrip, _ROUNDTRIP_ORACLE)


def _orc_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    root = os.path.join(_REPO_ROOT, ".orc_cache")
    path = os.path.join(root, f"docs_{_sf_tag(sf_dir)}")
    if not os.path.exists(os.path.join(path, "_SUCCESS")):
        os.makedirs(root, exist_ok=True)
        write_orc(load_table(spark, sf_dir, "documents"), path)
    return _checksum_stats(read_orc(spark, path))


register("orc_roundtrip_docs", _orc_roundtrip, _ROUNDTRIP_ORACLE)
