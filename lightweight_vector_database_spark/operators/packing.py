"""Sequence packing — concat-and-chunk for training-data pipelines.

LLM pretraining packs documents head-to-tail into fixed-length
sequences: each document's global token offset determines which
training chunk(s) it lands in. The offset is a PREFIX SUM over all
documents in a deterministic order — and the naive Spark spelling
(``sum().over(Window.orderBy(id))``) is a single-partition window, the
classic scale-killer (Spark itself warns "No Partition Defined for
Window operation").

``pack_sequences`` computes the same prefix sum distributed, the
textbook two-level scan:

1. one tiny agg gets the id range; docs are bucketed by
   ``floor(id / B)`` — order-aligned buckets, so prefix(bucket k) =
   total(buckets < k) + local prefix;
2. a per-bucket window (partitioned — parallel) computes local
   prefixes;
3. bucket totals (``n_buckets`` rows) are cumsum'd on the driver and
   broadcast-joined back.

Output is byte-identical to the global-window form (the oracle
computes exactly that in SQL), but every stage is partitioned: at
100 TB the only serial work is the n_buckets-row cumsum.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.text import token_count


def pack_sequences(
    docs: DataFrame,
    seq_len: int,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = 64,
) -> DataFrame:
    """(id, n_tokens, start_offset, chunk_id, n_chunks) per document,
    packing in ascending ``id_col`` order.

    ``start_offset`` = total tokens of all earlier documents;
    ``chunk_id`` = floor(start_offset / seq_len) — the training chunk
    holding the document's first token; ``n_chunks`` = how many chunks
    the document spans (long docs straddle boundaries).
    """
    if seq_len < 1:
        raise ValueError("seq_len must be >= 1")
    if n_buckets < 1:
        raise ValueError("n_buckets must be >= 1")

    sized = docs.select(
        F.col(id_col), token_count(text_col).cast("long").alias("n_tokens")
    )
    rng = sized.agg(
        F.min(id_col).alias("lo"), F.max(id_col).alias("hi")
    ).first()
    if rng.lo is None:
        return sized.withColumns(
            {
                "start_offset": F.lit(0).cast("long"),
                "chunk_id": F.lit(0).cast("long"),
                "n_chunks": F.lit(0).cast("long"),
            }
        )
    span = int(rng.hi) - int(rng.lo) + 1
    width = max(1, -(-span // n_buckets))  # ceil
    bucketed = sized.withColumn(
        "__bucket",
        F.floor((F.col(id_col) - F.lit(int(rng.lo))) / F.lit(width)).cast("long"),
    )

    # per-bucket inclusive prefix — the window is PARTITIONED, so this
    # parallelizes across buckets (contrast: Window.orderBy(id) alone
    # is one task holding the whole table)
    w = (
        Window.partitionBy("__bucket")
        .orderBy(F.col(id_col).asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    local = bucketed.withColumn("__incl", F.sum("n_tokens").over(w))

    # bucket totals: n_buckets rows -> driver cumsum -> broadcast back
    totals = {
        r["__bucket"]: r["total"]
        for r in bucketed.groupBy("__bucket")
        .agg(F.sum("n_tokens").alias("total"))
        .collect()
    }
    offsets, acc = [], 0
    for b in sorted(totals):
        offsets.append((b, acc))
        acc += int(totals[b])
    off_df = docs.sparkSession.createDataFrame(
        offsets, "__bucket long, __base long"
    )

    start = F.col("__base") + F.col("__incl") - F.col("n_tokens")
    end_incl = start + F.greatest(F.col("n_tokens"), F.lit(1)) - 1
    return (
        local.join(F.broadcast(off_df), "__bucket")
        .select(
            id_col,
            "n_tokens",
            start.alias("start_offset"),
            F.floor(start / F.lit(seq_len)).cast("long").alias("chunk_id"),
            (
                F.floor(end_incl / F.lit(seq_len))
                - F.floor(start / F.lit(seq_len))
                + 1
            ).cast("long")
            .alias("n_chunks"),
        )
    )
