"""Generic per-group top-k with map-side reduction.

Generalizes the kNN partial-top-k trick (operators/knn.py) to any
(keys, ordering) pair: each input partition keeps only its local top-k
per key before the shuffle, so the window's exchange moves at most
#partitions x k x #keys rows instead of the full table. The exact
global window then runs on the reduced set.

Use strategy='window' when the table is small or already partitioned
by key; 'partial' for wide tables with modest k; 'auto' picks by
partition count like knn_join.
"""

from __future__ import annotations

from collections.abc import Iterator, Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def topk_per_group(
    df: DataFrame,
    keys: Sequence[str],
    order_col: str,
    k: int,
    ascending: bool = False,
    tiebreak: str | Sequence[str] | None = None,
    strategy: str = "auto",
    rank_col: str = "rank",
) -> DataFrame:
    """Top-k rows per key group by ``order_col`` (+ total tie-break —
    pass enough tiebreak columns to make the ordering unique, or ranks
    among equal rows are nondeterministic)."""
    keys = list(keys)
    ties = [tiebreak] if isinstance(tiebreak, str) else list(tiebreak or [])
    if strategy == "auto":
        strategy = "partial" if df.rdd.getNumPartitions() > 8 else "window"

    order = [F.col(order_col).asc() if ascending else F.col(order_col).desc()]
    order += [F.col(t).asc() for t in ties]

    reduced = df
    if strategy == "partial":
        import pandas as pd

        sort_cols = keys + [order_col] + ties
        asc_flags = [True] * len(keys) + [ascending] + [True] * len(ties)

        def local_topk(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            acc: list[pd.DataFrame] = []
            for pdf in batches:
                acc.append(
                    pdf.sort_values(sort_cols, ascending=asc_flags)
                    .groupby(keys, sort=False)
                    .head(k)
                )
            if acc:
                out = pd.concat(acc)
                yield (
                    out.sort_values(sort_cols, ascending=asc_flags)
                    .groupby(keys, sort=False)
                    .head(k)
                )

        reduced = df.mapInPandas(local_topk, schema=df.schema)

    w = Window.partitionBy(*keys).orderBy(*order)
    return (
        reduced.withColumn(rank_col, F.row_number().over(w))
        .filter(F.col(rank_col) <= k)
    )
