"""Z-order (Morton) clustering key for multi-dimensional data skipping.

At 100 TB the fastest scan is the one that never reads the file:
parquet keeps min/max stats per file and row group, and Spark prunes
scans with them. Sorting by ONE column gives perfect skipping on that
column and none on any other; interleaving the bits of several columns
gives good (not perfect) skipping on EACH of them — the standard
layout trick for multi-predicate fact tables (same idea as Delta/
Iceberg Z-ORDER, here as a pure Column expression so it works with
plain `repartitionByRange(key).sortWithinPartitions(key)` writes).

Pure codegen: per column, normalize into [0, 2^bits) with fixed
bounds, then OR each bit into its interleaved position. No UDF, no
shuffle beyond the clustering write itself.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column
from pyspark.sql import functions as F


def zorder_key(
    cols: Sequence[Column | str],
    bounds: Sequence[tuple[float, float]],
    bits: int = 16,
) -> Column:
    """Morton-interleave up to ~4 columns into one orderable long.

    ``bounds`` are per-column (lo, hi) used to quantize values into
    ``bits``-bit integers (clamped — same contract as the grid index's
    equal-width bins, kd_tree_database.py:59-70). Total bits
    len(cols)*bits must stay < 63.
    """
    n = len(cols)
    if n * bits >= 63:
        raise ValueError(f"{n} cols x {bits} bits overflows a long")
    if len(bounds) != n:
        raise ValueError("need one (lo, hi) per column")

    key = F.lit(0).cast("long")
    for ci, (c, (lo, hi)) in enumerate(zip(cols, bounds)):
        col = F.col(c) if isinstance(c, str) else c
        width = float(hi) - float(lo)
        q = F.floor(
            (col.cast("double") - F.lit(float(lo))) / F.lit(width) * F.lit(float(1 << bits))
        ).cast("long")
        q = F.least(F.greatest(q, F.lit(0)), F.lit((1 << bits) - 1))
        for b in range(bits):
            bit = F.shiftright(q, b).bitwiseAND(F.lit(1))
            key = key.bitwiseOR(F.shiftleft(bit, b * n + ci))
    return key
