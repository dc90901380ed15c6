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


def zorder_value(qcols: Sequence[Column], bits: int = 16) -> Column:
    """Morton code of pre-quantized columns (each in [0, 2^bits)):
    bit i of dim d lands at position i*D + d. Pure shifts and masks —
    one codegen expression. D * bits must be <= 63. The quantization
    step lives with the caller (float bounds + clamp in
    ``zorder_key``; exact-integer, oracle-portable arithmetic in
    sources/layout.py::quantize)."""
    ndims = len(qcols)
    if ndims * bits > 63:
        raise ValueError(f"{ndims} dims x {bits} bits exceeds a long")
    total = F.lit(0).cast("long")
    for d, q in enumerate(qcols):
        q = q.cast("long")
        for i in range(bits):
            bit = F.shiftright(q, i).bitwiseAND(F.lit(1))
            total = total.bitwiseOR(F.shiftleft(bit, i * ndims + d))
    return total


def zorder_value_sql(qexprs: Sequence[str], bits: int = 16) -> str:
    """DuckDB expression mirroring ``zorder_value`` bit for bit, for
    the oracle side. ``qexprs`` are SQL expressions already quantized
    to [0, 2^bits)."""
    ndims = len(qexprs)
    # DuckDB/Postgres give <<, & and | EQUAL precedence (left-assoc),
    # so every term must be fully parenthesized or the ORs nest into
    # the shifts.
    terms = [
        f"(((({q}) >> {i}) & 1) << {i * ndims + d})"
        for d, q in enumerate(qexprs)
        for i in range(bits)
    ]
    return "(" + " | ".join(terms) + ")"


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

    qcols = []
    for c, (lo, hi) in zip(cols, bounds):
        col = F.col(c) if isinstance(c, str) else c
        width = float(hi) - float(lo)
        q = F.floor(
            (col.cast("double") - F.lit(float(lo))) / F.lit(width) * F.lit(float(1 << bits))
        ).cast("long")
        qcols.append(F.least(F.greatest(q, F.lit(0)), F.lit((1 << bits) - 1)))
    return zorder_value(qcols, bits)
