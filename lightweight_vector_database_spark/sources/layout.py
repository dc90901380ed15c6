"""Z-order (Morton curve) data layout for multi-dimensional scan pruning.

A 100 TB table can be sorted/partitioned on only ONE key; a filter on
any other column then reads every file. Interleaving the bits of
several quantized key columns into one Morton code and range-
partitioning + sorting on it clusters rows that are close in EVERY
dimension into the same files, so parquet min/max footer stats prune
multi-dimensional box predicates — the lakehouse ``OPTIMIZE ZORDER``
technique (Delta/Iceberg), built here from pure Catalyst expressions
(shifts/masks in whole-stage codegen; no UDF, no Python).

The quantization is the grid index's exact integer arithmetic
(plans/grid_index.py): equal-width bins over [mn, mx], computed as
``floor((x - mn) * 2^bits / (mx - mn + 1))`` with all inputs integral
so the double division is exact (products stay far below 2^52 for the
supported bit widths) and bit-identical in portable SQL.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def quantize(c: Column, mn: Column, mx: Column, bits: int) -> Column:
    """Equal-width quantization of an integral column to [0, 2^bits).

    ``mn``/``mx`` are the (inclusive) column bounds — typically a
    broadcast one-row aggregate. Caller guarantees (mx - mn + 1) *
    2^bits < 2^52 so floor(a/b) over exact doubles is exact; rescale
    coarse-grained inputs (e.g. epoch seconds, not micros) first.
    """
    span = mx - mn + F.lit(1)
    return F.floor(((c - mn) * F.lit(1 << bits)) / span).cast("long")


def zorder_value(qcols: list[Column], bits: int = 16) -> Column:
    """Morton code of pre-quantized columns (each in [0, 2^bits)):
    bit i of dim d lands at position i*D + d. Pure shifts and masks —
    one codegen expression, 100 TB-safe. D * bits must be <= 63."""
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


def zorder_value_sql(qexprs: list[str], bits: int = 16) -> str:
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


def zorder_write(
    df: DataFrame,
    path: str,
    zcol: Column,
    num_files: int,
    mode: str = "overwrite",
) -> None:
    """Write ``df`` clustered by the given Morton code: range-partition
    into ``num_files`` z-ranges and sort within each, so every file
    covers a compact hyper-rectangle-ish region and its min/max footer
    stats are tight in every interleaved dimension. The z column is
    kept in the output (it is the cluster key — useful for later
    re-compaction and range addressing)."""
    (
        df.withColumn("zval", zcol)
        .repartitionByRange(num_files, "zval")
        .sortWithinPartitions("zval")
        .write.mode(mode)
        .parquet(path)
    )
