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

# The bit-interleave core (and its oracle-side SQL mirror) lives with
# the other scalar builders; re-exported here because the layout
# machinery is its main consumer.
from ..functions.zorder import zorder_value, zorder_value_sql  # noqa: F401


def quantize(c: Column, mn: Column, mx: Column, bits: int) -> Column:
    """Equal-width quantization of an integral column to [0, 2^bits).

    ``mn``/``mx`` are the (inclusive) column bounds — typically a
    broadcast one-row aggregate. Caller guarantees (mx - mn + 1) *
    2^bits < 2^52 so floor(a/b) over exact doubles is exact; rescale
    coarse-grained inputs (e.g. epoch seconds, not micros) first.
    """
    span = mx - mn + F.lit(1)
    return F.floor(((c - mn) * F.lit(1 << bits)) / span).cast("long")


def zbox_ranges(
    lo: list[int],
    hi: list[int],
    bits: int,
    min_level: int = 0,
    max_ranges: int = 64,
) -> list[tuple[int, int]]:
    """Decompose a quantized box [lo[d], hi[d]] per dim into merged
    z-value ranges covering it — the read path that turns a z-ordered
    layout into an index: ``zval BETWEEN a AND b OR ...`` pushes to
    the parquet scan and skips files/row-groups the box cannot touch.

    Quadtree recursion over aligned Morton blocks: a block fully
    inside the box emits its contiguous z-range, a disjoint one is
    skipped, a straddling one splits. ``min_level`` stops early by
    emitting straddling blocks whole, so the result may OVER-cover —
    callers must AND the exact box predicate (they should anyway);
    pruning only needs a superset. The recursion is driver-side pure
    Python over at most 4^bits blocks in the worst case, bounded in
    practice by ``max_ranges``: when the merged range count would
    exceed it, the decomposition retries one level coarser — range
    count stays small and plan size bounded no matter the box shape.
    """
    ndims = len(lo)
    if len(hi) != ndims:
        raise ValueError("lo/hi dimensionality mismatch")

    def decompose(stop_level: int) -> list[list[int]]:
        out: list[list[int]] = []

        def rec(prefix_z: int, level: int, mins: list[int]) -> None:
            size = 1 << level
            if any(
                mins[d] > hi[d] or mins[d] + size - 1 < lo[d]
                for d in range(ndims)
            ):
                return
            inside = all(
                lo[d] <= mins[d] and mins[d] + size - 1 <= hi[d]
                for d in range(ndims)
            )
            if inside or level <= stop_level:
                zmin = prefix_z << (level * ndims)
                out.append([zmin, zmin + (1 << (level * ndims)) - 1])
                return
            half = size >> 1
            for child in range(1 << ndims):
                rec(
                    (prefix_z << ndims) | child,
                    level - 1,
                    [mins[d] + ((child >> d) & 1) * half for d in range(ndims)],
                )

        rec(0, bits, [0] * ndims)
        out.sort()
        merged: list[list[int]] = []
        for a, b in out:
            if merged and a == merged[-1][1] + 1:
                merged[-1][1] = b
            else:
                merged.append([a, b])
        return merged

    for stop in range(min_level, bits + 1):
        merged = decompose(stop)
        if len(merged) <= max_ranges:
            return [(a, b) for a, b in merged]
    return [(0, (1 << (bits * ndims)) - 1)]


def zbox_filter(zcol: Column, ranges: list[tuple[int, int]]) -> Column:
    """OR of BETWEENs over ``zbox_ranges`` output — each range is a
    plain comparison pair, so the whole disjunction reaches the
    parquet reader as pushed filters on the (sorted) z column."""
    if not ranges:
        return F.lit(False)
    cond = zcol.between(ranges[0][0], ranges[0][1])
    for a, b in ranges[1:]:
        cond = cond | zcol.between(a, b)
    return cond


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
