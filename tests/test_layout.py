"""Z-order layout: Morton code properties and the pruning payoff.

The point of the layout is file skipping: after zorder_write, each
file's parquet footer min/max covers a compact region in EVERY
interleaved dimension, so a box predicate can skip most files — while
a single-key sort only prunes its own key. The pruning test reads the
ACTUAL per-file column ranges back and counts files a min/max-pruning
scanner would have to touch under each layout.
"""

from __future__ import annotations

import glob

import duckdb
import pytest
from pyspark.sql import functions as F

from lightweight_vector_database_spark.sources.layout import (
    zorder_value,
    zorder_write,
)


def _interleave_py(qs: list[int], bits: int) -> int:
    z = 0
    for d, q in enumerate(qs):
        for i in range(bits):
            z |= ((q >> i) & 1) << (i * len(qs) + d)
    return z


def test_zorder_value_matches_python_model(spark):
    rows = [(a, b) for a in (0, 1, 5, 127, 255) for b in (0, 3, 64, 255)]
    df = spark.createDataFrame(rows, "a long, b long")
    got = {
        (r.a, r.b): r.z
        for r in df.select(
            "a", "b", zorder_value([F.col("a"), F.col("b")], 8).alias("z")
        ).collect()
    }
    for a, b in rows:
        assert got[(a, b)] == _interleave_py([a, b], 8)


def test_zorder_value_locality(spark):
    """Adjacent cells differ only in low z-bits: the max z-spread of a
    2x2 quantized block is bounded, so near rows land near in z."""
    df = spark.createDataFrame(
        [(a, b) for a in range(16) for b in range(16)], "a long, b long"
    )
    z = {
        (r.a, r.b): r.z
        for r in df.select(
            "a", "b", zorder_value([F.col("a"), F.col("b")], 4).alias("z")
        ).collect()
    }
    # every aligned 2x2 block occupies exactly 4 consecutive z values
    for a in range(0, 16, 2):
        for b in range(0, 16, 2):
            vals = sorted(z[(a + i, b + j)] for i in (0, 1) for j in (0, 1))
            assert vals == list(range(vals[0], vals[0] + 4))


def test_zorder_value_rejects_overflow(spark):
    with pytest.raises(ValueError, match="exceeds a long"):
        zorder_value([F.lit(0), F.lit(0)], 32)


def _files_overlapping(path: str, col: str, lo: int, hi: int) -> tuple[int, int]:
    """(#files a min/max scanner reads, total files) for col BETWEEN
    lo AND hi, from each file's actual value range."""
    files = sorted(glob.glob(f"{path}/part-*.parquet"))
    hit = 0
    for f in files:
        mn, mx = duckdb.sql(
            f"SELECT min({col}), max({col}) FROM read_parquet('{f}')"
        ).fetchone()
        if mn is not None and mn <= hi and mx >= lo:
            hit += 1
    return hit, len(files)


def test_zorder_layout_prunes_both_dimensions(spark, tmp_path):
    """64 files over a uniform 256x256 (u, t) grid: each z-range file
    covers a ~32x32 block, so a 16-wide u-slice touches ~2 of 8 block
    columns; the t-sorted baseline's files all span the full u range
    and a min/max scanner reads every one."""
    grid = spark.range(1 << 16).select(
        (F.col("id") % 256).alias("u"),
        F.expr("id div 256").alias("t"),
    )
    zpath = str(tmp_path / "zorder")
    spath = str(tmp_path / "t_sorted")
    # u and t are already in [0, 256): quantization is the identity
    zorder_write(
        grid, zpath, zorder_value([F.col("u"), F.col("t")], 8), num_files=64
    )
    (
        grid.repartitionByRange(64, "t")
        .sortWithinPartitions("t")
        .write.mode("overwrite")
        .parquet(spath)
    )

    # narrow u-slice over ALL t: the shape single-key t-sorting cannot
    # prune at all
    lo, hi = 100, 115
    z_hit, z_total = _files_overlapping(zpath, "u", lo, hi)
    s_hit, s_total = _files_overlapping(spath, "u", lo, hi)
    assert s_hit == s_total  # baseline reads everything
    assert z_hit <= z_total // 2  # z-order skips at least half

    # and the layout loses no rows
    got = spark.read.parquet(zpath).filter(F.col("u").between(lo, hi))
    assert got.count() == 16 * 256


def test_zbox_ranges_exact_against_model():
    """min_level=0, generous max_ranges: the union of z-ranges contains
    exactly the box cells."""
    from lightweight_vector_database_spark.sources.layout import zbox_ranges

    bits = 4
    lo, hi = [3, 5], [11, 12]
    ranges = zbox_ranges(lo, hi, bits, max_ranges=10_000)
    covered = {
        z for a, b in ranges for z in range(a, b + 1)
    }
    for a in range(16):
        for b in range(16):
            z = _interleave_py([a, b], bits)
            in_box = lo[0] <= a <= hi[0] and lo[1] <= b <= hi[1]
            assert (z in covered) == in_box, (a, b)


def test_zbox_ranges_bounded_overcover():
    """A tight max_ranges forces coarser blocks: still a SUPERSET of
    the box, never more than max_ranges ranges."""
    from lightweight_vector_database_spark.sources.layout import zbox_ranges

    bits = 8
    lo, hi = [3, 5], [200, 118]
    ranges = zbox_ranges(lo, hi, bits, max_ranges=8)
    assert 0 < len(ranges) <= 8
    covered = []
    for a, b in ranges:
        assert a <= b
        covered.append((a, b))
    # superset: every box cell's z falls in some range
    import random

    rng = random.Random(7)
    for _ in range(500):
        a = rng.randint(lo[0], hi[0])
        b = rng.randint(lo[1], hi[1])
        z = _interleave_py([a, b], bits)
        assert any(x <= z <= y for x, y in covered), (a, b)


def test_zbox_read_path_prunes_and_matches(spark, tmp_path):
    """Reading a z-ordered layout through zbox_filter AND the exact box
    returns exactly the box rows while touching fewer files."""
    from lightweight_vector_database_spark.sources.layout import (
        zbox_filter,
        zbox_ranges,
    )

    grid = spark.range(1 << 16).select(
        (F.col("id") % 256).alias("u"),
        F.expr("id div 256").alias("t"),
    )
    zpath = str(tmp_path / "zbox")
    zorder_write(
        grid, zpath, zorder_value([F.col("u"), F.col("t")], 8), num_files=64
    )
    lo, hi = [40, 96], [55, 159]
    ranges = zbox_ranges(lo, hi, 8, max_ranges=32)
    data = spark.read.parquet(zpath)
    box = F.col("u").between(lo[0], hi[0]) & F.col("t").between(lo[1], hi[1])
    via_z = data.filter(zbox_filter(F.col("zval"), ranges) & box)
    assert via_z.count() == 16 * 64

    plan = via_z._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters" in plan and "zval" in plan

    # file skipping on the z column itself
    z_hit = 0
    files = sorted(glob.glob(f"{zpath}/part-*.parquet"))
    for f in files:
        mn, mx = duckdb.sql(
            f"SELECT min(zval), max(zval) FROM read_parquet('{f}')"
        ).fetchone()
        if any(a <= mx and b >= mn for a, b in ranges):
            z_hit += 1
    assert z_hit < len(files) // 2


def test_zbox_ranges_three_dims():
    """The decomposition is dimension-generic: exact cover in 3-D."""
    from lightweight_vector_database_spark.sources.layout import zbox_ranges

    bits = 3
    lo, hi = [1, 2, 0], [5, 7, 3]
    ranges = zbox_ranges(lo, hi, bits, max_ranges=1 << 20)
    covered = {z for a, b in ranges for z in range(a, b + 1)}
    for a in range(8):
        for b in range(8):
            for c in range(8):
                z = _interleave_py([a, b, c], bits)
                in_box = all(l <= v <= h for l, v, h in zip(lo, (a, b, c), hi))
                assert (z in covered) == in_box, (a, b, c)
