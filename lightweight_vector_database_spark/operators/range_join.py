"""Banded range join — the scale path for point-in-interval joins.

A theta join like ``l.val BETWEEN r.lo AND r.hi`` compiles to a
(broadcast) nested-loop join: fine when one side broadcasts, a
scale-killer when both sides are large — O(|L|x|R|) comparisons and
no shuffle partitioning to parallelize over.

``banded_range_join`` rewrites it as an EQUI-join: pick a band width
W, give every left row the band ``floor(val / W)``, explode every
right interval into the bands it overlaps (``sequence(floor(lo/W),
floor(hi/W))`` — at most ``ceil(span/W)+1`` rows), hash-join on the
band id (plus any extra equality keys), and apply the exact range as
a residual filter. Work becomes O(|L| + |R| * span/W + matches),
shuffled on the band key — linear, partitionable, AQE-skew-splittable.
This is the standard bucketized range-join optimization documented
publicly for Spark-family engines; results are EXACTLY the theta
join's (each (l, r) candidate pair meets in exactly one band: the
band of l.val, hence no duplicates and no misses).

Band width is the one knob: ~the typical interval span is right
(each interval explodes into ~2 bands). A width far below the span
multiplies the right side; far above it degrades toward one giant
band (all-pairs within the band).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_BAND = "__range_band"


def banded_range_join(
    left: DataFrame,
    right: DataFrame,
    left_val: str | Column,
    right_lo: str | Column,
    right_hi: str | Column,
    band_width: float,
    extra_on: Sequence[str] = (),
    how: str = "inner",
) -> DataFrame:
    """Rows of ``left`` joined to the ``right`` intervals containing
    ``left_val`` (inclusive bounds), via a banded equi-join.

    ``extra_on``: additional equality keys (joined alongside the band,
    so they also co-partition the shuffle). ``how``: "inner" or
    "left_semi" (the two shapes where banding is correctness-neutral;
    outer variants would need unmatched-row recovery across bands).
    """
    if band_width <= 0:
        raise ValueError("band_width must be positive")
    if how not in ("inner", "left_semi", "leftsemi", "semi"):
        raise ValueError(
            "banded_range_join supports inner/left_semi; outer forms "
            "would surface unmatched rows once per band"
        )
    lval = F.col(left_val) if isinstance(left_val, str) else left_val
    rlo = F.col(right_lo) if isinstance(right_lo, str) else right_lo
    rhi = F.col(right_hi) if isinstance(right_hi, str) else right_hi

    l2 = left.withColumn(_BAND, F.floor(lval / F.lit(band_width)).cast("long"))
    # empty intervals (hi < lo) match nothing: sequence() under ANSI
    # rejects start > stop, so guard with an empty band array
    lo_band = F.floor(rlo / F.lit(band_width)).cast("long")
    hi_band = F.floor(rhi / F.lit(band_width)).cast("long")
    r2 = right.withColumn(
        _BAND,
        F.explode(
            F.when(hi_band >= lo_band, F.sequence(lo_band, hi_band)).otherwise(
                F.array().cast("array<long>")
            )
        ),
    )
    on = [_BAND, *extra_on]
    # residual references must bind to their OWNING side: with string
    # args and a column name shared by both inputs, a bare F.col(name)
    # in a post-join expression is ambiguous (or silently binds to the
    # wrong side) — resolve through l2/r2 instead. Column args stay
    # as passed: the caller already chose their binding.
    lres = l2[left_val] if isinstance(left_val, str) else lval
    rlo_res = r2[right_lo] if isinstance(right_lo, str) else rlo
    rhi_res = r2[right_hi] if isinstance(right_hi, str) else rhi
    residual = (lres >= rlo_res) & (lres <= rhi_res)
    if how in ("left_semi", "leftsemi", "semi"):
        # semi needs the residual INSIDE the join (right columns are
        # not visible afterwards)
        cond = residual
        for k in on:
            cond = cond & (l2[k] == r2[k])
        return l2.join(r2, cond, "left_semi").drop(_BAND)
    return l2.join(r2, on, "inner").filter(residual).drop(_BAND)
