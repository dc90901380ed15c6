"""Fuzzy (edit-distance) joins with sound blocking — entity resolution.

Record linkage over 100 TB cannot compare all pairs; the standard
shape (Ed-Join / PassJoin family) is *block → verify*: a cheap
blocking join proposes candidates, an exact predicate verifies.  This
operator uses **length-band blocking**, which is SOUND (never misses a
true match): ``|len(a) - len(b)| <= d`` is a lower bound on edit
distance, so with band width ``L > d`` every pair within distance d
falls in the same or adjacent length band — a 3-way banded equi-join
(the same banded rewrite ``operators/range_join.py`` uses for numeric
range joins).  Verification is Spark's built-in ``levenshtein``
(JVM codegen, same definition as DuckDB's — the oracle replays the
whole join as a theta-join + levenshtein filter).

An optional second blocking key (``extra_block``, e.g. a first token
or a phonetic code) multiplies selectivity; it must itself be sound
for the caller's notion of a match — the docstring contract, not
checked.

Skew note: bands are length-frequency buckets; natural-language name
columns concentrate in a few bands, so the within-band candidate count
is the cost driver.  At 100 TB add ``extra_block`` (sound key) or
tighten ``band_width`` toward ``max_dist + 1`` to cut band volume.

The reference (513-LoC kd-tree) has no string surface; north-star
pipeline machinery.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def fuzzy_join(
    left: DataFrame,
    right: DataFrame,
    left_col: str,
    right_col: str,
    max_dist: int,
    band_width: int | None = None,
    extra_block: tuple[str, str] | None = None,
) -> DataFrame:
    """All (left, right) pairs with ``levenshtein <= max_dist``.

    Returns left's columns + right's columns + ``dist`` (long).
    Column names must be disjoint between the two inputs (alias
    first, as with any join).  ``band_width`` defaults to
    ``max_dist + 1`` (the tightest sound band).
    """
    if max_dist < 0:
        raise ValueError("max_dist must be >= 0")
    L = band_width if band_width is not None else max_dist + 1
    if L <= max_dist:
        raise ValueError(
            f"band_width ({L}) must exceed max_dist ({max_dist}) — "
            "otherwise matching pairs can span non-adjacent bands"
        )
    lb = F.floor(F.length(F.col(left_col)) / L)
    rb = F.floor(F.length(F.col(right_col)) / L)
    # each left row probes bands {b-1, b, b+1}; |len diff| <= d < L
    # guarantees the true band is among them (sound)
    probe = left.withColumn(
        "__band", F.explode(F.array(lb - 1, lb, lb + 1))
    )
    build = right.withColumn("__band", rb)
    on = [probe["__band"] == build["__band"]]
    if extra_block is not None:
        on.append(probe[extra_block[0]] == build[extra_block[1]])
    dist = F.levenshtein(probe[left_col], build[right_col])
    out = (
        probe.join(build, on[0] if len(on) == 1 else (on[0] & on[1]))
        .filter(dist <= max_dist)
        .withColumn("dist", dist.cast("long"))
    )
    return out.drop("__band")
