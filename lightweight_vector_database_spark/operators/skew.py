"""Skew mitigation operators — the 100 TB survival kit.

AQE's skew-join splitting handles sort-merge join skew automatically,
but three patterns still need explicit handling at scale:

- ``salted_agg``: high-cardinality-value aggregation where one key
  dominates (power-law keys). Two-level aggregation: partial agg on
  (key, salt) spreads the hot key over N reducers, then a final agg
  on key merges the partials. Works for any algebraic aggregate
  (sum/count/min/max — pass the merge form).
- ``salted_join``: broadcast is plan A for skewed joins; when the
  build side is too big to broadcast, explode it N ways and salt the
  probe side, so the hot key's rows land in N tasks instead of one.
- ``hot_cold_join``: the surgical variant when the hot-key SET is
  small and known (or samplable via ``top_frequent_keys``): broadcast
  only the hot keys' build rows, shuffle-join the cold remainder —
  no build-side replication at all.

All are pure DataFrame transforms; correctness is partitioning-
independent (tested by comparing against the plain plan).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_agg(
    df: DataFrame,
    keys: Sequence[str],
    aggs: dict[str, tuple[Column, Column]],
    salt_buckets: int = 16,
) -> DataFrame:
    """Two-level skew-safe aggregation.

    ``aggs``: name -> (partial_agg_expr, final_merge_expr) where the
    final expr references the partial column by name, e.g.::

        salted_agg(df, ["k"], {
            "n":     (F.count(F.lit(1)),  F.sum("n")),
            "total": (F.sum("v"),         F.sum("total")),
            "mx":    (F.max("v"),         F.max("mx")),
        })
    """
    salted = df.withColumn(
        "__salt", F.floor(F.rand(seed=42) * salt_buckets).cast("int")
    )
    partial = salted.groupBy(*keys, "__salt").agg(
        *[expr.alias(name) for name, (expr, _) in aggs.items()]
    )
    return partial.groupBy(*keys).agg(
        *[merge.alias(name) for name, (_, merge) in aggs.items()]
    )


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    salt_buckets: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Skewed equi-join: salt the (large, skewed) left side, explode
    the right side across all salt values. Output == plain join.

    Right-side cost is x``salt_buckets`` rows — use when right is
    mid-sized (too big to broadcast, small enough to replicate N ways).

    ``how`` is restricted to left-preserving joins: under "right"/
    "full" an UNMATCHED right row would surface once per salt bucket
    (it was exploded x``salt_buckets``), silently duplicating output —
    raise instead of returning wrong rows.
    """
    allowed = {"inner", "left", "left_outer", "leftouter", "semi",
               "left_semi", "leftsemi", "anti", "left_anti", "leftanti"}
    if how not in allowed:
        raise ValueError(
            f"salted_join supports {sorted(allowed)}; got {how!r} — "
            "right/full would duplicate unmatched right rows "
            "salt_buckets times"
        )
    on = list(on)
    l2 = left.withColumn(
        "__salt", F.floor(F.rand(seed=42) * salt_buckets).cast("int")
    )
    r2 = right.withColumn(
        "__salt",
        F.explode(F.sequence(F.lit(0), F.lit(salt_buckets - 1)).cast("array<int>")),
    )
    out = l2.join(r2, on + ["__salt"], how)
    return out.drop("__salt")


def top_frequent_keys(
    df: DataFrame, key: str, min_share: float = 0.01, sample_fraction: float = 0.05
) -> list:
    """Detect hot keys from a sample — the input to ``hot_cold_join``
    (broadcast the hot keys' rows, shuffle the rest)."""
    total = df.count()
    if total == 0:
        return []
    sampled = df.sample(fraction=min(1.0, sample_fraction), seed=42)
    counts = sampled.groupBy(key).agg(F.count(F.lit(1)).alias("n")).collect()
    sample_n = sum(r.n for r in counts) or 1
    return [r[0] for r in counts if r.n / sample_n >= min_share]


def hot_cold_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    hot_keys: Sequence | None = None,
    how: str = "inner",
    min_share: float = 0.01,
) -> DataFrame:
    """Targeted skew join: split the probe side on the detected hot
    keys, BROADCAST the (few) hot keys' build rows so the hot traffic
    never shuffles, and shuffle-join only the cold remainder. Output ==
    plain join (tested); cost model: the hot partition would otherwise
    serialize one reducer, and unlike ``salted_join`` the cold side
    pays NO replication at all — the surgical option when the hot set
    is small and known (or samplable via ``top_frequent_keys``).

    Single-column keys only (the split predicate is an IN-list on one
    column); ``how`` restricted to left-preserving joins for the same
    unmatched-row-duplication reason as ``salted_join``: the right
    side is partitioned into hot/cold by key, so inner/left/semi/anti
    distribute over the union while right/full would not.
    """
    allowed = {"inner", "left", "left_outer", "leftouter", "semi",
               "left_semi", "leftsemi", "anti", "left_anti", "leftanti"}
    if how not in allowed:
        raise ValueError(
            f"hot_cold_join supports {sorted(allowed)}; got {how!r}"
        )
    on = list(on)
    if len(on) != 1:
        raise ValueError("hot_cold_join splits on exactly one key column")
    k = on[0]
    if hot_keys is None:
        hot_keys = top_frequent_keys(left, k, min_share=min_share)
    hot_keys = list(hot_keys)
    if not hot_keys:
        return left.join(right, on, how)
    # null keys never match an IN-list: route them to the cold branch
    # explicitly so left-preserving joins keep their rows
    is_hot = F.col(k).isin(hot_keys)
    hot = left.filter(is_hot).join(
        F.broadcast(right.filter(F.col(k).isin(hot_keys))), on, how
    )
    cold = left.filter(~is_hot | F.col(k).isNull()).join(
        right.filter(~F.col(k).isin(hot_keys)), on, how
    )
    return hot.unionByName(cold)
