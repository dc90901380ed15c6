"""As-of (point-in-time) join — an operator Spark SQL lacks natively.

``asof_join(left, right, on, ...)`` attaches, to every left row, the
most recent right row (by timestamp) with the same key whose timestamp
is <= the left row's timestamp (direction='backward'; 'forward' is the
mirror).

Implementation is the union-sort trick, NOT a theta-join: tag both
inputs, union them, and run `last(payload, ignorenulls=True)` over a
window ordered by (ts, side, tiebreak) within each key. Cost is one
shuffle on the key + a linear pass — versus the O(|L| x |R|) blow-up
of `JOIN ON key AND r.ts <= l.ts` + top-1, which is unusable at scale.
Right rows sort BEFORE left rows at equal ts, so the match is
inclusive; among equal right timestamps the largest tiebreak wins
(deterministic, matching a `row_number() ORDER BY ts DESC, tiebreak
DESC` oracle formulation).

At 100 TB: the window partitions by the join key, so parallelism =
#keys; for a global (keyless) as-of you'd range-partition by time and
broadcast per-partition boundary rows — keyed usage is the fast path.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    left_ts: str,
    right_ts: str,
    right_cols: Sequence[str],
    tiebreak: str | None = None,
    direction: str = "backward",
    prefix: str = "asof_",
) -> DataFrame:
    """Each left row + the matched right row's ``right_cols`` (renamed
    ``{prefix}{col}``, NULL when no match)."""
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction!r}")
    on = list(on)
    right_cols = [c for c in right_cols if c not in on]

    payload = F.struct(*[F.col(c) for c in right_cols])
    payload_type = right.select(payload.alias("p")).schema["p"].dataType

    order = [F.col(right_ts).alias("__ts"), F.lit(0).alias("__side")]
    if tiebreak:
        order.append(F.col(tiebreak).cast("double").alias("__tie"))
    r2 = right.select(*on, *order[:2], *(order[2:]), payload.alias("__p"))

    lcols = left.columns
    l2 = left.select(
        *lcols,
        F.col(left_ts).alias("__ts"),
        F.lit(1).alias("__side"),
        *( [F.lit(None).cast("double").alias("__tie")] if tiebreak else [] ),
        F.lit(None).cast(payload_type).alias("__p"),
    )
    # align right frame to left's full schema with nulls
    r3 = r2.select(
        *[
            F.col(c) if c in on else F.lit(None).cast(left.schema[c].dataType).alias(c)
            for c in lcols
        ],
        "__ts",
        "__side",
        *(["__tie"] if tiebreak else []),
        "__p",
    )
    u = l2.unionByName(r3)

    asc = direction == "backward"
    # right rows (side=0) sort before left rows at equal ts in BOTH
    # directions -> equal-ts matches are inclusive.
    ordering = [
        F.col("__ts").asc() if asc else F.col("__ts").desc(),
        F.col("__side").asc(),
    ]
    if tiebreak:
        ordering.append(F.col("__tie").asc() if asc else F.col("__tie").desc())
    w = (
        Window.partitionBy(*on)
        .orderBy(*ordering)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    matched = u.withColumn("__m", F.last("__p", ignorenulls=True).over(w))
    out = matched.filter(F.col("__side") == 1).select(
        *lcols,
        *[F.col(f"__m.{c}").alias(f"{prefix}{c}") for c in right_cols],
    )
    return out
