"""Declarative data-quality constraint auditing (Deequ-style).

A 100 TB ingest needs its gate checks — completeness, uniqueness,
value bounds, accepted sets, referential integrity — evaluated in ONE
pass over the fact table, not one job per check (AWS Deequ's design:
compile all constraints into a single aggregation; Schelter et al.,
"Automating Large-Scale Data Quality Verification", VLDB 2018).

``audit(df, constraints)`` returns one row per constraint:
``(constraint, total, violations, passed)``.

Scale shape: every row-local constraint (completeness / in_range /
accepted_values / matches_regex) folds into one ``agg`` of conditional
sums — a single scan, map-side combinable, no shuffle beyond the final
1-row reduce.  ``unique`` adds a count-distinct (Spark expands it in
the same job).  ``references`` is a broadcast-probe LEFT anti
semantics count against the (small) dimension key set — the fact side
never shuffles.

The reference (513-LoC in-memory kd-tree) has no validation surface;
this is north-star pipeline machinery.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def complete(col: str) -> dict:
    """Violations = null rows."""
    return {"kind": "complete", "col": col, "name": f"complete({col})"}


def unique(col: str) -> dict:
    """Violations = rows beyond the first per duplicate value
    (``total - countDistinct`` — nulls count as one shared value)."""
    return {"kind": "unique", "col": col, "name": f"unique({col})"}


def in_range(col: str, lo, hi) -> dict:
    """Violations = non-null rows outside [lo, hi]."""
    return {
        "kind": "in_range", "col": col, "lo": lo, "hi": hi,
        "name": f"in_range({col},{lo},{hi})",
    }


def accepted(col: str, values: list) -> dict:
    """Violations = non-null rows whose value is not in ``values``."""
    return {
        "kind": "accepted", "col": col, "values": list(values),
        "name": f"accepted({col})",
    }


def matches(col: str, pattern: str) -> dict:
    """Violations = non-null rows not fully matching ``pattern``."""
    return {
        "kind": "matches", "col": col, "pattern": pattern,
        "name": f"matches({col})",
    }


def references(col: str, dim: DataFrame, dim_col: str, name: str) -> dict:
    """Violations = non-null fact keys absent from the dimension's key
    set (referential integrity).  The dimension key set is broadcast —
    size it like any broadcast dim."""
    return {
        "kind": "references", "col": col, "dim": dim, "dim_col": dim_col,
        "name": name,
    }


def _violation_expr(c: dict):
    col = F.col(c["col"])
    if c["kind"] == "complete":
        return col.isNull()
    if c["kind"] == "in_range":
        return col.isNotNull() & ~col.between(F.lit(c["lo"]), F.lit(c["hi"]))
    if c["kind"] == "accepted":
        return col.isNotNull() & ~col.isin(c["values"])
    if c["kind"] == "matches":
        return col.isNotNull() & ~col.rlike(c["pattern"])
    raise ValueError(f"unknown row-local constraint kind {c['kind']!r}")


def audit(df: DataFrame, constraints: list[dict]) -> DataFrame:
    """Evaluate ``constraints`` over ``df`` in one scan (plus one
    broadcast-join scan per ``references`` constraint).

    Returns ``(constraint string, total long, violations long,
    passed boolean)``, one row per constraint, unordered.
    """
    if not constraints:
        raise ValueError("no constraints given")
    row_local = [c for c in constraints if c["kind"] not in ("references", "unique")]
    uniques = [c for c in constraints if c["kind"] == "unique"]
    refs = [c for c in constraints if c["kind"] == "references"]

    aggs = [F.count(F.lit(1)).alias("__total")]
    names: list[str] = []
    for i, c in enumerate(row_local):
        aggs.append(
            F.sum(_violation_expr(c).cast("long")).alias(f"__v{i}")
        )
        names.append(c["name"])
    for j, c in enumerate(uniques):
        col = F.col(c["col"])
        # documented semantics: nulls count as ONE shared value.
        # countDistinct ignores nulls entirely, so the naive
        # total - countDistinct charges every null row as a violation
        # (ADVICE r7): count non-null rows against their distinct
        # values, then add the null rows beyond the first.
        aggs.append(
            (
                (F.count(col) - F.countDistinct(col))
                + F.greatest(
                    F.sum(col.isNull().cast("long")) - F.lit(1), F.lit(0)
                )
            ).alias(f"__u{j}")
        )
    one = df.agg(*aggs)

    # unpivot the single summary row into (constraint, total, violations)
    pairs = []
    for i, c in enumerate(row_local):
        pairs.append((c["name"], f"__v{i}"))
    for j, c in enumerate(uniques):
        pairs.append((c["name"], f"__u{j}"))
    report = None
    if pairs:
        # exploding an EMPTY struct array would type as NullType and
        # the c.constraint access fails to analyze (ADVICE r7) — a
        # references()-only constraint list skips the unpivot and the
        # report is seeded from the first referential row below.
        stack = F.array(
            *[
                F.struct(
                    F.lit(name).alias("constraint"),
                    F.col(vcol).cast("long").alias("violations"),
                )
                for name, vcol in pairs
            ]
        )
        report = (
            one.select(F.col("__total"), F.explode(stack).alias("c"))
            .select(
                F.col("c.constraint").alias("constraint"),
                F.col("__total").cast("long").alias("total"),
                F.col("c.violations").alias("violations"),
            )
        )

    for c in refs:
        keys = c["dim"].select(F.col(c["dim_col"]).alias("__k")).distinct()
        probe = df.select(F.col(c["col"]).alias("__k")).filter(
            F.col("__k").isNotNull()
        )
        missing = probe.join(F.broadcast(keys), "__k", "left_anti")
        ref_row = probe.agg(F.count(F.lit(1)).alias("total")).crossJoin(
            missing.agg(F.count(F.lit(1)).alias("violations"))
        ).select(
            F.lit(c["name"]).alias("constraint"),
            F.col("total").cast("long"),
            F.col("violations").cast("long"),
        )
        report = ref_row if report is None else report.unionByName(ref_row)

    return report.withColumn("passed", F.col("violations") == 0)
