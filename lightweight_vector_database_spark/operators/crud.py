"""CRUD as snapshot transformations (reference write path, SURVEY.md §3.2-3.3).

The reference mutates two structures in place (point store + tree,
kd_tree_database.py:262-270); in Spark every mutation is a pure
DataFrame -> DataFrame transform producing a new immutable snapshot —
the reference's value semantics (deepcopy on insert/read,
database.py:11-14, kd_tree_database.py:263-265) come for free.

Id minting preserves the reference contract (unique + monotonic, never
reused — kd_tree_database.py:253-256): new ids are max(existing)+row_number,
computed declaratively (broadcast 1-row max, no driver round-trip).

At scale: the snapshot would be a partitioned table (Delta/Iceberg in
production); `delete` is a partition-prunable filter, `insert` an
append, updates a broadcast-join rewrite of only the touched files.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _global_row_numbers(
    df: DataFrame,
    order_by: Sequence[str],
    rn_col: str = "__rn",
    n_buckets: int = 64,
) -> DataFrame:
    """Global row numbers 1..n in the total order of ``order_by``,
    computed DISTRIBUTED — the two-level scan from packing.py, not a
    single-partition ``Window.orderBy`` (which serializes the whole
    batch through one task):

    1. range-shuffle on the order columns — partition i's keys all sort
       before partition i+1's, so bucket order == global order;
    2. per-partition ``row_number`` (partitioned window — parallel);
    3. per-partition counts cumsum'd into base offsets (a global window
       over ONLY n_buckets rows — the one serial step) and broadcast
       back.

    Ties across ``order_by`` land in one range partition, so equal-key
    ordering is no worse than the global-window form (callers wanting
    full determinism pass a unique ordering, as before).
    """
    order_cols = [F.col(c) for c in order_by]
    ranged = df.repartitionByRange(n_buckets, *order_cols).withColumn(
        "__pid", F.spark_partition_id()
    )
    w_local = Window.partitionBy("__pid").orderBy(*order_cols)
    local = ranged.withColumn("__lrn", F.row_number().over(w_local).cast("long"))
    # n_buckets rows only — the single-partition window is harmless here
    w_off = Window.orderBy("__pid").rowsBetween(
        Window.unboundedPreceding, -1
    )
    offsets = (
        ranged.groupBy("__pid")
        .agg(F.count(F.lit(1)).alias("__cnt"))
        .withColumn(
            "__base",
            F.coalesce(F.sum("__cnt").over(w_off), F.lit(0)).cast("long"),
        )
        .select("__pid", "__base")
    )
    return (
        local.join(F.broadcast(offsets), "__pid")
        .withColumn(rn_col, F.col("__base") + F.col("__lrn"))
        .drop("__pid", "__lrn", "__base")
    )


def insert(
    snapshot: DataFrame,
    new_rows: DataFrame,
    id_col: str = "vec_id",
    order_by: Sequence[str] | None = None,
) -> DataFrame:
    """Append ``new_rows`` (without ids) minting monotonic ids.

    ``order_by``: deterministic ordering for id assignment among the
    new rows (the reference assigns in insertion order).
    """
    maxdf = snapshot.agg(
        F.coalesce(F.max(id_col), F.lit(-1)).cast("long").alias("__max_id")
    )
    minted = (
        _global_row_numbers(new_rows, order_by or new_rows.columns)
        .join(F.broadcast(maxdf))
        .withColumn(id_col, F.col("__max_id") + F.col("__rn"))
        .drop("__rn", "__max_id")
    )
    return snapshot.unionByName(minted.select(snapshot.columns))


def mint_ids(
    new_rows: DataFrame,
    next_id: int,
    id_col: str = "vec_id",
    order_by: Sequence[str] | None = None,
) -> DataFrame:
    """Assign ids ``next_id .. next_id + n - 1`` in deterministic order
    WITHOUT scanning any snapshot — the O(batch) minting path for
    append-mode stores that track the id high-water mark in commit
    metadata (``insert`` derives the base from a max() over the table;
    at 100 TB that scan per micro-batch is the difference between
    O(batch) and O(table) ingestion). Row numbering is the distributed
    two-level scan (``_global_row_numbers``), not a single-partition
    global window."""
    return (
        _global_row_numbers(new_rows, order_by or new_rows.columns)
        .withColumn(id_col, F.lit(int(next_id) - 1).cast("long") + F.col("__rn"))
        .drop("__rn")
    )


def delete(
    snapshot: DataFrame, pred: Column, id_col: str = "vec_id"
) -> tuple[DataFrame, DataFrame]:
    """Remove rows matching ``pred``; returns (remaining, removed).

    The reference's delete returns the removed entry (or None if
    absent, kd_tree_database.py:278-283) — ``removed`` is the batch
    generalization (empty DF when nothing matched).
    """
    return snapshot.filter(~pred), snapshot.filter(pred)


def delete_ids(
    snapshot: DataFrame, ids: Sequence[int], id_col: str = "vec_id"
) -> tuple[DataFrame, DataFrame]:
    pred = F.col(id_col).isin([int(i) for i in ids])
    return delete(snapshot, pred, id_col)


def update_positions(
    snapshot: DataFrame,
    updates: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Batch update_position (kd_tree_database.py:310-316): replace the
    vector for matching ids, metadata untouched. ``updates`` has
    (id_col, vec_col). Broadcast join — only a map-side rewrite."""
    u = updates.select(F.col(id_col), F.col(vec_col).alias("__new_vec"))
    return (
        snapshot.join(F.broadcast(u), id_col, "left")
        .withColumn(vec_col, F.coalesce(F.col("__new_vec"), F.col(vec_col)))
        .drop("__new_vec")
    )


def update_metadata(
    snapshot: DataFrame,
    updates: DataFrame,
    id_col: str = "vec_id",
) -> DataFrame:
    """Batch update_metadata (kd_tree_database.py:324-328): replace the
    metadata columns carried by ``updates`` for matching ids."""
    meta_cols = [c for c in updates.columns if c != id_col]
    u = updates.select(
        F.col(id_col), *[F.col(c).alias(f"__new_{c}") for c in meta_cols]
    )
    out = snapshot.join(F.broadcast(u), id_col, "left")
    for c in meta_cols:
        out = out.withColumn(c, F.coalesce(F.col(f"__new_{c}"), F.col(c))).drop(
            f"__new_{c}"
        )
    return out


def get_entry(snapshot: DataFrame, entry_id: int, id_col: str = "vec_id") -> DataFrame:
    """Point lookup (kd_tree_database.py:272-276): 0-or-1-row DataFrame."""
    return snapshot.filter(F.col(id_col) == F.lit(int(entry_id)))


def count_rows(snapshot: DataFrame) -> DataFrame:
    """__len__ (kd_tree_database.py:307-308) as a 1-row DataFrame."""
    return snapshot.agg(F.count(F.lit(1)).alias("n"))


def merge_upsert(
    base: DataFrame,
    updates: DataFrame,
    key: str,
) -> DataFrame:
    """MERGE semantics as one snapshot transform: rows matched by
    ``key`` take the update's values, unmatched updates insert,
    unmatched base rows carry over (SQL MERGE WHEN MATCHED THEN UPDATE
    / WHEN NOT MATCHED THEN INSERT, expressed as a full outer join +
    per-column coalesce — no mutable table needed).

    Scale shape: one shuffle on ``key`` (or zero with co-bucketed
    inputs); the update side is usually small → broadcast by AQE.
    Reference correspondence: generalizes update_metadata /
    update_position + insert (kd_tree_database.py:262-270, 310-316,
    324-328) into one batch operation.
    """
    cols = base.columns
    if set(cols) != set(updates.columns):
        raise ValueError("base and updates must share a schema")
    b = base.alias("b")
    # update is WHOLESALE replacement (the reference's update swaps the
    # entire entry, kd_tree_database.py:310-316): an update row carrying
    # an explicit NULL must write that NULL, so a per-column coalesce is
    # wrong — branch on a matched flag instead.
    u = updates.withColumn("__matched", F.lit(True)).alias("u")
    joined = b.join(u, F.col(f"b.{key}") == F.col(f"u.{key}"), "full_outer")
    from_update = F.col("u.__matched").isNotNull()
    return joined.select(
        *[
            F.when(from_update, F.col(f"u.{c}"))
            .otherwise(F.col(f"b.{c}"))
            .alias(c)
            for c in cols
        ]
    )
