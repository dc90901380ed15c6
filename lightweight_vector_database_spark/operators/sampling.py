"""Deterministic sampling + sharding for training-data pipelines.

Two ops a 100 TB curation pipeline needs that plain ``df.sample`` can't
give:

* ``weighted_sample`` — weighted sampling WITHOUT replacement
  (Efraimidis–Spirakis exponential keys, "Weighted random sampling with
  a reservoir", IPL 2006): each row draws a uniform u from a salted md5
  hash and ranks on ln(u)/w. The top-k ranks ARE a weighted sample
  without replacement. Everything is codegen scalar math + one
  TakeOrdered — no shuffle of the full table, no driver state, and the
  identical arithmetic re-runs in ANSI SQL, so the draw is
  engine-reproducible (same property the md5 split/mixture rules in
  curation_suite rely on).

* ``assign_shards`` — a deterministic GLOBAL shuffle into fixed-size
  output shards (the "shuffle the corpus, cut into training shards"
  step). Order is md5(salt:id) — a reproducible pseudo-random
  permutation — and the global rank over that order is computed with
  the same two-level scan as operators/packing.py: the first hex digits
  of the ordering key itself form ORDER-ALIGNED buckets (hex-prefix
  ranges partition the md5-lex order), so a partitioned window gives
  local ranks and a 256-row driver cumsum gives bucket bases. No
  single-partition window anywhere; at 100 TB the only serial work is
  the 256-row cumsum.

* ``stratified_sample`` — exact-size per-stratum sampling (top-n per
  group over the same salted-hash keys): the "N docs per source /
  per language" curation draw, where ``df.sampleBy`` gives only
  EXPECTED fractions.  One partitioned window over the strata —
  shuffles on the stratum key only, never globally.

The reference has no sampling surface (it is a 513-LoC in-memory
kd-tree, kd_tree_database.py); these are engine extras for the
LLM-pipeline north star.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

# 16^15 = 2^60: 15 md5 hex digits parse into a non-negative BIGINT with
# headroom; (v + 1) / 2^60 lands in (0, 1] so ln(u) is always defined.
_HEX_DIGITS = 15
_DENOM = float(1 << 60)


def _uniform_from_hash(key: Column, salt: str) -> Column:
    """Deterministic uniform in (0, 1] from md5(salt:key) — the same
    reproducible-draw construction as curation_suite's split/mixture
    rules, widened to 15 hex digits (60 bits) of resolution."""
    h = F.md5(F.concat(F.lit(salt + ":"), key.cast("string")))
    v = F.conv(F.substring(h, 1, _HEX_DIGITS), 16, 10).cast("long")
    return (v + F.lit(1).cast("long")) / F.lit(_DENOM)


def sampling_key(weight: Column, id_col: Column, salt: str) -> Column:
    """The Efraimidis–Spirakis rank key ln(u)/w (monotone transform of
    the classical u^(1/w); larger is better). w must be > 0."""
    u = _uniform_from_hash(id_col, salt)
    return F.log(u) / weight


def weighted_sample(
    df: DataFrame,
    k: int,
    weight_col: str,
    id_col: str,
    salt: str = "wsamp",
) -> DataFrame:
    """Top-k weighted sample without replacement: P(row in sample) is
    proportional-ish to its weight (exactly the E-S A-ES scheme).

    Plan shape: scalar hash math per row + TakeOrderedAndProject —
    no full shuffle, no window. Rows with weight <= 0 are excluded
    (zero-weight rows can never be drawn under E-S).

    Returns the input columns plus ``wkey`` (the rank key). The draw
    replays exactly in SQL:
    ``ln((('0x'||substr(md5(salt||':'||id),1,15))::BIGINT + 1)/2^60)/w``.
    """
    if k < 1:
        raise ValueError("k must be >= 1")
    key = sampling_key(F.col(weight_col).cast("double"), F.col(id_col), salt)
    return (
        df.filter(F.col(weight_col) > 0)
        .withColumn("wkey", key)
        .orderBy(F.col("wkey").desc(), F.col(id_col).asc())
        .limit(k)
    )


def stratified_sample(
    df: DataFrame,
    n_per_stratum: int,
    strata_col: str,
    id_col: str,
    weight_col: str | None = None,
    salt: str = "strat",
) -> DataFrame:
    """EXACTLY ``n_per_stratum`` rows per stratum (fewer only when the
    stratum is smaller), drawn uniformly — or Efraimidis–Spirakis
    weighted when ``weight_col`` is given — without replacement.

    ``df.sampleBy`` draws each row independently, so per-stratum counts
    are binomial noise around the target; curation recipes ("exactly
    10k docs per language") need the exact-size draw.  Implementation
    is rank-over-salted-hash within each stratum: one partitioned
    window, shuffle on the stratum key only.  Skewed strata parallelize
    across (not within) strata; for a single 100 TB stratum use
    ``weighted_sample`` on the filtered slice instead (TakeOrdered
    needs no window at all).

    Adds ``skey`` (the draw key; replayable in ANSI SQL exactly like
    ``weighted_sample``'s) and keeps input columns.
    """
    if n_per_stratum < 1:
        raise ValueError("n_per_stratum must be >= 1")
    if weight_col is None:
        key = _uniform_from_hash(F.col(id_col), salt)
        keyed = df.withColumn("skey", key)
    else:
        keyed = df.filter(F.col(weight_col) > 0).withColumn(
            "skey",
            sampling_key(
                F.col(weight_col).cast("double"), F.col(id_col), salt
            ),
        )
    w = Window.partitionBy(strata_col).orderBy(
        F.col("skey").desc(), F.col(id_col).asc()
    )
    return (
        keyed.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= n_per_stratum)
        .drop("__rn")
    )


def assign_shards(
    df: DataFrame,
    shard_size: int,
    id_col: str,
    salt: str = "shard",
    prefix_digits: int = 2,
) -> DataFrame:
    """Deterministic global shuffle + fixed-size shard assignment.

    Adds ``global_rank`` (1-based position in md5(salt:id) order, ties
    broken by id) and ``shard_id`` (= (rank-1) div shard_size). The
    result is byte-identical to ``row_number() OVER (ORDER BY md5, id)``
    but distributed: the ordering key's own hex prefix buckets the rows
    into 16^prefix_digits order-aligned ranges, so the window below is
    PARTITIONED and the cross-bucket offsets are a 256-row driver
    cumsum (two-level scan, same shape as packing.pack_sequences).
    """
    if shard_size < 1:
        raise ValueError("shard_size must be >= 1")
    okey = F.md5(F.concat(F.lit(salt + ":"), F.col(id_col).cast("string")))
    keyed = df.withColumn("__okey", okey).withColumn(
        "__bucket", F.substring(F.col("__okey"), 1, prefix_digits)
    )

    # per-bucket local rank — partitioned window, parallel across buckets
    w = Window.partitionBy("__bucket").orderBy(
        F.col("__okey").asc(), F.col(id_col).asc()
    )
    local = keyed.withColumn("__lrn", F.row_number().over(w))

    # bucket counts -> driver cumsum -> broadcast bases. Hex-prefix
    # buckets sort lexicographically in the SAME order as the full key,
    # so base(bucket) = total rows in all lexicographically-smaller
    # buckets.
    counts = {
        r["__bucket"]: r["n"]
        for r in keyed.groupBy("__bucket").agg(F.count("*").alias("n")).collect()
    }
    bases, acc = [], 0
    for b in sorted(counts):
        bases.append((b, acc))
        acc += int(counts[b])
    base_df = df.sparkSession.createDataFrame(bases, "__bucket string, __base long")

    rank = (F.col("__base") + F.col("__lrn")).cast("long")
    return (
        local.join(F.broadcast(base_df), "__bucket")
        .withColumn("global_rank", rank)
        .withColumn(
            "shard_id", F.expr(f"(global_rank - 1) div {int(shard_size)}")
        )
        .drop("__okey", "__bucket", "__lrn", "__base")
    )
