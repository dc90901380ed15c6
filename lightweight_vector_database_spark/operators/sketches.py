"""Mergeable frequency / membership sketches as pure SQL expressions.

Two classic streaming sketches, built entirely from Spark built-ins so
they run inside whole-stage codegen and — the 100 TB point — MERGE
TRIVIALLY: a sketch over a partition (or a day, or a shard) combines
with another by element-wise `bit_or` (Bloom) or `sum` (count-min),
so corpus-wide membership/frequency state never requires shuffling the
raw item space. Both use md5-derived hash positions, so every bit is
reproducible in portable SQL (the DuckDB oracles rebuild the same
sketch and must match exactly).

- Bloom filter (Bloom 1970): k=4 positions from disjoint 24-bit
  spans of one md5, reduced mod the (power-of-two) filter size;
  words of 32 used bits so `1 << bit` never touches the sign bit in
  any engine. Build is a groupBy(word) bit_or — O(|set|) with
  map-side partials; probe is a broadcast join against the tiny
  (m/32)-row word relation, i.e. map-side at scale.
- Count-min sketch (Cormode & Muthukrishnan 2005): depth x width
  counters; estimate = min over depth rows. Built from per-item
  counts (a pre-aggregation), so the sketch build shuffles at most
  depth x width cells, not the item stream.

At 100 TB the pattern is: build the sketch per partition/epoch, merge
the (tiny) cell relations, broadcast the merged sketch back — the
exact inverted-index joins these sketches replace (see
``curation_contamination``) shuffle the full n-gram space instead.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

BLOOM_HASHES = 4
BLOOM_BITS = 1 << 16  # default filter size; callers size m to their set
BLOOM_WORD_BITS = 32  # 32 used bits per word: 1<<bit stays positive

CMS_DEPTH = 4
CMS_WIDTH = 1024


def _one_shl(bit: Column) -> Column:
    """``1L << bit`` for bit in [0, 32) — via pow(2, bit), exact in
    double for these exponents and always positive, so bit_or /
    bitwiseAND semantics match BIGINT engines exactly (PySpark's
    shiftleft only takes a literal shift amount)."""
    return F.pow(F.lit(2.0), bit.cast("double")).cast("long")


def _md5_chunk(c: Column, start: int, width: int) -> Column:
    """Integer value of `width` hex chars of md5(c) from 1-based
    `start` — the engine-portable hash primitive (md5 is bit-identical
    everywhere; conv/substr exist in both Spark and DuckDB)."""
    return F.conv(F.substring(F.md5(c), start, width), 16, 10).cast("long")


def _pos_fan(df: DataFrame, col: str, m_bits: int, keep: list[str]) -> DataFrame:
    """k positions in [0, m_bits) from disjoint 24-bit spans of ONE
    md5 per row (named column, not relying on codegen CSE), exploded
    in a single pass. ``m_bits`` must be a power of two <= 2^24 so
    the modulo stays uniform."""
    assert m_bits <= 1 << 24 and m_bits & (m_bits - 1) == 0
    h = df.select(*keep, F.md5(F.col(col)).alias("_h"))
    pos = F.explode(
        F.array(
            *[
                F.conv(F.substring(F.col("_h"), 1 + 6 * i, 6), 16, 10).cast("long")
                % m_bits
                for i in range(BLOOM_HASHES)
            ]
        )
    ).alias("pos")
    return h.select(*keep, pos)


def bloom_build(items: DataFrame, col: str, m_bits: int = BLOOM_BITS) -> DataFrame:
    """Aggregate a Bloom filter over ``items[col]`` (distinct-ness not
    required — duplicates only re-set bits). Returns the word relation
    ``(word: long, bits: long)`` with at most m_bits/32 rows —
    small enough to broadcast, merge (bit_or on word), or persist.
    Size ``m_bits`` to the expected set: with 4 hashes, ~29 bits/item
    gives a ~3e-4 false-positive rate, ~16 bits/item ~2.4e-3
    (p = (1 - e^(-4n/m))^4). The filter size is stamped into the
    ``bits`` column metadata so ``bloom_probe`` always reduces
    positions mod the size the filter was BUILT with — a mismatch
    would silently produce false negatives."""
    words = (
        _pos_fan(items, col, m_bits, [])
        .select(
            (F.col("pos") / BLOOM_WORD_BITS).cast("long").alias("word"),
            _one_shl(F.col("pos") % BLOOM_WORD_BITS).alias("m"),
        )
        .groupBy("word")
        .agg(F.bit_or("m").alias("bits"))
    )
    return words.withMetadata("bits", {"m_bits": m_bits})


def bloom_build_grouped(
    items: DataFrame, col: str, group_cols: list[str], m_bits: int = BLOOM_BITS
) -> DataFrame:
    """Build ONE Bloom filter PER GROUP in a single pass: returns
    ``(*group_cols, word, bits)`` — the per-group word relations of
    ``bloom_build``, computed by one groupBy((*group_cols, word)) +
    bit_or job instead of one Spark job per group.

    This is the production multi-shard shape (per-dump / per-day
    filters over thousands of shards): a driver loop of per-shard
    ``bloom_build`` calls launches thousands of sequential jobs
    (VERDICT r6 item 3); the grouped build is one shuffle regardless
    of shard count. Each group's rows are bit-identical to a
    standalone ``bloom_build`` over that group (tested), so
    downstream ``bloom_merge``/``bloom_probe`` semantics are
    unchanged — collapse groups with a plain
    groupBy("word").bit_or("bits") (metadata re-stamped) or select one
    group's (word, bits) slice."""
    words = (
        _pos_fan(items, col, m_bits, list(group_cols))
        .select(
            *group_cols,
            (F.col("pos") / BLOOM_WORD_BITS).cast("long").alias("word"),
            _one_shl(F.col("pos") % BLOOM_WORD_BITS).alias("m"),
        )
        .groupBy(*group_cols, "word")
        .agg(F.bit_or("m").alias("bits"))
    )
    return words.withMetadata("bits", {"m_bits": m_bits})


def bloom_collapse(grouped: DataFrame) -> DataFrame:
    """Merge a ``bloom_build_grouped`` relation across ALL its groups
    into one filter: groupBy(word) + bit_or, metadata preserved.
    bit_or is associative/commutative, so the result is bit-identical
    to a single build over the union of the groups' items."""
    size = None
    for f in grouped.schema.fields:
        if f.name == "bits" and "m_bits" in (f.metadata or {}):
            size = int(f.metadata["m_bits"])
    if size is None:
        raise ValueError(
            "bloom_collapse: input carries no m_bits metadata; build it "
            "with bloom_build_grouped"
        )
    out = grouped.groupBy("word").agg(F.bit_or("bits").alias("bits"))
    return out.withMetadata("bits", {"m_bits": size})


def bloom_merge(*filters: DataFrame) -> DataFrame:
    """Union Bloom filters built with the SAME m_bits: element-wise
    bit_or on word, with the ``m_bits`` metadata re-stamped on the
    result (a bare groupBy+bit_or silently DROPS column metadata, which
    would make the merged filter unusable by ``bloom_probe``'s size
    guard). This is the per-partition/per-epoch merge step of the
    100 TB pattern in the module docstring. Raises if any input lacks
    the size stamp or the sizes disagree — merging differently-sized
    filters is meaningless bit soup."""
    if not filters:
        raise ValueError("bloom_merge needs at least one filter")
    sizes = []
    for fdf in filters:
        size = None
        for f in fdf.schema.fields:
            if f.name == "bits" and "m_bits" in (f.metadata or {}):
                size = int(f.metadata["m_bits"])
        if size is None:
            raise ValueError(
                "bloom_merge: an input filter carries no m_bits metadata; "
                "rebuild it with bloom_build or re-stamp via withMetadata"
            )
        sizes.append(size)
    if len(set(sizes)) != 1:
        raise ValueError(f"bloom_merge: mismatched filter sizes {sizes}")
    merged = filters[0]
    for extra in filters[1:]:
        merged = merged.unionByName(extra)
    out = merged.groupBy("word").agg(F.bit_or("bits").alias("bits"))
    return out.withMetadata("bits", {"m_bits": sizes[0]})


def bloom_probe(
    probes: DataFrame,
    col: str,
    words: DataFrame,
    m_bits: int | None = None,
) -> DataFrame:
    """Membership test: returns ``probes`` with a ``bloom_hit``
    column, true iff all k bits for ``probes[col]`` are set in
    ``words``. Row-preserving and shuffle-free on the probe side: the
    k positions become k broadcast hash joins against the tiny word
    relation (no explode fan, no regroup of the probe key space) —
    at 100 TB the probe stream is touched exactly once, map-side.
    The word-relation subplan is instantiated once per hash (k small
    shuffles of the BUILD side only); it is tiny by construction, but
    ``words.persist()`` collapses those to one if the member set is
    unusually large.

    ``m_bits`` is normally omitted and read from the metadata
    ``bloom_build`` stamped on ``words`` — probing with a different
    size than the filter was built with is the one way to get a false
    NEGATIVE, so an explicit mismatching value is an error, and so is
    a words relation that carries NO size at all (column metadata is
    easily lost — e.g. re-aggregating with a bare
    ``groupBy('word').agg(bit_or)`` drops it, as can some writers;
    silently assuming the default size would probe mod the wrong m and
    produce exactly the false negatives the guard exists to prevent).
    Merge filters with ``bloom_merge`` (re-stamps the size) or pass
    ``m_bits`` explicitly when the provenance is known."""
    built = None
    for f in words.schema.fields:
        if f.name == "bits" and "m_bits" in (f.metadata or {}):
            built = int(f.metadata["m_bits"])
    if m_bits is None:
        if built is None:
            raise ValueError(
                "bloom_probe: the words relation carries no m_bits metadata "
                "(lost in a merge or rewrite?) and none was passed — probing "
                "with a guessed size risks silent false negatives. Merge "
                "filters with bloom_merge, or pass m_bits explicitly."
            )
        m_bits = built
    elif built is not None and m_bits != built:
        raise ValueError(
            f"bloom_probe m_bits={m_bits} != filter's build size {built}"
        )
    assert m_bits <= 1 << 24 and m_bits & (m_bits - 1) == 0
    out = probes.withColumn("_h", F.md5(F.col(col)))
    set_checks = []
    for i in range(BLOOM_HASHES):
        pos = (
            F.conv(F.substring(F.col("_h"), 1 + 6 * i, 6), 16, 10).cast("long")
            % m_bits
        )
        w = words.select(
            F.col("word").alias(f"_w{i}"), F.col("bits").alias(f"_b{i}")
        )
        out = out.withColumn(f"_word{i}", (pos / BLOOM_WORD_BITS).cast("long"))
        out = out.withColumn(f"_m{i}", _one_shl(pos % BLOOM_WORD_BITS))
        out = out.join(
            F.broadcast(w), out[f"_word{i}"] == w[f"_w{i}"], "left"
        )
        set_checks.append(
            F.coalesce(F.col(f"_b{i}"), F.lit(0)).bitwiseAND(F.col(f"_m{i}")) != 0
        )
    hit = set_checks[0]
    for c in set_checks[1:]:
        hit = hit & c
    drop = ["_h"] + [
        n for i in range(BLOOM_HASHES) for n in (f"_word{i}", f"_m{i}", f"_w{i}", f"_b{i}")
    ]
    return out.withColumn("bloom_hit", hit).drop(*drop)


def cms_bucket(c: Column, row: int) -> Column:
    """Row-salted bucket: md5("cms{row}:" || item) -> [0, CMS_WIDTH)."""
    salted = F.concat(F.lit(f"cms{row}:"), c)
    return _md5_chunk(salted, 1, 4) % CMS_WIDTH


def _cms_fan(df: DataFrame, item_col: str, keep: list[Column]) -> DataFrame:
    """The single source of the sketch's probe geometry: one pass over
    the input exploding the depth (row, bucket) pairs per item (no
    per-row union, no re-scan of the source), carrying ``keep``
    columns through. Build and estimate both go through here so their
    salts/buckets can never drift apart."""
    fanned = df.select(
        *keep,
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(r).alias("row"),
                        cms_bucket(F.col(item_col), r).alias("bucket"),
                    )
                    for r in range(CMS_DEPTH)
                ]
            )
        ).alias("p"),
    )
    keep_names = [c for c in fanned.columns if c != "p"]
    return fanned.select(*keep_names, "p.row", "p.bucket")


def cms_build(counts: DataFrame, item_col: str, n_col: str) -> DataFrame:
    """Count-min cells from per-item counts (when the caller already
    has them). Returns ``(row, bucket, cell_n)``; two sketches merge
    by summing cell_n on (row, bucket)."""
    return (
        _cms_fan(counts, item_col, [F.col(n_col).alias("n")])
        .groupBy("row", "bucket")
        .agg(F.sum("n").alias("cell_n"))
    )


def cms_build_stream(items: DataFrame, item_col: str) -> DataFrame:
    """Count-min cells straight from the RAW item stream — the shape
    that matters when the item space is too large to pre-aggregate:
    the map-side partial collapses each partition to <= depth x width
    cells, so the only shuffle is a few thousand rows regardless of
    how many distinct items exist (a per-item groupBy would shuffle
    the whole key space first)."""
    return cms_build(
        items.withColumn("__one", F.lit(1).cast("long")), item_col, "__one"
    )


def cms_estimate(items: DataFrame, item_col: str, cells: DataFrame) -> DataFrame:
    """Point estimate for each item: min over depth rows of its cell.
    Broadcast join against the (<= depth x width)-row cell relation,
    then a regroup on the item — never touches the raw stream."""
    fan = _cms_fan(items, item_col, [F.col(item_col)])
    return (
        fan.join(F.broadcast(cells), ["row", "bucket"], "left")
        .groupBy(item_col)
        .agg(F.min(F.coalesce(F.col("cell_n"), F.lit(0))).alias("cms_n"))
    )
