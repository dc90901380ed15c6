"""Sketch-operator invariants: Bloom one-sided error (never misses a
true member), count-min overestimation + mergeability, and the
repetition filter's separation of augmented vs natural docs."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StringType, StructField, StructType

from lightweight_vector_database_spark.operators import sketches as SK
from lightweight_vector_database_spark.sources import load_table
from lightweight_vector_database_spark.suite.curation_suite2 import _contamination
from lightweight_vector_database_spark.suite.curation_suite3 import (
    _bloom_contamination,
    _cms_topk,
    _repetition,
)
from lightweight_vector_database_spark.suite.relational_suite6 import _hll_cardinality

ITEMS = StructType([StructField("item", StringType())])


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    return load_table(spark, sf_dir, "documents")


def test_bloom_never_misses_members(spark):
    members = [f"member-{i}" for i in range(500)]
    absent = [f"absent-{i}" for i in range(500)]
    mdf = spark.createDataFrame([(m,) for m in members], ITEMS)
    words = SK.bloom_build(mdf, "item")
    probes = spark.createDataFrame([(x,) for x in members + absent], ITEMS)
    hits = {
        r.item: r.bloom_hit
        for r in SK.bloom_probe(probes, "item", words).collect()
    }
    # one-sided error: every true member hits
    assert all(hits[m] for m in members)
    # false-positive rate stays plausible (expected ~1e-5 at this load;
    # allow a generous margin)
    fp = sum(1 for a in absent if hits[a])
    assert fp <= 5
    # the word relation is tiny — that's what makes it broadcastable
    assert words.count() <= SK.BLOOM_BITS // SK.BLOOM_WORD_BITS

    # probing with a different size than the filter was built with is
    # the one way to get a false negative — it must be refused, and an
    # omitted m_bits must resolve to the build size via metadata
    big = SK.bloom_build(mdf, "item", m_bits=1 << 20)
    with pytest.raises(ValueError, match="build size"):
        SK.bloom_probe(probes, "item", big, m_bits=1 << 16)
    hits_big = {
        r.item: r.bloom_hit
        for r in SK.bloom_probe(probes, "item", big).collect()
    }
    assert all(hits_big[m] for m in members)


def test_bloom_contamination_superset_of_exact(spark, sf_dir):
    """Bloom decontamination can overflag (false positives) but must
    never miss a doc the exact inverted-index join flags."""
    exact_docs = {
        r.train_doc for r in _contamination(spark, sf_dir).collect()
    }
    bloom = {
        r.train_doc: r.contaminated
        for r in _bloom_contamination(spark, sf_dir).collect()
    }
    missed = [d for d in exact_docs if not bloom.get(d)]
    assert missed == []


def test_cms_overestimates_only_and_merges(spark, docs):
    from lightweight_vector_database_spark.functions import text as T

    counts = (
        docs.select(F.explode(T.word_ngrams("text", 2)).alias("ng"))
        .groupBy("ng")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    cells = SK.cms_build(counts, "ng", "n")
    est = SK.cms_estimate(counts.select("ng"), "ng", cells)
    joined = counts.join(est, "ng").select("ng", "n", "cms_n").collect()
    assert len(joined) > 0
    # count-min never underestimates
    assert all(r.cms_n >= r.n for r in joined)

    # mergeability: per-source sketches summed cell-wise == global sketch
    per_source = (
        docs.select("source", F.explode(T.word_ngrams("text", 2)).alias("ng"))
        .groupBy("source", "ng")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    merged_cells = None
    for src_row in docs.select("source").distinct().collect():
        part = SK.cms_build(
            per_source.filter(F.col("source") == src_row.source), "ng", "n"
        )
        merged_cells = part if merged_cells is None else merged_cells.unionByName(part)
    merged = merged_cells.groupBy("row", "bucket").agg(
        F.sum("cell_n").alias("cell_n")
    )
    a = {(r.row, r.bucket): r.cell_n for r in cells.collect()}
    b = {(r.row, r.bucket): r.cell_n for r in merged.collect()}
    assert a == b


def test_cms_stream_build_equals_count_build(spark, docs):
    """Sketching the raw stream (map-side partials, no key-space
    shuffle) must produce the same cells as sketching pre-aggregated
    counts."""
    from lightweight_vector_database_spark.functions import text as T

    bigrams = docs.select(F.explode(T.word_ngrams("text", 2)).alias("ng"))
    counts = bigrams.groupBy("ng").agg(F.count(F.lit(1)).alias("n"))
    a = {
        (r.row, r.bucket): r.cell_n
        for r in SK.cms_build(counts, "ng", "n").collect()
    }
    b = {
        (r.row, r.bucket): r.cell_n
        for r in SK.cms_build_stream(bigrams, "ng").collect()
    }
    assert a == b


def test_cms_topk_query_shape(spark, sf_dir):
    rows = _cms_topk(spark, sf_dir).collect()
    assert 0 < len(rows) <= 50
    assert all(r.overcount >= 0 for r in rows)


def test_cms_streaming_maintenance_equals_batch(spark, docs, tmp_path):
    """Sketch maintenance under streaming ingest: CMS cells folded in
    per micro-batch (cell-wise sum in foreachBatch — O(cells) per
    batch, never re-reads history) must equal the batch-built sketch.
    This is how corpus frequency state stays current at 100 TB: the
    raw stream is touched once, the merged state is ~depth x width
    rows."""
    from lightweight_vector_database_spark.functions import text as T

    # stage the docs as several files so availableNow produces
    # multiple micro-batches
    src = str(tmp_path / "docs_stream")
    docs.select("doc_id", "text").repartition(4).write.parquet(src)
    cells_dir = str(tmp_path / "cms_cells")

    def fold(batch_df, epoch_id):
        counts = (
            batch_df.select(F.explode(T.word_ngrams("text", 2)).alias("ng"))
            .groupBy("ng")
            .agg(F.count(F.lit(1)).alias("n"))
        )
        import os

        delta = SK.cms_build(counts, "ng", "n")
        if os.path.exists(cells_dir):
            prev = spark.read.parquet(cells_dir)
            merged = (
                prev.unionByName(delta)
                .groupBy("row", "bucket")
                .agg(F.sum("cell_n").alias("cell_n"))
            )
        else:
            merged = delta
        merged.localCheckpoint(eager=True).write.mode("overwrite").parquet(cells_dir)

    stream = spark.readStream.schema("doc_id long, text string").option(
        "maxFilesPerTrigger", 1
    ).parquet(src)
    q = stream.writeStream.foreachBatch(fold).trigger(availableNow=True).start()
    q.awaitTermination(120)

    batch_counts = (
        docs.select(F.explode(T.word_ngrams("text", 2)).alias("ng"))
        .groupBy("ng")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    expected = {
        (r.row, r.bucket): r.cell_n
        for r in SK.cms_build(batch_counts, "ng", "n").collect()
    }
    got = {
        (r.row, r.bucket): r.cell_n for r in spark.read.parquet(cells_dir).collect()
    }
    assert got == expected


def test_hll_estimates_track_exact_and_merge_deterministically(spark, sf_dir):
    rows = _hll_cardinality(spark, sf_dir).collect()
    assert len(rows) > 1
    for r in rows:
        # default lgConfigK=12 keeps relative error ~1.6%; allow 5%
        assert abs(r.hll_users - r.exact_users) <= max(2, 0.05 * r.exact_users)
    # merging per-type sketches must give EXACTLY the same estimate as
    # sketching the raw stream once (register-wise max is associative)
    merged = next(r for r in rows if r.event_type == "__all__")
    ev = load_table(spark, sf_dir, "events")
    direct = ev.agg(
        F.hll_sketch_estimate(F.hll_sketch_agg("user_id")).cast("long")
    ).first()[0]
    assert direct == merged.hll_users


def test_repetition_flag_separates_augmented_docs(spark, sf_dir):
    rows = _repetition(spark, sf_dir).collect()
    for r in rows:
        if r.doc_id % 7 == 0:
            assert r.repetitive, f"augmented doc {r.doc_id} not flagged"
            assert r.dup_trigram_frac > 0.2
        else:
            assert not r.repetitive, f"natural doc {r.doc_id} flagged"
            assert r.dup_trigram_frac < 0.15
        assert 0.0 <= r.top_bigram_frac <= 2.0
        assert r.n_tokens > 0


def test_bloom_probe_requires_size_provenance(spark):
    """A words relation with no m_bits metadata (e.g. metadata lost in
    a re-aggregation) must raise, not silently probe mod the default
    size — that's the exact silent-false-negative the guard prevents."""
    import pytest

    from lightweight_vector_database_spark.operators import sketches as SK

    items = spark.createDataFrame([("a",), ("b",)], "item string")
    words = SK.bloom_build(items, "item", m_bits=1 << 12)
    # strip the metadata the way a naive merge would
    stripped = words.groupBy("word").agg(F.bit_or("bits").alias("bits"))
    probes = spark.createDataFrame([("a",), ("z",)], "item string")
    with pytest.raises(ValueError, match="m_bits metadata"):
        SK.bloom_probe(probes, "item", stripped)
    # explicit size recovers it
    got = {r.item: r.bloom_hit for r in
           SK.bloom_probe(probes, "item", stripped, m_bits=1 << 12).collect()}
    assert got["a"] is True


def test_bloom_merge_restamps_and_unions(spark):
    import pytest

    from lightweight_vector_database_spark.operators import sketches as SK

    a = SK.bloom_build(
        spark.createDataFrame([("x",), ("y",)], "item string"), "item",
        m_bits=1 << 12,
    )
    b = SK.bloom_build(
        spark.createDataFrame([("z",)], "item string"), "item", m_bits=1 << 12
    )
    merged = SK.bloom_merge(a, b)
    probes = spark.createDataFrame([("x",), ("z",), ("q",)], "item string")
    got = {r.item: r.bloom_hit for r in
           SK.bloom_probe(probes, "item", merged).collect()}  # metadata intact
    assert got["x"] is True and got["z"] is True
    # union semantics: no member of either side is ever a false negative
    c = SK.bloom_build(
        spark.createDataFrame([("w",)], "item string"), "item", m_bits=1 << 10
    )
    with pytest.raises(ValueError, match="mismatched"):
        SK.bloom_merge(a, c)


def test_bloom_grouped_build_equals_per_group_loop(spark, sf_dir):
    """VERDICT r6 item 3 pin: bloom_build_grouped (one groupBy job for
    all shards) is bit-identical per group to a per-shard bloom_build
    loop, and bloom_collapse equals bloom_merge over the loop's
    filters."""
    from lightweight_vector_database_spark.sources import load_table
    from pyspark.sql import functions as F

    docs = load_table(spark, sf_dir, "documents").select(
        "source", F.explode(F.split("text", " ")).alias("w")
    )
    m_bits = 1 << 14
    grouped = SK.bloom_build_grouped(docs, "w", ["source"], m_bits=m_bits)
    got = {
        (r.source, r.word): r.bits for r in grouped.collect()
    }
    sources = sorted(r.source for r in docs.select("source").distinct().collect())
    assert len(sources) >= 2
    loop_filters = []
    want = {}
    for s in sources:
        f = SK.bloom_build(
            docs.filter(F.col("source") == s).select("w"), "w", m_bits=m_bits
        )
        loop_filters.append(f)
        for r in f.collect():
            want[(s, r.word)] = r.bits
    assert got == want
    merged_loop = {r.word: r.bits for r in SK.bloom_merge(*loop_filters).collect()}
    collapsed = {r.word: r.bits for r in SK.bloom_collapse(grouped).collect()}
    assert collapsed == merged_loop
