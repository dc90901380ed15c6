"""Training-data curation, part 3: repetition-based quality filters and
sketch-backed corpus operators (Bloom decontamination, count-min
frequency estimation).

- ``curation_repetition_stats`` — the Gopher-style (Rae et al. 2021,
  public) repetition signals: fraction of the doc covered by its most
  frequent word bigram and the duplicate-trigram fraction. The fixture
  text is near-uniform synthetic words, so docs with doc_id % 7 == 0
  get a deterministic repeated phrase appended first (same pattern as
  ``curation_pii_redact``'s synthetic contacts) — the metrics and the
  `repetitive` cut are the ops under test.
- ``curation_bloom_contamination`` — the SCALE path for benchmark
  decontamination: instead of joining the train n-gram stream against
  the test-set inverted index (``curation_contamination``), fold the
  test set into a 64 Kbit / 4-hash Bloom filter (a ~2k-row word
  relation) and probe it with a broadcast join — at 100 TB the train
  side is never shuffled on the n-gram key. One-sided error only:
  Bloom membership can overcount (false positives ~3e-4 at this
  load), never miss, so every exact-join contamination hit is also a
  Bloom hit (pytest-pinned superset invariant).
- ``sketch_cms_topk_bigrams`` — count-min frequency estimates for the
  exact top-50 bigrams. The sketch is built from pre-aggregated
  per-item counts, shuffles at most depth x width cells, and merges
  across partitions/epochs by cell-wise sum (mergeability is
  pytest-pinned) — the pattern that replaces exact corpus-wide term
  counting when the item space itself is too large to shuffle.

All three are pure built-in expressions with exact DuckDB oracles (the
sketches are md5-derived, so the oracle rebuilds bit-identical state).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions import text as T
from ..operators.sketches import bloom_build, bloom_probe, cms_build, cms_estimate
from ..sources import load_table
from . import register

# --- Gopher-style repetition filters ---------------------------------------

_REP_PHRASE = " lorem ipsum dolor"
_REP_N = 12  # docs with doc_id % 7 == 0 get the phrase appended 12x
_DUP_TRI_CUT = 0.15  # natural fixture max is ~0.077; augmented docs >= 0.25


def _repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style repetition signals per doc.

    NOTE on ``top_bigram_frac`` = 2 * top_bigram_count / n_tokens: for
    OVERLAPPING repeats ("a a a a" -> bigram "a a" occurs 3 times in 4
    tokens) the numerator double-counts shared tokens, so the value can
    exceed 1.0 (bounded by 2.0) — it is a repetition INTENSITY score,
    not a true covered-token fraction (which would need interval
    merging per doc). The Gopher-style cut only needs monotonicity, and
    the overcount is engine-identical on both sides of the oracle; tune
    downstream thresholds against THIS definition, not a [0,1] range."""
    docs = load_table(spark, sf_dir, "documents", fan_out=True)
    aug = F.when(
        F.col("doc_id") % 7 == 0,
        F.concat(F.col("text"), F.repeat(F.lit(_REP_PHRASE), _REP_N)),
    ).otherwise(F.col("text"))
    base = docs.select("doc_id", aug.alias("t"))
    # ALL per-doc signals are map-only array expressions — including
    # the top-bigram count, computed as the longest run in the SORTED
    # bigram array (one O(n log n) sort + O(n) fold per doc, inside the
    # JVM). The earlier explode + two-aggregate form shuffled every
    # bigram occurrence (45M rows at sf3); A/B measured the fold at
    # 1.5-2.5x faster with identical values, and the whole query is now
    # shuffle-free (narrow dependency — the 100 TB shape for a per-doc
    # quality scorer).
    sorted_bgs = F.array_sort(T.word_ngrams("t", 2))
    acc0 = F.struct(
        F.lit("").alias("prev"),
        F.lit(0).cast("long").alias("run"),
        F.lit(0).cast("long").alias("best"),
    )
    top_run = F.aggregate(
        sorted_bgs,
        acc0,
        lambda a, x: F.struct(
            x.alias("prev"),
            F.when(x == a["prev"], a["run"] + 1)
            .otherwise(F.lit(1).cast("long"))
            .alias("run"),
            F.greatest(
                a["best"],
                F.when(x == a["prev"], a["run"] + 1)
                .otherwise(F.lit(1).cast("long")),
            ).alias("best"),
        ),
    )["best"]
    stats = base.select(
        "doc_id",
        T.token_count("t").alias("n_tokens"),
        F.size(T.word_ngrams("t", 3)).cast("long").alias("n_tri"),
        F.size(F.array_distinct(T.word_ngrams("t", 3))).cast("long").alias("n_tri_d"),
        top_run.alias("tb"),
    )
    m = stats.select(
        "doc_id",
        "n_tokens",
        F.col("tb").cast("long").alias("top_bigram_n"),
        F.round(
            F.when(
                F.col("n_tokens") > 0,
                F.lit(2) * F.coalesce(F.col("tb"), F.lit(0)) / F.col("n_tokens"),
            ).otherwise(F.lit(0.0)),
            6,
        ).alias("top_bigram_frac"),
        F.round(
            F.when(
                F.col("n_tri") > 0,
                (F.col("n_tri") - F.col("n_tri_d")) / F.col("n_tri"),
            ).otherwise(F.lit(0.0)),
            6,
        ).alias("dup_trigram_frac"),
    )
    # the cut compares the ROUNDED value so boundary behavior is
    # engine-identical
    return m.withColumn("repetitive", F.col("dup_trigram_frac") > _DUP_TRI_CUT)


register(
    "curation_repetition_stats",
    _repetition,
    f"""
WITH aug AS (
  SELECT doc_id,
         CASE WHEN doc_id % 7 = 0
              THEN text || repeat('{_REP_PHRASE}', {_REP_N})
              ELSE text END AS t
  FROM documents
), s AS (
  SELECT doc_id, len(w) AS n_tokens,
         [array_to_string(w[i:i + 1], ' ')
          FOR i IN range(1, greatest(len(w) - 1, 0) + 1)] AS bgs,
         [array_to_string(w[i:i + 2], ' ')
          FOR i IN range(1, greatest(len(w) - 2, 0) + 1)] AS tgs
  FROM (SELECT doc_id, string_split(t, ' ') AS w FROM aug)
), top AS (
  SELECT doc_id, max(c) AS tb FROM (
    SELECT doc_id, ng, count(*) AS c
    FROM (SELECT doc_id, unnest(bgs) AS ng FROM s) GROUP BY 1, 2
  ) GROUP BY 1
), m AS (
  SELECT s.doc_id, n_tokens, coalesce(tb, 0) AS top_bigram_n,
         round(CASE WHEN n_tokens > 0
                    THEN 2.0 * coalesce(tb, 0) / n_tokens ELSE 0 END, 6)
           AS top_bigram_frac,
         round(CASE WHEN len(tgs) > 0
                    THEN (len(tgs) - len(list_distinct(tgs))) * 1.0 / len(tgs)
                    ELSE 0 END, 6) AS dup_trigram_frac
  FROM s LEFT JOIN top ON s.doc_id = top.doc_id
)
SELECT doc_id, n_tokens, top_bigram_n, top_bigram_frac, dup_trigram_frac,
       dup_trigram_frac > {_DUP_TRI_CUT} AS repetitive
FROM m
""",
)


# --- Bloom-filter decontamination (sketch scale path) -----------------------

# the superset-of-exact invariant (tests/test_sketches.py) compares
# this query against curation_suite2's exact inverted-index join, so
# both MUST measure the same population: share its constants
from .curation_suite2 import _NGRAM_N, _TEST_CUT  # noqa: E402

_MIN_HITS = 2


def _bloom_contamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents", fan_out=True)
    grams = docs.select(
        "doc_id",
        F.explode(F.array_distinct(T.word_ngrams("text", _NGRAM_N))).alias("ng"),
    )
    words = bloom_build(grams.filter(F.col("doc_id") < _TEST_CUT).select("ng"), "ng")
    train = grams.filter(F.col("doc_id") >= _TEST_CUT)
    hits = bloom_probe(train, "ng", words)
    return (
        hits.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_grams"),
            F.count_if(F.col("bloom_hit")).alias("n_bloom_hits"),
        )
        .select(
            F.col("doc_id").alias("train_doc"),
            "n_grams",
            "n_bloom_hits",
            (F.col("n_bloom_hits") >= _MIN_HITS).alias("contaminated"),
        )
    )


register(
    "curation_bloom_contamination",
    _bloom_contamination,
    f"""
WITH g AS (
  SELECT DISTINCT doc_id,
         unnest([array_to_string(w[i:i + {_NGRAM_N} - 1], ' ')
                 FOR i IN range(1, greatest(len(w) - {_NGRAM_N} + 1, 0) + 1)]) AS ng
  FROM (SELECT doc_id, string_split(text, ' ') AS w FROM documents)
), pos AS (
  SELECT doc_id, ng,
         unnest([('0x' || substr(md5(ng), 1 + 6 * i, 6))::BIGINT % 65536
                 FOR i IN range(0, 4)]) AS pos
  FROM g
), bloom AS (
  SELECT pos // 32 AS word,
         bit_or(1::BIGINT << CAST(pos % 32 AS INT)) AS bits
  FROM pos WHERE doc_id < {_TEST_CUT} GROUP BY 1
), probe AS (
  SELECT doc_id, ng, pos // 32 AS word,
         1::BIGINT << CAST(pos % 32 AS INT) AS m
  FROM pos WHERE doc_id >= {_TEST_CUT}
), hits AS (
  SELECT doc_id, ng,
         count(*) FILTER (WHERE coalesce(bits, 0) & m <> 0) = 4 AS hit
  FROM probe LEFT JOIN bloom USING (word) GROUP BY 1, 2
)
SELECT doc_id AS train_doc, count(*) AS n_grams,
       count(*) FILTER (WHERE hit) AS n_bloom_hits,
       count(*) FILTER (WHERE hit) >= {_MIN_HITS} AS contaminated
FROM hits GROUP BY 1
""",
)


# --- deterministic train/val/test split -------------------------------------

# 90/5/5 by the first 4 md5 hex digits of a salted doc key — the same
# content-independent, seed-stable, engine-portable mechanism as
# curation_mixture_sample, applied to holdout splitting: a doc's split
# never changes as the corpus grows, so val/test stay uncontaminated
# across re-runs and incremental ingests (floor(0.90 * 65536) = 0xe666,
# floor(0.95 * 65536) = 0xf333).
_TRAIN_HI = "e666"
_VAL_HI = "f333"


def _train_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    key = F.substring(
        F.md5(F.concat(F.lit("split:"), F.col("doc_id").cast("string"))), 1, 4
    )
    split = (
        F.when(key < _TRAIN_HI, F.lit("train"))
        .when(key < _VAL_HI, F.lit("val"))
        .otherwise(F.lit("test"))
    )
    return (
        docs.groupBy("source", split.alias("split"))
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(T.token_count("text")).alias("sum_tokens"),
        )
    )


register(
    "curation_train_split",
    _train_split,
    f"""
WITH keyed AS (
  SELECT source,
         substr(md5('split:' || CAST(doc_id AS VARCHAR)), 1, 4) AS k,
         len(string_split(text, ' ')) AS toks
  FROM documents
)
SELECT source,
       CASE WHEN k < '{_TRAIN_HI}' THEN 'train'
            WHEN k < '{_VAL_HI}' THEN 'val'
            ELSE 'test' END AS split,
       count(*) AS n_docs, CAST(sum(toks) AS BIGINT) AS sum_tokens
FROM keyed GROUP BY 1, 2
""",
)


# --- containment pairs (asymmetric near-dup) ---------------------------------

_CONTAIN_CUT = 0.5


def _containment_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Doc pairs where the smaller doc's trigram set is >= 50%
    contained in the other — the ASYMMETRIC overlap metric that
    catches quotes, excerpts, and templated supersets jaccard
    under-scores (a short doc fully inside a long one has tiny
    jaccard but containment 1.0). Small-scale exact baseline on the
    same inverted-index shape as the jaccard pairs; at corpus scale
    the same formula runs on minhash-LSH candidates instead of all
    sharing pairs."""
    docs = load_table(spark, sf_dir, "documents", fan_out=True)
    grams = docs.select(
        "doc_id", F.explode(F.array_distinct(T.word_ngrams("text", 3))).alias("ng")
    )
    sizes = grams.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n"))
    a = grams.select(F.col("doc_id").alias("id1"), "ng")
    b = grams.select(F.col("doc_id").alias("id2"), "ng")
    shared = (
        a.join(b, "ng")
        .filter(F.col("id1") < F.col("id2"))
        .groupBy("id1", "id2")
        .agg(F.count(F.lit(1)).alias("shared"))
    )
    s1 = sizes.select(F.col("doc_id").alias("id1"), F.col("n").alias("n1"))
    s2 = sizes.select(F.col("doc_id").alias("id2"), F.col("n").alias("n2"))
    return (
        shared.join(s1, "id1")
        .join(s2, "id2")
        .withColumn(
            "containment",
            F.round(F.col("shared") / F.least(F.col("n1"), F.col("n2")), 6),
        )
        .filter(F.col("containment") >= _CONTAIN_CUT)
        .select("id1", "id2", "shared", "containment")
    )


register(
    "dedup_containment_pairs",
    _containment_pairs,
    f"""
WITH g AS (
  SELECT DISTINCT doc_id,
         unnest([array_to_string(w[i:i + 2], ' ')
                 FOR i IN range(1, greatest(len(w) - 2, 0) + 1)]) AS ng
  FROM (SELECT doc_id, string_split(text, ' ') AS w FROM documents)
), sz AS (
  SELECT doc_id, count(*) AS n FROM g GROUP BY 1
), sh AS (
  SELECT a.doc_id AS id1, b.doc_id AS id2, count(*) AS shared
  FROM g a JOIN g b USING (ng) WHERE a.doc_id < b.doc_id GROUP BY 1, 2
)
SELECT id1, id2, shared,
       round(shared * 1.0 / least(s1.n, s2.n), 6) AS containment
FROM sh JOIN sz s1 ON sh.id1 = s1.doc_id JOIN sz s2 ON sh.id2 = s2.doc_id
WHERE round(shared * 1.0 / least(s1.n, s2.n), 6) >= {_CONTAIN_CUT}
""",
    quadratic_baseline=(
        "all-sharing-pairs containment via inverted-index self-join "
        "(89.7s sf1 / 486s sf3; scale twin: dedup_containment_lsh, "
        "catch-all asymmetric twin: dedup_containment_banded)"
    ),
)


def _containment_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SCALE path for containment: the exact containment formula
    evaluated ONLY on minhash-LSH candidate pairs instead of every
    gram-sharing pair — candidates are linear in corpus size (banded
    join), and the per-pair trigram intersection is one codegen
    array_intersect on the two gram arrays, so the quadratic
    inverted-index join (`dedup_containment_pairs`, 486s at sf3)
    disappears entirely. Same value semantics per scored pair (exact
    set intersection, not the minhash estimate); coverage is the LSH
    candidate set, i.e. jaccard-similar pairs — for catch-all
    asymmetric containment of tiny-inside-huge docs, band the SHORT
    side's grams instead (same operator, different keying).
    The DuckDB oracle replicates candidates + intersection exactly."""
    from ..operators import dedup as D

    docs = load_table(spark, sf_dir, "documents")
    cands = D.minhash_dedup_candidates(
        docs, num_hashes=32, bands=8, ngram=3
    ).select("id1", "id2")
    sets = docs.select(
        "doc_id",
        F.array_distinct(T.word_ngrams("text", 3)).alias("g"),
    ).withColumn("n", F.size("g").cast("long"))
    g1 = sets.select(
        F.col("doc_id").alias("id1"), F.col("g").alias("g1"), F.col("n").alias("n1")
    )
    g2 = sets.select(
        F.col("doc_id").alias("id2"), F.col("g").alias("g2"), F.col("n").alias("n2")
    )
    return (
        cands.join(g1, "id1")
        .join(g2, "id2")
        .withColumn(
            "shared", F.size(F.array_intersect("g1", "g2")).cast("long")
        )
        .withColumn(
            "containment",
            F.round(F.col("shared") / F.least(F.col("n1"), F.col("n2")), 6),
        )
        .filter(F.col("containment") >= _CONTAIN_CUT)
        .select("id1", "id2", "shared", "containment")
    )


def _containment_lsh_oracle() -> str:
    from .dedup_suite import _minhash_cte

    return f"""
WITH {_minhash_cte()},
gset AS (
  SELECT doc_id,
         list_distinct(list_transform(range(1, len(w) - 1),
           i -> concat_ws(' ', w[i], w[i+1], w[i+2]))) AS grams
  FROM (SELECT doc_id, string_split(text, ' ') AS w FROM documents)
)
SELECT c.id1, c.id2,
       len(list_intersect(a.grams, b.grams)) AS shared,
       round(len(list_intersect(a.grams, b.grams)) * 1.0 /
             least(len(a.grams), len(b.grams)), 6) AS containment
FROM cand c JOIN gset a ON a.doc_id = c.id1 JOIN gset b ON b.doc_id = c.id2
WHERE round(len(list_intersect(a.grams, b.grams)) * 1.0 /
            least(len(a.grams), len(b.grams)), 6) >= {_CONTAIN_CUT}
"""


register("dedup_containment_lsh", _containment_lsh, _containment_lsh_oracle())


# --- short-side banded containment (VERDICT r9 item 9) ------------------------

_CB_H = 8
_CB_MAX_DF = 50


def _containment_banded(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The CATCH-ALL asymmetric containment path: candidates keyed on
    the SHORT side's bottom-h gram sketch
    (operators/dedup.containment_candidates_short) instead of
    jaccard-similar MinHash bands — a tiny quote inside a huge template
    has jaccard ~0.07 (no LSH band ever collides) but every sampled
    gram of the quote is in the template, so the probe hits with
    certainty at containment 1.0. Scoring is the same exact
    array_intersect formula as the LSH twin; candidates are linear in
    the corpus (h probe rows per doc against a df-capped inverted
    index)."""
    from ..operators import dedup as D

    docs = load_table(spark, sf_dir, "documents")
    cands = D.containment_candidates_short(
        docs, ngram=3, h=_CB_H, max_df=_CB_MAX_DF
    )
    sets = docs.select(
        "doc_id",
        F.array_distinct(T.word_ngrams("text", 3)).alias("g"),
    ).withColumn("n", F.size("g").cast("long"))
    g1 = sets.select(
        F.col("doc_id").alias("id1"), F.col("g").alias("g1"), F.col("n").alias("n1")
    )
    g2 = sets.select(
        F.col("doc_id").alias("id2"), F.col("g").alias("g2"), F.col("n").alias("n2")
    )
    return (
        cands.join(g1, "id1")
        .join(g2, "id2")
        .withColumn(
            "shared", F.size(F.array_intersect("g1", "g2")).cast("long")
        )
        .withColumn(
            "containment",
            F.round(F.col("shared") / F.least(F.col("n1"), F.col("n2")), 6),
        )
        .filter(F.col("containment") >= _CONTAIN_CUT)
        .select("id1", "id2", "shared", "containment")
    )


register(
    "dedup_containment_banded",
    _containment_banded,
    f"""
WITH g AS (
  SELECT DISTINCT doc_id,
         unnest([array_to_string(w[i:i + 2], ' ')
                 FOR i IN range(1, greatest(len(w) - 2, 0) + 1)]) AS ng
  FROM (SELECT doc_id, string_split(text, ' ') AS w FROM documents)
), dfc AS (
  SELECT ng, count(*) AS df FROM g GROUP BY ng
), gkept AS (
  -- df-cap applied BEFORE the sketch: the bottom-h probes are drawn
  -- over the kept vocabulary (operators/dedup.py — a sketch over ALL
  -- grams could consist entirely of dropped boilerplate and miss a
  -- containment-1.0 pair outright)
  SELECT doc_id, g.ng FROM g JOIN dfc USING (ng)
  WHERE dfc.df <= {_CB_MAX_DF}
), hashed AS (
  SELECT doc_id, ng,
         ('0x' || substr(md5(ng), 1, 15))::BIGINT % 2147483647 AS gh
  FROM gkept
), probes AS (
  SELECT doc_id AS pid, ng FROM (
    SELECT doc_id, ng,
           row_number() OVER (PARTITION BY doc_id ORDER BY gh, ng) AS rn
    FROM hashed
  ) WHERE rn <= {_CB_H}
), postings AS (
  SELECT doc_id AS oid, ng FROM gkept
), cand AS (
  SELECT DISTINCT least(pid, oid) AS id1, greatest(pid, oid) AS id2
  FROM probes JOIN postings USING (ng) WHERE pid != oid
), gset AS (
  SELECT doc_id,
         list_distinct(list_transform(range(1, len(w) - 1),
           i -> concat_ws(' ', w[i], w[i+1], w[i+2]))) AS grams
  FROM (SELECT doc_id, string_split(text, ' ') AS w FROM documents)
)
SELECT c.id1, c.id2,
       len(list_intersect(a.grams, b.grams)) AS shared,
       round(len(list_intersect(a.grams, b.grams)) * 1.0 /
             least(len(a.grams), len(b.grams)), 6) AS containment
FROM cand c JOIN gset a ON a.doc_id = c.id1 JOIN gset b ON b.doc_id = c.id2
WHERE round(len(list_intersect(a.grams, b.grams)) * 1.0 /
            least(len(a.grams), len(b.grams)), 6) >= {_CONTAIN_CUT}
""",
)


# --- cross-document n-gram novelty -------------------------------------------


def _ngram_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc novelty: the fraction of its distinct word 8-grams
    whose FIRST corpus occurrence (by doc_id order) is this doc — the
    cross-document self-repetition signal that catches boilerplate
    and template farms dedup misses (docs similar to MANY others
    without any single near-duplicate). Shape: ONE shuffle of the gram
    stream — an unordered window (partitionBy ng, no orderBy, so no
    sort: a whole-partition min) marks each occurrence with the gram's
    first doc in place, then the per-doc aggregate. The earlier
    groupBy+join-back form shuffled the gram stream twice; A/B measured
    the window at 2.5x faster with identical values (13.6s -> 5.2s at
    sf3). Hot-gram skew is identical in both forms (the gram's rows
    co-locate either way); at corpus scale the min-doc index is still
    a shareable byproduct — materialize the marked relation."""
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents", fan_out=True)
    grams = docs.select(
        "doc_id",
        F.explode(F.array_distinct(T.word_ngrams("text", _NGRAM_N))).alias("ng"),
    )
    marked = grams.withColumn(
        "first_doc", F.min("doc_id").over(Window.partitionBy("ng"))
    )
    return (
        marked.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_grams"),
            F.count_if(F.col("doc_id") == F.col("first_doc")).alias("n_novel"),
        )
        .select(
            "doc_id",
            "n_grams",
            "n_novel",
            F.round(F.col("n_novel") / F.col("n_grams"), 6).alias("novelty_frac"),
        )
    )


register(
    "curation_ngram_novelty",
    _ngram_novelty,
    f"""
WITH g AS (
  SELECT DISTINCT doc_id,
         unnest([array_to_string(w[i:i + {_NGRAM_N} - 1], ' ')
                 FOR i IN range(1, greatest(len(w) - {_NGRAM_N} + 1, 0) + 1)]) AS ng
  FROM (SELECT doc_id, string_split(text, ' ') AS w FROM documents)
), first AS (
  SELECT ng, min(doc_id) AS first_doc FROM g GROUP BY 1
)
SELECT doc_id, count(*) AS n_grams,
       count(*) FILTER (WHERE doc_id = first_doc) AS n_novel,
       round(count(*) FILTER (WHERE doc_id = first_doc) * 1.0 / count(*), 6)
         AS novelty_frac
FROM g JOIN first USING (ng)
GROUP BY 1
""",
)


# --- fixed-size per-stratum sampling -----------------------------------------

_SAMPLE_K = 5


def _stratified_sample_k(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exactly k docs per source, drawn by ranking a salted md5 key —
    the quota-sampling primitive that complements the hash-FRACTION
    ops (mixture sample, train split): those keep a rate, this keeps a
    fixed count per stratum. Deterministic and engine-portable like
    the rest of the family, and served by the generic per-group top-k
    operator, whose map-side partial reduction keeps the shuffle at
    #partitions x k x #strata rows at scale."""
    from ..operators.topk import topk_per_group

    docs = load_table(spark, sf_dir, "documents")
    keyed = docs.select(
        "source",
        "doc_id",
        F.md5(F.concat(F.lit("samp:"), F.col("doc_id").cast("string"))).alias(
            "draw_key"
        ),
    )
    out = topk_per_group(
        keyed,
        ["source"],
        "draw_key",
        k=_SAMPLE_K,
        ascending=True,
        tiebreak="doc_id",
        rank_col="draw_rank",
    )
    return out.select(
        "source", "doc_id", F.col("draw_rank").cast("long").alias("draw_rank")
    )


register(
    "curation_stratified_sample_k",
    _stratified_sample_k,
    f"""
SELECT source, doc_id, draw_rank FROM (
  SELECT source, doc_id,
         row_number() OVER (
           PARTITION BY source
           ORDER BY md5('samp:' || CAST(doc_id AS VARCHAR)), doc_id
         ) AS draw_rank
  FROM documents
) WHERE draw_rank <= {_SAMPLE_K}
""",
)


def _bloom_merged_contamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The per-shard MERGE form of Bloom decontamination — the actual
    100 TB deployment shape: one filter per source shard (per day /
    per dump in production), merged and probed once. The per-shard
    filters are built in ONE grouped pass (``bloom_build_grouped``:
    groupBy(source, word) + bit_or — a single shuffle at any shard
    count, where the previous per-source ``bloom_build`` loop launched
    one Spark job per shard; VERDICT r6 item 3), then collapsed with
    the same bit_or. bit_or is associative, so the merged filter is
    bit-identical to a single build over the union — which is exactly
    what the oracle computes, making the merge path itself
    value-checked (and tests pin grouped == per-source-loop
    bit-identity)."""
    docs = load_table(spark, sf_dir, "documents", fan_out=True)
    from ..operators.sketches import bloom_build_grouped, bloom_collapse

    grams = docs.select(
        "doc_id",
        "source",
        F.explode(F.array_distinct(T.word_ngrams("text", _NGRAM_N))).alias("ng"),
    )
    test = grams.filter(F.col("doc_id") < _TEST_CUT)
    per_source = bloom_build_grouped(
        test.select("source", "ng"), "ng", ["source"]
    )
    words = bloom_collapse(per_source)
    train = grams.filter(F.col("doc_id") >= _TEST_CUT).select("doc_id", "ng")
    hits = bloom_probe(train, "ng", words)
    return (
        hits.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_grams"),
            F.count_if(F.col("bloom_hit")).alias("n_bloom_hits"),
        )
        .select(
            F.col("doc_id").alias("train_doc"),
            "n_grams",
            "n_bloom_hits",
            (F.col("n_bloom_hits") >= _MIN_HITS).alias("contaminated"),
        )
    )


_BLOOM_ORACLE = f"""
WITH g AS (
  SELECT DISTINCT doc_id,
         unnest([array_to_string(w[i:i + {_NGRAM_N} - 1], ' ')
                 FOR i IN range(1, greatest(len(w) - {_NGRAM_N} + 1, 0) + 1)]) AS ng
  FROM (SELECT doc_id, string_split(text, ' ') AS w FROM documents)
), pos AS (
  SELECT doc_id, ng,
         unnest([('0x' || substr(md5(ng), 1 + 6 * i, 6))::BIGINT % 65536
                 FOR i IN range(0, 4)]) AS pos
  FROM g
), bloom AS (
  SELECT pos // 32 AS word,
         bit_or(1::BIGINT << CAST(pos % 32 AS INT)) AS bits
  FROM pos WHERE doc_id < {_TEST_CUT} GROUP BY 1
), probe AS (
  SELECT doc_id, ng, pos // 32 AS word,
         1::BIGINT << CAST(pos % 32 AS INT) AS m
  FROM pos WHERE doc_id >= {_TEST_CUT}
), hits AS (
  SELECT doc_id, ng,
         count(*) FILTER (WHERE coalesce(bits, 0) & m <> 0) = 4 AS hit
  FROM probe LEFT JOIN bloom USING (word) GROUP BY 1, 2
)
SELECT doc_id AS train_doc, count(*) AS n_grams,
       count(*) FILTER (WHERE hit) AS n_bloom_hits,
       count(*) FILTER (WHERE hit) >= {_MIN_HITS} AS contaminated
FROM hits GROUP BY 1
"""

register(
    "curation_bloom_merged_contamination",
    _bloom_merged_contamination,
    _BLOOM_ORACLE,
)


# --- count-min sketch frequency estimation ----------------------------------

_TOPK = 50


def _cms_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    counts = (
        docs.select(F.explode(T.word_ngrams("text", 2)).alias("ng"))
        .groupBy("ng")
        .agg(F.count(F.lit(1)).alias("exact_n"))
    )
    cells = cms_build(counts, "ng", "exact_n")
    topk = counts.orderBy(F.col("exact_n").desc(), F.col("ng")).limit(_TOPK)
    est = cms_estimate(topk.select("ng"), "ng", cells)
    return topk.join(est, "ng").select(
        "ng",
        "exact_n",
        "cms_n",
        (F.col("cms_n") - F.col("exact_n")).alias("overcount"),
    )


register(
    "sketch_cms_topk_bigrams",
    _cms_topk,
    f"""
WITH g AS (
  SELECT unnest([array_to_string(w[i:i + 1], ' ')
                 FOR i IN range(1, greatest(len(w) - 1, 0) + 1)]) AS ng
  FROM (SELECT string_split(text, ' ') AS w FROM documents)
), counts AS (
  SELECT ng, count(*) AS exact_n FROM g GROUP BY 1
), cells AS (
  SELECT row, bucket, CAST(sum(exact_n) AS BIGINT) AS cell_n FROM (
    SELECT exact_n, r AS row,
           ('0x' || substr(md5('cms' || r || ':' || ng), 1, 4))::BIGINT % 1024
             AS bucket
    FROM counts, range(0, 4) t(r)
  ) GROUP BY 1, 2
), topk AS (
  SELECT ng, exact_n FROM counts ORDER BY exact_n DESC, ng LIMIT {_TOPK}
), est AS (
  SELECT ng, min(cell_n) AS cms_n FROM (
    SELECT k.ng, c.cell_n
    FROM (SELECT ng, r,
                 ('0x' || substr(md5('cms' || r || ':' || ng), 1, 4))::BIGINT
                   % 1024 AS bucket
          FROM topk, range(0, 4) t(r)) k
    JOIN cells c ON c.row = k.r AND c.bucket = k.bucket
  ) GROUP BY 1
)
SELECT ng, exact_n, cms_n, cms_n - exact_n AS overcount
FROM topk JOIN est USING (ng)
""",
)
