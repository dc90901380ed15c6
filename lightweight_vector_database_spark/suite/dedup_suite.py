"""Deduplication + similarity queries (north-star dedup ops)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators import dedup as D
from ..sources import load_table
from . import register

_NORM = r"regexp_replace(trim(lower(text)), '\s+', ' ', 'g')"


def _exact_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    from ..functions.text import content_sha256

    return docs.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.countDistinct(content_sha256("text")).alias("n_distinct"),
    )


register(
    "dedup_exact_summary",
    _exact_summary,
    f"""
SELECT source, count(*) AS n_docs,
       count(DISTINCT sha256({_NORM})) AS n_distinct
FROM documents GROUP BY source
""",
)


def _exact_keep_min(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    out = D.exact_dedup(docs, "text", "doc_id")
    return out.select("doc_id", "dup_count")


register(
    "dedup_exact_keep_min",
    _exact_keep_min,
    f"""
WITH h AS (
  SELECT doc_id, sha256({_NORM}) AS hsh FROM documents
), g AS (
  SELECT doc_id, count(*) OVER (PARTITION BY hsh) AS dup_count,
         min(doc_id) OVER (PARTITION BY hsh) AS keeper
  FROM h
)
SELECT doc_id, dup_count FROM g WHERE doc_id = keeper
""",
)


def _jaccard_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    pairs = D.jaccard_pairs(docs, "doc_id", "text", ngram=1, threshold=0.95)
    return pairs.select(
        "id1", "id2", F.round(F.col("jaccard"), 6).alias("jaccard")
    )


register(
    "dedup_jaccard_pairs",
    _jaccard_pairs,
    """
WITH s AS (
  SELECT doc_id, list_distinct(string_split(text, ' ')) AS toks FROM documents
), p AS (
  SELECT a.doc_id AS id1, b.doc_id AS id2,
         len(list_intersect(a.toks, b.toks)) AS common,
         len(a.toks) AS n1, len(b.toks) AS n2
  FROM s a JOIN s b ON a.doc_id < b.doc_id
)
SELECT id1, id2,
       round(common::DOUBLE / (n1 + n2 - common), 6) AS jaccard
FROM p
WHERE common::DOUBLE / (n1 + n2 - common) >= 0.95
""",
    quadratic_baseline="all-pairs exact jaccard (oracle for minhash LSH; "
    "scale path: dedup_jaccard_prefix_filtered)",
)


def _ngram3_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    pairs = D.jaccard_pairs(docs, "doc_id", "text", ngram=3, threshold=0.02)
    return pairs.select(
        "id1", "id2", F.round(F.col("jaccard"), 6).alias("jaccard")
    )


register(
    "dedup_ngram3_jaccard_pairs",
    _ngram3_pairs,
    """
WITH s AS (
  SELECT doc_id,
         list_distinct(list_transform(range(1, len(w) - 1),
           i -> concat_ws(' ', w[i], w[i+1], w[i+2]))) AS toks
  FROM (SELECT doc_id, string_split(text, ' ') AS w FROM documents)
), p AS (
  SELECT a.doc_id AS id1, b.doc_id AS id2,
         len(list_intersect(a.toks, b.toks)) AS common,
         len(a.toks) AS n1, len(b.toks) AS n2
  FROM s a JOIN s b ON a.doc_id < b.doc_id
)
SELECT id1, id2,
       round(common::DOUBLE / (n1 + n2 - common), 6) AS jaccard
FROM p
WHERE common > 0 AND common::DOUBLE / (n1 + n2 - common) >= 0.02
""",
    quadratic_baseline="all-pairs exact jaccard (oracle for minhash LSH; "
    "scale path: dedup_jaccard_prefix_filtered)",
)


def _jaccard_prefix_filtered(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The PREFIX-FILTER scale path for exact jaccard: shingles whose
    document frequency exceeds ``max_df`` are dropped before the
    inverted-index self-join, bounding the join at sum_kept(df^2) <=
    |index| * max_df — linear in corpus size for a fixed cap — where
    the unfiltered baseline (`dedup_jaccard_pairs`) is quadratic.
    Jaccard is over the FILTERED sets (set sizes recomputed post-
    filter, operators/dedup.jaccard_pairs), and the whole thing is
    value-exact against a DuckDB twin of the same df-capped pipeline."""
    docs = load_table(spark, sf_dir, "documents")
    pairs = D.jaccard_pairs(
        docs, "doc_id", "text", ngram=3, threshold=0.5, max_df=20
    )
    return pairs.select(
        "id1", "id2", F.round(F.col("jaccard"), 6).alias("jaccard")
    )


register(
    "dedup_jaccard_prefix_filtered",
    _jaccard_prefix_filtered,
    """
WITH s AS (
  SELECT doc_id,
         list_distinct(list_transform(range(1, len(w) - 1),
           i -> concat_ws(' ', w[i], w[i+1], w[i+2]))) AS toks
  FROM (SELECT doc_id, string_split(text, ' ') AS w FROM documents)
), inv AS (
  SELECT doc_id, unnest(toks) AS tok FROM s
), dfc AS (
  SELECT tok, count(*) AS df FROM inv GROUP BY tok
), kept AS (
  SELECT i.doc_id, i.tok FROM inv i JOIN dfc USING (tok) WHERE df <= 20
), sizes AS (
  SELECT doc_id, count(*) AS n FROM kept GROUP BY doc_id
), p AS (
  SELECT a.doc_id AS id1, b.doc_id AS id2, count(*) AS common
  FROM kept a JOIN kept b ON a.tok = b.tok AND a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT p.id1, p.id2,
       round(common::DOUBLE / (s1.n + s2.n - common), 6) AS jaccard
FROM p
JOIN sizes s1 ON s1.doc_id = p.id1
JOIN sizes s2 ON s2.doc_id = p.id2
WHERE common::DOUBLE / (s1.n + s2.n - common) >= 0.5
""",
)


def _minhash_cands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash+LSH near-dup candidates on 3-gram shingles.

    Shingles, not unigrams: with this corpus's 31-word vocabulary,
    unigram token sets collide pathologically (every doc shares most
    tokens with every other) and LSH degenerates to an all-pairs join —
    7.9M candidates from 5k docs. 3-gram shingle sets are near-unique
    per doc, which is exactly why shingling is the standard for
    near-dup detection.

    Exact-oracled: the portable md5-based token hash (see
    ``operators.dedup.portable_token_hash``) makes every stage —
    shingle hash, 32 affine permutations, 8-band bucketing, candidate
    pairs, est_jaccard — reproducible in DuckDB SQL, so the whole
    approximate pipeline is value-checked against an independent
    engine, not just row-counted."""
    docs = load_table(spark, sf_dir, "documents")
    out = D.minhash_dedup_candidates(docs, num_hashes=32, bands=8, ngram=3)
    return out.select(
        "id1", "id2", F.round(F.col("est_jaccard"), 6).alias("est_jaccard")
    )


def _minhash_cte(
    num_hashes: int = 32,
    bands: int = 8,
    max_bucket: int | None = None,
    oversize: str = "drop",
) -> str:
    """DuckDB CTE body reproducing the MinHash pipeline with the same
    (a, b) params baked in, ending in ``pairs (id1, id2, est)`` —
    candidate pairs with the UNROUNDED agreement estimate. Differences
    from the Spark plan are representational only: band buckets join
    on the band's value string instead of its xxhash64 (equal content
    <=> equal bucket), and the signature fold is k list_min's instead
    of one fold — same values. ``max_bucket`` mirrors the drop-mode
    bucket cap (operators/dedup._cap_band_sides): buckets over the cap
    are excluded from BOTH sides of the pair join."""
    from ..operators.dedup import _MERSENNE31 as P
    from ..operators.dedup import _perm_params

    params = _perm_params(num_hashes)
    slots = ",\n    ".join(
        f"coalesce(list_min(list_transform(hs, x -> ({a} * x + {b}) % {P})), {P})"
        for a, b in params
    )
    rows_per_band = num_hashes // bands
    band_selects = "\n  UNION ALL ".join(
        "SELECT doc_id, {band} AS band, concat_ws(',', {cells}) AS key FROM sig".format(
            band=band,
            cells=", ".join(
                f"sig[{band * rows_per_band + j + 1}]" for j in range(rows_per_band)
            ),
        )
        for band in range(bands)
    )
    cap_ctes = ""
    cand_cte = """cand AS (
  SELECT DISTINCT a.doc_id AS id1, b.doc_id AS id2
  FROM bands a JOIN bands b
    ON a.band = b.band AND a.key = b.key AND a.doc_id < b.doc_id
)"""
    if max_bucket is not None and oversize == "drop":
        cap_ctes = f"""bstat AS (
  SELECT band, key, count(*) AS bsz FROM bands GROUP BY 1, 2
),
kept AS (
  SELECT b.doc_id, b.band, b.key FROM bands b
  JOIN bstat USING (band, key) WHERE bsz <= {max_bucket}
),
"""
        cand_cte = """cand AS (
  SELECT DISTINCT a.doc_id AS id1, b.doc_id AS id2
  FROM kept a JOIN kept b
    ON a.band = b.band AND a.key = b.key AND a.doc_id < b.doc_id
)"""
    elif max_bucket is not None:  # star: probe side = under-cap OR bucket min
        cap_ctes = f"""bstat AS (
  SELECT band, key, count(*) AS bsz, min(doc_id) AS bmin
  FROM bands GROUP BY 1, 2
),
aside AS (
  SELECT b.doc_id, b.band, b.key FROM bands b
  JOIN bstat USING (band, key)
  WHERE bsz <= {max_bucket} OR b.doc_id = bmin
),
"""
        cand_cte = """cand AS (
  SELECT DISTINCT a.doc_id AS id1, b.doc_id AS id2
  FROM aside a JOIN bands b
    ON a.band = b.band AND a.key = b.key AND a.doc_id < b.doc_id
)"""
    return f"""w AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
g AS (
  SELECT doc_id,
         list_distinct(list_transform(range(1, len(w) - 1),
           i -> concat_ws(' ', w[i], w[i+1], w[i+2]))) AS grams
  FROM w
),
h AS (
  SELECT doc_id,
         list_transform(grams,
           t -> ('0x' || substr(md5(t), 1, 15))::BIGINT % {P}) AS hs
  FROM g
),
sig AS (
  SELECT doc_id, [
    {slots}
  ] AS sig
  FROM h
),
bands AS (
  {band_selects}
),
{cap_ctes}{cand_cte},
pairs AS (
  SELECT c.id1, c.id2,
         list_sum(list_transform(range(1, {num_hashes + 1}),
           i -> CASE WHEN s1.sig[i] = s2.sig[i] THEN 1 ELSE 0 END))
           / {float(num_hashes)} AS est
  FROM cand c
  JOIN sig s1 ON s1.doc_id = c.id1
  JOIN sig s2 ON s2.doc_id = c.id2
)"""


register(
    "dedup_minhash_candidates",
    _minhash_cands,
    f"""
WITH {_minhash_cte()}
SELECT id1, id2, round(est, 6) AS est_jaccard FROM pairs
""",
)


_CAP = 2  # sf0.01 has 8 size-3 buckets, so this cap genuinely drops mass


def _minhash_capped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The bucket-CAPPED LSH candidate path — the 100 TB hardening of
    `dedup_minhash_candidates`: buckets over ``max_bucket`` members are
    dropped (with their membership mass logged) before the pair join,
    bounding per-bucket work at max_bucket² where a boilerplate
    mega-bucket would otherwise pay bucket². A pair survives iff ANY
    of its shared buckets is under the cap — the DuckDB oracle
    replicates exactly that semantics (same cap on the band CTE), so
    the cap itself is value-checked, not just the happy path."""
    docs = load_table(spark, sf_dir, "documents")
    out = D.minhash_dedup_candidates(
        docs, num_hashes=32, bands=8, ngram=3, max_bucket=_CAP
    )
    return out.select(
        "id1", "id2", F.round(F.col("est_jaccard"), 6).alias("est_jaccard")
    )


register(
    "dedup_minhash_capped",
    _minhash_capped,
    f"""
WITH {_minhash_cte(max_bucket=_CAP)}
SELECT id1, id2, round(est, 6) AS est_jaccard FROM pairs
""",
)


_LSH_CLUSTER_THR = 0.5  # est threshold on the exact k/32 grid


def _lsh_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SCALE path for near-dup clustering: connected components
    over minhash-LSH candidate edges (est agreement >= 0.5) instead of
    the all-pairs exact-jaccard graph `dedup_connected_clusters` uses
    as its small-scale baseline. Linear in corpus size end to end
    (banded LSH edges + large/small-star CC) — and still value-exact
    against DuckDB: the portable token hash makes the edge set
    reproducible in SQL, and the recursive CTE recomputes the same
    min-reachable-label components."""
    from ..operators.graph import dedup_clusters

    docs = load_table(spark, sf_dir, "documents")
    cands = D.minhash_dedup_candidates(docs, num_hashes=32, bands=8, ngram=3)
    edges = cands.filter(F.col("est_jaccard") >= _LSH_CLUSTER_THR)
    return dedup_clusters(docs, edges).select("doc_id", "cluster", "is_keeper")


register(
    "dedup_lsh_clusters",
    _lsh_clusters,
    f"""
WITH RECURSIVE {_minhash_cte()},
fil AS (
  SELECT id1, id2 FROM pairs WHERE est >= {_LSH_CLUSTER_THR}
),
edges AS (
  SELECT id1 AS a, id2 AS b FROM fil UNION ALL SELECT id2, id1 FROM fil
),
reach(node, r) AS (
  SELECT DISTINCT a, a FROM edges
  UNION
  SELECT reach.node, e.b FROM reach JOIN edges e ON e.a = reach.r
),
comp AS (
  SELECT node, min(r) AS component FROM reach GROUP BY node
)
SELECT d.doc_id,
       coalesce(c.component, d.doc_id) AS cluster,
       d.doc_id = coalesce(c.component, d.doc_id) AS is_keeper
FROM documents d LEFT JOIN comp c ON c.node = d.doc_id
""",
)


def _lsh_clusters_star(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STAR-capped LSH clustering — the boilerplate-proof variant of
    `dedup_lsh_clusters`: oversized LSH buckets contribute only their
    b-1 star edges (min-id representative) instead of b(b-1)/2 pairs,
    so a mega-bucket costs linear work while its members stay
    CC-reachable through the representative. The DuckDB oracle
    replicates the star semantics exactly (probe side = under-cap rows
    OR the bucket min, build side = all rows), then the same recursive
    min-reachable-label CC — value-checking star mode end to end, not
    just in pytest."""
    from ..operators.graph import dedup_clusters

    docs = load_table(spark, sf_dir, "documents")
    cands = D.minhash_dedup_candidates(
        docs, num_hashes=32, bands=8, ngram=3, max_bucket=_CAP, oversize="star"
    )
    edges = cands.filter(F.col("est_jaccard") >= _LSH_CLUSTER_THR)
    return dedup_clusters(docs, edges).select("doc_id", "cluster", "is_keeper")


register(
    "dedup_lsh_clusters_star",
    _lsh_clusters_star,
    f"""
WITH RECURSIVE {_minhash_cte(max_bucket=_CAP, oversize="star")},
fil AS (
  SELECT id1, id2 FROM pairs WHERE est >= {_LSH_CLUSTER_THR}
),
edges AS (
  SELECT id1 AS a, id2 AS b FROM fil UNION ALL SELECT id2, id1 FROM fil
),
reach(node, r) AS (
  SELECT DISTINCT a, a FROM edges
  UNION
  SELECT reach.node, e.b FROM reach JOIN edges e ON e.a = reach.r
),
comp AS (
  SELECT node, min(r) AS component FROM reach GROUP BY node
)
SELECT d.doc_id,
       coalesce(c.component, d.doc_id) AS cluster,
       d.doc_id = coalesce(c.component, d.doc_id) AS is_keeper
FROM documents d LEFT JOIN comp c ON c.node = d.doc_id
""",
)


def _simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return D.simhash64(docs, "doc_id", "text").select("id", "simhash")


def _simhash_sql_core() -> str:
    """DuckDB twin of operators/dedup.simhash64: md5-derived 64-bit
    token hashes (hi32<<32 | lo32 — assembled with a checked sign-fold
    multiply because DuckDB's << raises on overflow where Spark's
    shiftleft wraps), then 64 per-bit +-1 vote folds reassembled into
    the signed simhash (positive bit values first, the i=63 sign-bit
    term last, so no intermediate overflows)."""
    nib = lambda p: (  # noqa: E731
        f"(strpos('0123456789abcdef', substr(md5(tok), {p}, 1)) - 1)"
    )

    def horner(lo: int, n: int) -> str:
        v = nib(lo)
        for i in range(lo + 1, lo + n):
            v = f"({v} * 16 + {nib(i)})"
        return v

    hi, lo = horner(1, 8), horner(9, 8)
    tok64 = f"(({hi} - ({hi} >> 31) * 4294967296) * 4294967296 + {lo})"
    terms, neg = [], ""
    for i in range(64):
        vote = (
            "list_sum(list_transform(hs, h -> "
            f"CASE WHEN ((h >> {i}) & 1) = 1 THEN 1 ELSE -1 END))"
        )
        if i < 63:
            terms.append(f"CASE WHEN {vote} > 0 THEN {1 << i} ELSE 0 END")
        else:
            neg = f"CASE WHEN {vote} > 0 THEN -9223372036854775808 ELSE 0 END"
    sim = "(" + " + ".join(terms) + f") + {neg}"
    return f"""
t AS (
  SELECT doc_id, list_transform(list_distinct(string_split(text, ' ')),
                                tok -> {tok64}) AS hs
  FROM documents
),
sh AS (SELECT doc_id AS id, {sim} AS simhash FROM t)
"""


register(
    "dedup_simhash_docs",
    _simhash,
    f"WITH {_simhash_sql_core()} SELECT id, simhash FROM sh",
)


def _simhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact hamming<=3 near-dup pairs via 4-band simhash join (no
    all-pairs scan; exactness by pigeonhole — operators/dedup.py).
    The oracle recomputes the md5-derived simhashes in SQL and joins
    ALL pairs brute-force — a stronger differential than re-banding:
    it re-proves the pigeonhole exactness claim on every run."""
    docs = load_table(spark, sf_dir, "documents")
    return D.simhash_candidate_pairs(docs, "doc_id", "text").orderBy("id1", "id2")


register(
    "dedup_simhash_pairs",
    _simhash_pairs,
    f"""
WITH {_simhash_sql_core()}
SELECT a.id AS id1, b.id AS id2,
       CAST(bit_count(xor(a.simhash, b.simhash)) AS INTEGER) AS hamming
FROM sh a JOIN sh b ON a.id < b.id
WHERE bit_count(xor(a.simhash, b.simhash)) <= 3
""",
)


def _stream_admission(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BATCH TWIN of the streaming near-dup admission check
    (streaming/neardup.stream_near_dup_pairs): band collisions of each
    document against the corpus band index, self-matches excluded, one
    row per colliding band. The operator is stateless expressions +
    one stream-static join, so this batch run is value-identical to
    the streaming run (pinned by tests/test_streaming.py); the oracle
    rebuilds the same signatures/bands in SQL."""
    from ..streaming.neardup import corpus_band_index, stream_near_dup_pairs

    docs = load_table(spark, sf_dir, "documents")
    index = corpus_band_index(docs)
    out = stream_near_dup_pairs(docs.select("doc_id", "text"), index)
    return out.select(
        "doc_id", "corpus_id", F.col("band").cast("long").alias("band")
    )


register(
    "dedup_stream_admission_pairs",
    _stream_admission,
    f"""
WITH {_minhash_cte()}
SELECT a.doc_id, b.doc_id AS corpus_id, CAST(a.band AS BIGINT) AS band
FROM bands a JOIN bands b
  ON a.band = b.band AND a.key = b.key AND a.doc_id != b.doc_id
""",
)


_SIMHASH_CAP = 100  # sf0.01 has one 159-member band bucket; this drops it


def _simhash_capped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bucket-capped simhash pairs — the scale-hardened twin of
    `dedup_simhash_pairs`: band buckets over the cap (the fixture has a
    159-member one, 159² = ~25k join pairs from ONE bucket) are dropped
    from both join sides before the pair join, with the dropped mass
    logged. The oracle REPLICATES the banding + cap in SQL — unlike the
    uncapped query's brute-force oracle, this one value-checks the
    bucket mechanics themselves (band keys, bucket counts, cap filter).
    DuckDB's arithmetic >> matches Spark's shiftrightunsigned here
    because the & mask keeps only low bits, which both shifts agree on."""
    docs = load_table(spark, sf_dir, "documents")
    return D.simhash_candidate_pairs(
        docs, "doc_id", "text", max_bucket=_SIMHASH_CAP
    ).orderBy("id1", "id2")


def _simhash_capped_oracle() -> str:
    width = 16
    band_selects = " UNION ALL ".join(
        f"SELECT id, {b} AS band, (simhash >> {b * width}) & 65535 AS key FROM sh"
        for b in range(4)
    )
    return f"""
WITH {_simhash_sql_core()},
bands AS (
  {band_selects}
),
bstat AS (SELECT band, key, count(*) AS bsz FROM bands GROUP BY 1, 2),
kept AS (
  SELECT b.id, b.band, b.key FROM bands b
  JOIN bstat USING (band, key) WHERE bsz <= {_SIMHASH_CAP}
),
cand AS (
  SELECT DISTINCT a.id AS id1, b.id AS id2
  FROM kept a JOIN kept b ON a.band = b.band AND a.key = b.key AND a.id < b.id
)
SELECT c.id1, c.id2,
       CAST(bit_count(xor(s1.simhash, s2.simhash)) AS INTEGER) AS hamming
FROM cand c JOIN sh s1 ON s1.id = c.id1 JOIN sh s2 ON s2.id = c.id2
WHERE bit_count(xor(s1.simhash, s2.simhash)) <= 3
"""


register("dedup_simhash_capped", _simhash_capped, _simhash_capped_oracle())


def _dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup CLUSTERS via iterative connected components over the
    jaccard>=0.95 pair graph (operators/graph.py driver-loop joins);
    oracle is a DuckDB recursive CTE computing min reachable label.

    SMALL-SCALE EXACT BASELINE: the edge source is the all-pairs
    jaccard inverted-index join, quadratic by design (verified to
    explode at the 10x fixture — see tools/run_all_queries.py).
    The registered scale path is ``dedup_lsh_clusters``: same CC,
    minhash-LSH edges, linear end to end."""
    from ..operators.graph import dedup_clusters

    docs = load_table(spark, sf_dir, "documents")
    pairs = D.jaccard_pairs(docs, threshold=0.95)
    return dedup_clusters(docs, pairs).select("doc_id", "cluster", "is_keeper")


register(
    "dedup_connected_clusters",
    _dedup_clusters,
    """
WITH RECURSIVE s AS (
  SELECT doc_id, list_distinct(string_split(text, ' ')) AS toks FROM documents
), p AS (
  SELECT a.doc_id AS id1, b.doc_id AS id2
  FROM s a JOIN s b ON a.doc_id < b.doc_id
  WHERE len(list_intersect(a.toks, b.toks))::DOUBLE /
        (len(a.toks) + len(b.toks) - len(list_intersect(a.toks, b.toks))) >= 0.95
), edges AS (
  SELECT id1 AS a, id2 AS b FROM p UNION ALL SELECT id2, id1 FROM p
), reach(node, r) AS (
  SELECT DISTINCT a, a FROM edges
  UNION
  SELECT reach.node, e.b FROM reach JOIN edges e ON e.a = reach.r
), comp AS (
  SELECT node, min(r) AS component FROM reach GROUP BY node
)
SELECT d.doc_id,
       coalesce(c.component, d.doc_id) AS cluster,
       d.doc_id = coalesce(c.component, d.doc_id) AS is_keeper
FROM documents d LEFT JOIN comp c ON c.node = d.doc_id
""",
    quadratic_baseline="edges from all-pairs exact jaccard (scale path: "
    "LSH edges + CC, see cc_scale_test.py)",
)


def _emb_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    out = D.embedding_topk_pairs(emb, k=20)
    return out.select(
        "id1", "id2", F.round(F.col("cos_dist"), 6).alias("cos_dist")
    )


register(
    "embedding_nearest_pairs",
    _emb_pairs,
    """
WITH n AS (
  SELECT vec_id, embedding,
         sqrt(list_sum(list_transform(range(1, 65),
           i -> CAST(embedding[i] AS DOUBLE) * CAST(embedding[i] AS DOUBLE)))) AS nrm
  FROM embeddings
), p AS (
  SELECT a.vec_id AS id1, b.vec_id AS id2,
         1.0 - list_sum(list_transform(range(1, 65),
           i -> CAST(a.embedding[i] AS DOUBLE) * CAST(b.embedding[i] AS DOUBLE)))
           / (a.nrm * b.nrm) AS cos_dist
  FROM n a JOIN n b ON a.vec_id < b.vec_id
)
SELECT id1, id2, round(cos_dist, 6) AS cos_dist
FROM p ORDER BY cos_dist ASC, id1 ASC, id2 ASC LIMIT 20
""",
    quadratic_baseline="all-pairs exact cosine (oracle for SRP LSH)",
)


def _embedding_srp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cosine LSH near-dup pairs via signed random projections
    (operators/dedup.embedding_srp_pairs) — the banded scale path for
    embedding near-dup; exact at hamming <= bands-1 by pigeonhole.
    Oracle recomputes the identical signatures + brute pair filter in
    SQL (hyperplane coefficients embed exactly: 6-decimal literals)."""
    docs = load_table(spark, sf_dir, "embeddings")
    return D.embedding_srp_pairs(docs, max_hamming=1, bands=4, num_bits=32)


def _srp_oracle(max_hamming: int = 1, num_bits: int = 32, dim: int = 64) -> str:
    planes = D._srp_planes(num_bits, dim)
    bits = []
    for j, plane in enumerate(planes):
        arr = "[" + ", ".join(repr(c) for c in plane) + "]::DOUBLE[]"
        dot = (
            f"list_sum(list_transform(range(1, {dim + 1}), "
            f"i -> CAST(embedding[i] AS DOUBLE) * ({arr})[i]))"
        )
        bits.append(f"(CASE WHEN {dot} >= 0 THEN {1 << j}::BIGINT ELSE 0 END)")
    sig = " + ".join(bits)
    x = "CAST(a.embedding[i] AS DOUBLE)"
    y = "CAST(b.embedding[i] AS DOUBLE)"
    rng = f"range(1, {dim + 1})"
    dotp = f"list_sum(list_transform({rng}, i -> {x} * {y}))"
    na = f"sqrt(list_sum(list_transform({rng}, i -> {x} * {x})))"
    nb = f"sqrt(list_sum(list_transform({rng}, i -> {y} * {y})))"
    return f"""
WITH sig AS (
  SELECT vec_id, embedding, ({sig}) AS s FROM embeddings
)
SELECT a.vec_id AS id1, b.vec_id AS id2,
       CAST(bit_count(xor(a.s, b.s)) AS INT) AS hamming,
       round(1.0 - ({dotp}) / (({na}) * ({nb})), 6) AS cos_dist
FROM sig a JOIN sig b ON a.vec_id < b.vec_id
WHERE bit_count(xor(a.s, b.s)) <= {max_hamming}
"""


register(
    "embedding_srp_pairs",
    _embedding_srp,
    _srp_oracle(),
    quadratic_baseline="uncapped banded self-join; replicated fixture "
    "vectors make every bucket a mega-bucket (died at sf3, 609s; scale "
    "path: embedding_srp_capped)",
)


_SRP_CAP = 32  # sf0.01 SRP band buckets reach 48 members; this cap bites


def _embedding_srp_capped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bucket-capped SRP pairs — the registered scale path for
    embedding near-dup on boilerplate-heavy corpora (re-encoded
    templates collapse to one signature and pay bucket² in EVERY band
    without the cap; the sf3 breadth run demonstrates the uncapped
    blowup). The oracle replicates banding + bucket counts + cap in
    SQL, value-checking the cap mechanics end to end."""
    emb = load_table(spark, sf_dir, "embeddings")
    return D.embedding_srp_pairs(
        emb, max_hamming=1, bands=4, num_bits=32, max_bucket=_SRP_CAP
    )


def _srp_capped_oracle(
    max_hamming: int = 1, bands: int = 4, num_bits: int = 32, dim: int = 64
) -> str:
    planes = D._srp_planes(num_bits, dim)
    bits = []
    for j, plane in enumerate(planes):
        arr = "[" + ", ".join(repr(c) for c in plane) + "]::DOUBLE[]"
        dot = (
            f"list_sum(list_transform(range(1, {dim + 1}), "
            f"i -> CAST(embedding[i] AS DOUBLE) * ({arr})[i]))"
        )
        bits.append(f"(CASE WHEN {dot} >= 0 THEN {1 << j}::BIGINT ELSE 0 END)")
    sig = " + ".join(bits)
    width = num_bits // bands
    mask = (1 << width) - 1
    band_selects = " UNION ALL ".join(
        f"SELECT vec_id, {b} AS band, (s >> {b * width}) & {mask} AS key FROM sig"
        for b in range(bands)
    )
    x = "CAST(s1.embedding[i] AS DOUBLE)"
    y = "CAST(s2.embedding[i] AS DOUBLE)"
    rng = f"range(1, {dim + 1})"
    dotp = f"list_sum(list_transform({rng}, i -> {x} * {y}))"
    na = f"sqrt(list_sum(list_transform({rng}, i -> {x} * {x})))"
    nb = f"sqrt(list_sum(list_transform({rng}, i -> {y} * {y})))"
    return f"""
WITH sig AS (
  SELECT vec_id, embedding, ({sig}) AS s FROM embeddings
),
bands AS (
  {band_selects}
),
bstat AS (SELECT band, key, count(*) AS bsz FROM bands GROUP BY 1, 2),
kept AS (
  SELECT b.vec_id, b.band, b.key FROM bands b
  JOIN bstat USING (band, key) WHERE bsz <= {_SRP_CAP}
),
cand AS (
  SELECT DISTINCT a.vec_id AS id1, b.vec_id AS id2
  FROM kept a JOIN kept b
    ON a.band = b.band AND a.key = b.key AND a.vec_id < b.vec_id
)
SELECT c.id1, c.id2,
       CAST(bit_count(xor(s1.s, s2.s)) AS INT) AS hamming,
       round(1.0 - ({dotp}) / (({na}) * ({nb})), 6) AS cos_dist
FROM cand c JOIN sig s1 ON s1.vec_id = c.id1 JOIN sig s2 ON s2.vec_id = c.id2
WHERE bit_count(xor(s1.s, s2.s)) <= {max_hamming}
"""


register("embedding_srp_capped", _embedding_srp_capped, _srp_capped_oracle())


# --- winnowing fingerprint pairs -------------------------------------------

def _winnow_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Local-overlap near-dup pairs via winnowing fingerprints
    (operators/dedup.py::winnow_pairs): documents sharing >= 2
    selected k-gram hashes. Detects shared RUNS (>= w+k-1 tokens)
    rather than global set similarity — the plagiarism/quotation case
    the MinHash family misses. Join shuffles only the ~2/(w+1)-sampled
    fingerprints; max_df bounds the hot-fingerprint blowup like the
    LSH bucket caps."""
    docs = load_table(spark, sf_dir, "documents")
    return D.winnow_pairs(
        docs, "doc_id", "text", k=3, w=4, min_shared=2, max_df=50
    )


def _winnow_pairs_oracle() -> str:
    from .text_suite import _WINNOW_FPS_CTE

    return f"""
WITH {_WINNOW_FPS_CTE},
e AS (SELECT DISTINCT doc_id, unnest(fps) AS f FROM fp),
dfc AS (SELECT f, count(*) AS fdf FROM e GROUP BY f),
kept AS (SELECT e.doc_id, e.f FROM e JOIN dfc USING (f) WHERE fdf <= 50)
SELECT a.doc_id AS id1, b.doc_id AS id2, count(*) AS shared_fps
FROM kept a JOIN kept b ON a.f = b.f AND a.doc_id < b.doc_id
GROUP BY a.doc_id, b.doc_id
HAVING count(*) >= 2
"""


register("dedup_winnow_pairs", _winnow_pairs, _winnow_pairs_oracle())


def _winnow_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Local-overlap dedup end to end: winnowing-fingerprint pairs
    (>= 2 shared fingerprints, df-capped) -> large/small-star connected
    components -> min-id keeper per cluster. The pipeline a shared-
    boilerplate/quotation dedup pass runs where whole-document MinHash
    under-scores partial copies; every stage is the linear scale shape
    (sampled fingerprints, capped join, O(log d) CC rounds)."""
    from ..operators.graph import dedup_clusters

    docs = load_table(spark, sf_dir, "documents")
    edges = D.winnow_pairs(
        docs, "doc_id", "text", k=3, w=4, min_shared=2, max_df=50
    ).select("id1", "id2")
    return dedup_clusters(docs, edges).select("doc_id", "cluster", "is_keeper")


def _winnow_clusters_oracle() -> str:
    from .text_suite import _WINNOW_FPS_CTE

    return f"""
WITH RECURSIVE {_WINNOW_FPS_CTE},
e AS (SELECT DISTINCT doc_id, unnest(fps) AS f FROM fp),
dfc AS (SELECT f, count(*) AS fdf FROM e GROUP BY f),
kept AS (SELECT e.doc_id, e.f FROM e JOIN dfc USING (f) WHERE fdf <= 50),
pairs AS (
  SELECT a.doc_id AS id1, b.doc_id AS id2
  FROM kept a JOIN kept b ON a.f = b.f AND a.doc_id < b.doc_id
  GROUP BY a.doc_id, b.doc_id
  HAVING count(*) >= 2
),
edges AS (
  SELECT id1 AS a, id2 AS b FROM pairs UNION ALL SELECT id2, id1 FROM pairs
),
reach(node, r) AS (
  SELECT DISTINCT a, a FROM edges
  UNION
  SELECT reach.node, e2.b FROM reach JOIN edges e2 ON e2.a = reach.r
),
comp AS (
  SELECT node, min(r) AS component FROM reach GROUP BY node
)
SELECT d.doc_id,
       coalesce(c.component, d.doc_id) AS cluster,
       d.doc_id = coalesce(c.component, d.doc_id) AS is_keeper
FROM documents d LEFT JOIN comp c ON c.node = d.doc_id
"""


register("dedup_winnow_clusters", _winnow_clusters, _winnow_clusters_oracle())


def _lsh_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Measured LSH quality, not guessed: precision/recall of the
    MinHash-LSH candidate set (est agreement >= 0.5) against the TRUE
    3-gram-jaccard >= 0.5 pair set, as one row of exact counts +
    ratios. The evaluation harness a corpus owner runs on a sample
    before trusting banding parameters at 100 TB — both sides of the
    comparison are already exact-oracled queries, so the metrics
    themselves get an exact oracle too. The truth side is the
    all-pairs baseline: run on samples, not corpora (quarantined with
    the other quadratic baselines in the breadth runner)."""
    docs = load_table(spark, sf_dir, "documents")
    # cached: each side feeds both its own count and the hit join —
    # without the cache the quadratic truth join and the minhash
    # pipeline execute twice per run (Spark does not CSE across
    # DataFrame reuse)
    cands = (
        D.minhash_dedup_candidates(docs, num_hashes=32, bands=8, ngram=3)
        .filter(F.col("est_jaccard") >= 0.5)
        .select("id1", "id2")
        .cache()
    )
    truth = (
        D.jaccard_pairs(docs, ngram=3, threshold=0.5)
        .select("id1", "id2")
        .cache()
    )
    hit = cands.join(truth, ["id1", "id2"])
    n_c = cands.agg(F.count(F.lit(1)).alias("n_cand"))
    n_t = truth.agg(F.count(F.lit(1)).alias("n_truth"))
    n_h = hit.agg(F.count(F.lit(1)).alias("n_hit"))
    return (
        n_c.join(n_t).join(n_h)
        .select(
            "n_cand", "n_truth", "n_hit",
            F.round(F.col("n_hit") / F.col("n_cand"), 6).alias("precision_v"),
            F.round(F.col("n_hit") / F.col("n_truth"), 6).alias("recall_v"),
        )
    )


def _lsh_quality_oracle() -> str:
    return f"""
WITH {_minhash_cte(32, 8)},
cand50 AS (SELECT id1, id2 FROM pairs WHERE est >= 0.5),
tr_s AS (
  SELECT doc_id,
         list_distinct(list_transform(range(1, len(w) - 1),
           i -> concat_ws(' ', w[i], w[i+1], w[i+2]))) AS toks
  FROM (SELECT doc_id, string_split(text, ' ') AS w FROM documents)
),
tr_p AS (
  SELECT a.doc_id AS id1, b.doc_id AS id2
  FROM tr_s a JOIN tr_s b ON a.doc_id < b.doc_id
  WHERE len(list_intersect(a.toks, b.toks))::DOUBLE
        / (len(a.toks) + len(b.toks) - len(list_intersect(a.toks, b.toks)))
        >= 0.5
),
qc AS (SELECT count(*) AS n_cand FROM cand50),
qt AS (SELECT count(*) AS n_truth FROM tr_p),
qh AS (SELECT count(*) AS n_hit FROM cand50 JOIN tr_p USING (id1, id2))
SELECT n_cand, n_truth, n_hit,
       round(n_hit / n_cand, 6) AS precision_v,
       round(n_hit / n_truth, 6) AS recall_v
FROM qc CROSS JOIN qt CROSS JOIN qh
"""


register(
    "dedup_lsh_quality",
    _lsh_quality,
    _lsh_quality_oracle(),
    quadratic_baseline="truth side is the all-pairs exact-jaccard "
    "baseline - the evaluation harness runs on samples, not corpora",
)
