"""Training-data curation, part 2: PII redaction, deterministic
weighted mixture sampling, benchmark-contamination detection, and
corpus-level stopword discovery.

These are the pipeline steps between "raw corpus" and "training set"
that the north star calls for beyond dedup: scrub, mix, decontaminate,
and derive corpus statistics. All four are pure built-in expressions
(no Python UDFs) with exact DuckDB oracles.

Scale notes (100 TB story):
- PII redaction and hash sampling are embarrassingly parallel
  map-only ops — no shuffle at all; the sampling decision is a pure
  function of (salt, doc_id) so it is reproducible across reruns and
  engines, unlike rand()-based sampling.
- Contamination is an inverted-index join on distinct n-grams: the
  shuffle key is the n-gram, test-side is tiny (the benchmark set) and
  broadcastable at real scale; the HAVING >= 2 cut runs after a
  per-pair count, which AQE handles with a partial aggregate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions import text as T
from ..sources import load_table
from . import register

# --- PII redaction ----------------------------------------------------------

_EMAIL_RE = "[a-z0-9._]+@[a-z0-9.]+"
_PHONE_RE = "[0-9]{3}-[0-9]{4}"


def _pii_redact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scrub emails/phone-shaped spans. The fixture text is synthetic
    words, so each doc gets a deterministic synthetic contact line
    appended first — the redaction path itself (regex count + global
    replace) is the op under test."""
    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 100)
    contact = F.concat(
        F.col("text"),
        F.lit(" contact user"),
        F.col("doc_id").cast("string"),
        F.lit("@example.com or 555-"),
        F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0"),
    )
    with_pii = docs.select("doc_id", contact.alias("t"))
    redacted = F.regexp_replace(
        F.regexp_replace(F.col("t"), _EMAIL_RE, "<EMAIL>"),
        _PHONE_RE,
        "<PHONE>",
    )
    return with_pii.select(
        "doc_id",
        F.regexp_count(F.col("t"), F.lit(_EMAIL_RE)).cast("long").alias("n_emails"),
        F.regexp_count(F.col("t"), F.lit(_PHONE_RE)).cast("long").alias("n_phones"),
        F.md5(redacted).alias("redacted_md5"),
    )


register(
    "curation_pii_redact",
    _pii_redact,
    f"""
WITH aug AS (
  SELECT doc_id,
         text || ' contact user' || CAST(doc_id AS VARCHAR)
              || '@example.com or 555-'
              || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') AS t
  FROM documents WHERE doc_id < 100
)
SELECT doc_id,
       len(regexp_extract_all(t, '{_EMAIL_RE}')) AS n_emails,
       len(regexp_extract_all(t, '{_PHONE_RE}')) AS n_phones,
       md5(regexp_replace(regexp_replace(t, '{_EMAIL_RE}', '<EMAIL>', 'g'),
                          '{_PHONE_RE}', '<PHONE>', 'g')) AS redacted_md5
FROM aug
""",
)


# --- deterministic weighted mixture sampling --------------------------------

# per-source sampling rate as a hex threshold on the first 4 md5 hex
# digits of a salted doc key: '8000'/65536 = 50%, '4000' = 25%,
# '0800' ~ 3%. Content-independent, seed-stable, engine-portable.
_RATE_HIGH = "8000"  # sources src0..src4: oversample
_RATE_MID = "4000"  # src5..src9
_RATE_LOW = "0800"  # the long tail


def _mixture_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted dataset mixing: each source keeps a deterministic
    hash-fraction of its docs (the 'data mixture' step of a pretraining
    recipe, reproducible across engines/reruns unlike rand())."""
    docs = load_table(spark, sf_dir, "documents")
    src_num = F.regexp_extract(F.col("source"), "([0-9]+)$", 1).cast("long")
    thr = (
        F.when(src_num <= 4, F.lit(_RATE_HIGH))
        .when(src_num <= 9, F.lit(_RATE_MID))
        .otherwise(F.lit(_RATE_LOW))
    )
    key = F.substring(
        F.md5(F.concat(F.lit("mix:"), F.col("doc_id").cast("string"))), 1, 4
    )
    return (
        docs.filter(key < thr)
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_sampled"),
            F.sum(T.token_count("text")).alias("sum_tokens"),
        )
    )


register(
    "curation_mixture_sample",
    _mixture_sample,
    f"""
WITH rated AS (
  SELECT *,
         CASE WHEN CAST(regexp_extract(source, '([0-9]+)$', 1) AS BIGINT) <= 4
                THEN '{_RATE_HIGH}'
              WHEN CAST(regexp_extract(source, '([0-9]+)$', 1) AS BIGINT) <= 9
                THEN '{_RATE_MID}'
              ELSE '{_RATE_LOW}' END AS thr
  FROM documents
)
SELECT source, count(*) AS n_sampled,
       CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS sum_tokens
FROM rated
WHERE substr(md5('mix:' || CAST(doc_id AS VARCHAR)), 1, 4) < thr
GROUP BY source
""",
)


# --- benchmark contamination (train/test n-gram overlap) --------------------

_NGRAM_N = 8
_MIN_SHARED = 2
_TEST_CUT = 50  # doc_id < 50 plays the held-out benchmark set


def _contamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decontamination scan: train docs sharing >= 2 distinct word
    8-grams with any test doc. Inverted-index join on the n-gram;
    distinct-per-doc first so a repeated phrase inside one doc doesn't
    inflate the overlap count."""
    # fan_out: the 8-gram shingle explode over the train side is the
    # dominant per-row cost; a single-file corpus scans as one task
    # (guide §2.5; no-op at scale)
    docs = load_table(spark, sf_dir, "documents", fan_out=True)
    grams = docs.select(
        "doc_id",
        F.explode(F.array_distinct(T.word_ngrams("text", _NGRAM_N))).alias("ng"),
    )
    test = grams.filter(F.col("doc_id") < _TEST_CUT).select(
        F.col("doc_id").alias("test_doc"), "ng"
    )
    train = grams.filter(F.col("doc_id") >= _TEST_CUT).select(
        F.col("doc_id").alias("train_doc"), "ng"
    )
    return (
        train.join(F.broadcast(test), "ng")
        .groupBy("train_doc", "test_doc")
        .agg(F.count(F.lit(1)).alias("shared"))
        .filter(F.col("shared") >= _MIN_SHARED)
    )


register(
    "curation_contamination",
    _contamination,
    f"""
WITH g AS (
  SELECT doc_id, ng FROM (
    SELECT doc_id,
           unnest(list_distinct(
             [array_to_string(w[i:i + {_NGRAM_N} - 1], ' ')
              FOR i IN range(1, greatest(len(w) - {_NGRAM_N} + 1, 0) + 1)]
           )) AS ng
    FROM (SELECT doc_id, string_split(text, ' ') AS w FROM documents)
  )
)
SELECT a.doc_id AS train_doc, b.doc_id AS test_doc, count(*) AS shared
FROM g a JOIN g b USING (ng)
WHERE a.doc_id >= {_TEST_CUT} AND b.doc_id < {_TEST_CUT}
GROUP BY 1, 2
HAVING count(*) >= {_MIN_SHARED}
""",
)


# --- corpus-level stopword discovery ----------------------------------------

_DF_RATIO_CUT = 0.6


def _stopwords(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Terms present in > 60% of documents — the corpus-derived
    stopword list that feeds quality scoring. Distinct terms per doc,
    then one count per term: a two-level aggregate with map-side
    partials, no data ever leaves the JVM."""
    docs = load_table(spark, sf_dir, "documents")
    n_docs = docs.select(F.count(F.lit(1)).alias("n"))
    df_counts = (
        docs.select(
            "doc_id", F.explode(F.array_distinct(T.tokens("text"))).alias("term")
        )
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("df"))
    )
    return (
        df_counts.join(F.broadcast(n_docs))
        .withColumn("df_ratio", F.round(F.col("df") / F.col("n"), 6))
        .filter(F.col("df_ratio") > _DF_RATIO_CUT)
        .select("term", "df", "df_ratio")
    )


register(
    "curation_stopword_discovery",
    _stopwords,
    f"""
WITH dfc AS (
  SELECT term, count(*) AS df FROM (
    SELECT DISTINCT doc_id, unnest(string_split(text, ' ')) AS term
    FROM documents
  ) GROUP BY term
), n AS (SELECT count(*) AS n FROM documents)
SELECT term, df, round(df / n, 6) AS df_ratio
FROM dfc CROSS JOIN n
WHERE round(df / n, 6) > {_DF_RATIO_CUT}
""",
)


# --- int8 scalar quantization of embeddings ---------------------------------

def _int8_quant(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-dimension int8 scalar quantization (the embedding
    compression step before ANN serving: 4x smaller than float32,
    8x smaller than double). Two passes over a posexploded view —
    per-dim min/max, then codes + reconstruction error — all exact
    IEEE arithmetic, so the oracle hash-matches bit-for-bit.

    At scale: the explode is map-side; the stats agg shuffles 64 rows
    per partition (partial min/max); codes never materialize driver-side.
    """
    emb = load_table(spark, sf_dir, "embeddings")
    d = emb.select(
        "vec_id", F.posexplode(F.col("embedding").cast("array<double>")).alias("i", "x")
    )
    stats = d.groupBy("i").agg(F.min("x").alias("lo"), F.max("x").alias("hi"))
    coded = (
        d.join(F.broadcast(stats), "i")
        .withColumn(
            "code",
            F.least(
                F.greatest(
                    F.floor((F.col("x") - F.col("lo")) / (F.col("hi") - F.col("lo")) * 255.0),
                    F.lit(0),
                ),
                F.lit(255),
            ).cast("long"),
        )
        .withColumn(
            "recon",
            F.col("lo") + (F.col("code") + 0.5) * (F.col("hi") - F.col("lo")) / 256.0,
        )
    )
    return coded.groupBy("i").agg(
        F.round(F.min("lo"), 6).alias("lo"),
        F.round(F.max("hi"), 6).alias("hi"),
        F.round(F.max(F.abs(F.col("x") - F.col("recon"))), 6).alias("max_abs_err"),
        F.countDistinct("code").alias("n_codes"),
    ).withColumn("i", F.col("i").cast("long"))


register(
    "embedding_int8_quantization",
    _int8_quant,
    """
WITH d AS (
  SELECT vec_id, t.i, CAST(t.x AS DOUBLE) AS x FROM embeddings,
  LATERAL (SELECT unnest(embedding) AS x,
                  unnest(range(0, len(embedding))) AS i) t
), s AS (
  SELECT i, min(x) AS lo, max(x) AS hi FROM d GROUP BY i
), coded AS (
  SELECT d.i, d.x, s.lo, s.hi,
         CAST(least(greatest(floor((d.x - s.lo) / (s.hi - s.lo) * 255.0), 0), 255) AS BIGINT) AS code
  FROM d JOIN s USING (i)
)
SELECT i, round(min(lo), 6) AS lo, round(max(hi), 6) AS hi,
       round(max(abs(x - (lo + (code + 0.5) * (hi - lo) / 256.0))), 6) AS max_abs_err,
       count(DISTINCT code) AS n_codes
FROM coded GROUP BY i
""",
)


# --- per-label embedding centroids (exact, element-wise) --------------------

def _label_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Element-wise mean embedding per label — the centroid/pooling
    primitive behind IVF training, class prototypes, and chunk→doc
    mean pooling, computed EXACTLY: posexplode to (label, dim) cells,
    quantized BIGINT sum per cell, divide by count. Map-side partial
    aggregation shuffles one row per (label, dim), never the vectors.
    """
    from .relational_suite import _dsum

    emb = load_table(spark, sf_dir, "embeddings")
    d = emb.select(
        "label", F.posexplode(F.col("embedding").cast("array<double>")).alias("i", "x")
    )
    return (
        d.groupBy("label", F.col("i").cast("long").alias("i"))
        .agg(
            _dsum(F.col("x"), 9).alias("sx"),
            F.count(F.lit(1)).alias("n"),
        )
        .select(
            "label",
            "i",
            F.round(F.col("sx") / F.col("n"), 6).alias("centroid"),
            "n",
        )
    )


register(
    "embedding_label_centroids",
    _label_centroids,
    """
WITH d AS (
  SELECT label, t.i, CAST(t.x AS DOUBLE) AS x FROM embeddings,
  LATERAL (SELECT unnest(embedding) AS x,
                  unnest(range(0, len(embedding))) AS i) t
)
SELECT label, i,
       round((CAST(SUM(CAST(floor(x * 1000000000.0) AS BIGINT)) AS DOUBLE)
              / 1000000000.0) / count(*), 6) AS centroid,
       count(*) AS n
FROM d GROUP BY label, i
""",
)


# --- event funnel (view -> click -> purchase) -------------------------------

def _funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered conversion funnel over the event stream: per user the
    earliest view/click/purchase, then how many users completed each
    prefix IN ORDER. One shuffle on user_id (conditional min), then a
    single-row reduce; timestamps compared as epoch micros on both
    engines (events.parquet is nanos — see sources/tables.py)."""
    ev = load_table(spark, sf_dir, "events")
    us = F.unix_micros(F.col("ts"))
    per_user = ev.groupBy("user_id").agg(
        F.min(F.when(F.col("event_type") == "view", us)).alias("t_view"),
        F.min(F.when(F.col("event_type") == "click", us)).alias("t_click"),
        F.min(F.when(F.col("event_type") == "purchase", us)).alias("t_buy"),
    )
    return per_user.agg(
        F.count(F.col("t_view")).alias("n_view"),
        F.count(F.when(F.col("t_view") < F.col("t_click"), 1)).alias("n_view_click"),
        F.count(
            F.when(
                (F.col("t_view") < F.col("t_click"))
                & (F.col("t_click") < F.col("t_buy")),
                1,
            )
        ).alias("n_full_funnel"),
    )


register(
    "event_funnel",
    _funnel,
    """
WITH per_user AS (
  SELECT user_id,
         min(CASE WHEN event_type = 'view' THEN epoch_us(ts) END) AS t_view,
         min(CASE WHEN event_type = 'click' THEN epoch_us(ts) END) AS t_click,
         min(CASE WHEN event_type = 'purchase' THEN epoch_us(ts) END) AS t_buy
  FROM events GROUP BY user_id
)
SELECT count(t_view) AS n_view,
       count(CASE WHEN t_view < t_click THEN 1 END) AS n_view_click,
       count(CASE WHEN t_view < t_click AND t_click < t_buy THEN 1 END)
         AS n_full_funnel
FROM per_user
""",
)


# --- compression-ratio quality signal (rows-only: zlib not in SQL) ----------

def _compression_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """zlib compression ratio per document — the classic cheap
    repetition/quality proxy for pretraining corpora (highly
    repetitive or templated text compresses far below prose).
    Arrow-batched scalar pandas_udf (zlib is per-row Python, but the
    transfer is columnar); deterministic, so rows-only is backed by a
    pytest invariant instead of a SQL oracle.
    """
    import pandas as pd
    from pyspark.sql.functions import PandasUDFType, pandas_udf

    @pandas_udf("double", PandasUDFType.SCALAR)
    def comp_ratio(texts: pd.Series) -> pd.Series:
        import zlib

        def ratio(t: str) -> float:
            raw = (t or "").encode("utf-8")
            if not raw:
                return 1.0
            return round(len(zlib.compress(raw, 6)) / len(raw), 6)

        return texts.map(ratio)

    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.select(
            "doc_id",
            "source",
            comp_ratio(F.col("text")).alias("comp_ratio"),
            F.length("text").cast("long").alias("n_chars"),
        )
        .filter(F.col("doc_id") < 200)
    )


register("curation_compression_ratio", _compression_ratio)


def _build_compression_oracle() -> str | None:
    """Exact oracle for the compression query (VERDICT r6 item 7):
    no SQL engine has a zlib expression, so cross-engine recompute is
    impossible — instead the EXPECTED ratios are computed once here
    with the pinned codec (CPython zlib, level 6 — the identical call
    the executors make) over the sf0.01 fixture and embedded as a
    VALUES literal the oracle joins against. What the match then
    verifies end to end: the distributed pipeline (Arrow batching,
    pandas_udf wiring, utf-8 encode, rounding) reproduces the pinned
    local recompute bit-for-bit, plus the real SQL-side columns
    (source, n_chars). Library determinism itself is pytest-pinned
    against literal byte counts in tests/test_curation.py."""
    import zlib

    try:
        import duckdb

        con = duckdb.connect()
        rows = con.execute(
            "SELECT doc_id, text FROM "
            "'/root/testdata/sf0.01/documents.parquet' "
            "WHERE doc_id < 200 ORDER BY doc_id"
        ).fetchall()
        con.close()
    except Exception:  # fixture absent: keep rows-only
        return None
    if not rows:
        return None

    def ratio(t: str) -> float:
        raw = (t or "").encode("utf-8")
        if not raw:
            return 1.0
        return round(len(zlib.compress(raw, 6)) / len(raw), 6)

    vals = ", ".join(f"({int(d)}, {ratio(t)!r})" for d, t in rows)
    return f"""
WITH expected_raw(doc_id, r) AS (VALUES {vals}),
expected AS (
  SELECT doc_id, CAST(r AS DOUBLE) AS comp_ratio FROM expected_raw
)
SELECT d.doc_id, d.source, e.comp_ratio,
       length(d.text) AS n_chars
FROM documents d JOIN expected e USING (doc_id)
WHERE d.doc_id < 200
"""


register(
    "curation_compression_ratio_pinned",
    _compression_ratio,
    _build_compression_oracle(),
)


# --- unigram LM quality score (perplexity-style filtering) ------------------

def _unigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bits-per-token under the corpus's own unigram LM — the
    perplexity-style quality signal of CCNet/Gopher-type pipelines
    (docs full of rare junk score high, fluent-but-generic docs low).

    score(doc) = mean over tokens of -log2 p(tok),
    p(tok) = corpus_count(tok) / corpus_total.

    Determinism: each token's log2(count) is floor-quantized to a 1e-6
    grid and summed as BIGINT, so the cross-row accumulation is exact;
    the only float ops are one log2 per distinct count and the final
    rescale (agg_stats_corr pattern).

    Scale notes: the vocab aggregate and the join back both shuffle on
    the token — at 100 TB you broadcast the top-K vocabulary (covers
    ~all mass) and map the tail to a floor count, turning the join
    map-only. Kept as the exact formulation here because the driver
    oracle demands exactness."""
    docs = load_table(spark, sf_dir, "documents")
    tok_rows = docs.select("doc_id", F.explode(T.tokens("text")).alias("token"))
    vocab = tok_rows.groupBy("token").agg(F.count(F.lit(1)).alias("cnt"))
    totals = tok_rows.agg(F.count(F.lit(1)).alias("total"))
    q = F.floor(F.log2(F.col("cnt")) * 1e6).cast("long")
    per_doc = (
        tok_rows.join(vocab, "token")
        .groupBy("doc_id")
        .agg(F.sum(q).alias("sq"), F.count(F.lit(1)).alias("n_tokens"))
    )
    score = (
        F.log2(F.col("total").cast("double"))
        - (F.col("sq").cast("double") / F.col("n_tokens")) / 1e6
    )
    return per_doc.join(F.broadcast(totals)).select(
        "doc_id", "n_tokens", F.round(score, 4).alias("bits_per_token")
    )


register(
    "curation_unigram_logprob",
    _unigram_logprob,
    """
WITH tok AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents
),
vocab AS (SELECT token, count(*) AS cnt FROM tok GROUP BY token),
tot AS (SELECT count(*) AS total FROM tok),
pd AS (
  SELECT doc_id,
         SUM(CAST(floor(log2(cnt) * 1000000.0) AS BIGINT)) AS sq,
         count(*) AS n_tokens
  FROM tok JOIN vocab USING (token)
  GROUP BY doc_id
)
SELECT doc_id, n_tokens,
       round(log2(CAST(total AS DOUBLE))
             - (CAST(sq AS DOUBLE) / n_tokens) / 1000000.0, 4) AS bits_per_token
FROM pd, tot
""",
)


# --- random projection (Johnson-Lindenstrauss dimensionality reduction) -----

_RP_OUT = 8


def _rp_signs(out_dim: int, in_dim: int) -> list[list[float]]:
    """Deterministic +-1 sign matrix (out_dim x in_dim) from a fixed
    LCG — the Achlioptas sign variant of the JL projection. Baked as
    literals into BOTH the Spark expressions and the oracle SQL, so no
    hash function needs to agree across engines."""
    state = 20260813
    rows = []
    for _ in range(out_dim):
        row = []
        for _ in range(in_dim):
            state = (state * 1103515245 + 12345) % (1 << 31)
            row.append(1.0 if (state >> 16) & 1 else -1.0)
        rows.append(row)
    return rows


def _random_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """64-dim float32 embeddings -> 8-dim via a literal +-1 sign matrix
    scaled by 1/sqrt(64) = 1/8 (exact in binary, so the scale step adds
    no float divergence). Each output component is a literal-folded
    zip_with/aggregate sum — unrolled into whole-stage codegen, no
    Python, no shuffle: the op is map-only at any scale."""
    from ..functions.distance import _fold_sum, vec_lit
    from ..sources import load_table as _lt

    emb = _lt(spark, sf_dir, "embeddings")
    v = F.col("embedding").cast("array<double>")
    signs = _rp_signs(_RP_OUT, 64)
    comps = [
        F.round(
            _fold_sum(F.zip_with(v, vec_lit(signs[j]), lambda x, s: x * s))
            / F.lit(8.0),
            6,
        ).alias(f"rp_{j}")
        for j in range(_RP_OUT)
    ]
    return emb.select("vec_id", *comps)


def _rp_oracle() -> str:
    signs = _rp_signs(_RP_OUT, 64)
    cols = []
    for j in range(_RP_OUT):
        terms = " ".join(
            ("+ " if s > 0 else "- ") + f"vd[{i + 1}]"
            for i, s in enumerate(signs[j])
        ).lstrip("+ ")
        cols.append(f"round(({terms}) / 8.0, 6) AS rp_{j}")
    sel = ",\n       ".join(cols)
    return f"""
WITH v AS (
  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS vd
  FROM embeddings
)
SELECT vec_id,
       {sel}
FROM v
"""


register("embedding_random_projection", _random_projection, _rp_oracle())


# --- temperature-scaled mixture rebalancing (alpha-sampling) ----------------

_ALPHA_BUDGET = 1000  # total docs to draw across sources


def _alpha_rebalance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multilingual-style alpha-sampling (alpha = 0.5): per-source
    quotas proportional to sqrt(source size), flattening the source
    distribution, then a deterministic hash-rank draw inside each
    source. IEEE sqrt is correctly rounded, and the quota math runs on
    floor-quantized BIGINTs (floor(B * q_s / sum q_t)), so quotas are
    engine-exact; the draw ranks on md5(doc_id) — reproducible and
    shuffle-friendly (one window per source, no global sort)."""
    docs = load_table(spark, sf_dir, "documents")
    from pyspark.sql import Window

    counts = docs.groupBy("source").agg(F.count(F.lit(1)).alias("n_docs"))
    q = F.floor(F.sqrt(F.col("n_docs").cast("double")) * 1e6).cast("long")
    weighted = counts.withColumn("q", q)
    total = weighted.agg(F.sum("q").alias("sum_q"))
    quota = (
        weighted.join(F.broadcast(total))
        .withColumn(
            "target",
            F.floor(F.lit(_ALPHA_BUDGET) * F.col("q") / F.col("sum_q")).cast("long"),
        )
        .select("source", "n_docs", "target")
    )
    rn = F.row_number().over(
        Window.partitionBy("source").orderBy(
            F.md5(F.concat(F.lit("draw:"), F.col("doc_id").cast("string"))),
            F.col("doc_id"),
        )
    )
    picked = (
        docs.join(F.broadcast(quota), "source")
        .withColumn("rn", rn)
        .filter(F.col("rn") <= F.col("target"))
    )
    return (
        picked.groupBy("source", "n_docs", "target")
        .agg(
            F.count(F.lit(1)).alias("n_drawn"),
            F.sum(T.token_count("text")).alias("sum_tokens"),
        )
    )


register(
    "curation_alpha_rebalance",
    _alpha_rebalance,
    f"""
WITH counts AS (
  SELECT source, count(*) AS n_docs,
         CAST(floor(sqrt(CAST(count(*) AS DOUBLE)) * 1000000.0) AS BIGINT) AS q
  FROM documents GROUP BY source
),
tot AS (SELECT SUM(q) AS sum_q FROM counts),
quota AS (
  SELECT source, n_docs,
         CAST(floor({_ALPHA_BUDGET} * q / sum_q) AS BIGINT) AS target
  FROM counts, tot
),
ranked AS (
  SELECT d.source, d.doc_id, d.text, quota.n_docs, quota.target,
         row_number() OVER (
           PARTITION BY d.source
           ORDER BY md5('draw:' || CAST(d.doc_id AS VARCHAR)), d.doc_id
         ) AS rn
  FROM documents d JOIN quota USING (source)
)
SELECT source, n_docs, target,
       count(*) AS n_drawn,
       CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS sum_tokens
FROM ranked
WHERE rn <= target
GROUP BY source, n_docs, target
""",
)
