"""Text-analysis queries over ``documents`` (north-star text ops)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions import text as T
from ..sources import load_table
from . import register

# DuckDB fragments mirroring functions/text.py exactly
_TOKS = "string_split(text, ' ')"
_NTOK = f"len({_TOKS})"
_NUNIQ = f"len(list_distinct({_TOKS}))"
_MEANLEN = f"(list_sum(list_transform({_TOKS}, t -> length(t)))::DOUBLE / {_NTOK})"
_PUNCT = (
    "((length(text) - length(regexp_replace(text, '[^\\w\\s]', '', 'g')))::DOUBLE"
    " / length(text))"
)
_UNIQR = f"({_NUNIQ}::DOUBLE / {_NTOK})"
_QUALITY = (
    f"(0.5 * {_UNIQR} + 0.3 * least({_NTOK}::DOUBLE / 64.0, 1.0)"
    f" + 0.2 * (1.0 - {_PUNCT}))"
)


def _text_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        "lang",
        T.token_count("text").alias("n_tokens"),
        F.size(F.array_distinct(T.tokens("text"))).cast("long").alias("n_uniq"),
        F.round(T.uniq_token_ratio("text"), 6).alias("uniq_ratio"),
        F.round(T.mean_token_len("text"), 6).alias("mean_tok_len"),
        F.round(T.quality_score("text"), 6).alias("quality"),
    )


register(
    "text_stats_docs",
    _text_stats,
    f"""
SELECT doc_id, lang,
       CAST({_NTOK} AS BIGINT) AS n_tokens,
       CAST({_NUNIQ} AS BIGINT) AS n_uniq,
       round({_UNIQR}, 6) AS uniq_ratio,
       round({_MEANLEN}, 6) AS mean_tok_len,
       round({_QUALITY}, 6) AS quality
FROM documents
""",
)


def _token_tf(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.select(F.explode(T.tokens("text")).alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy(F.col("cnt").desc(), F.col("token").asc())
        .limit(20)
    )


register(
    "token_tf_top20",
    _token_tf,
    f"""
SELECT token, count(*) AS cnt
FROM (SELECT unnest({_TOKS}) AS token FROM documents)
GROUP BY token ORDER BY cnt DESC, token ASC LIMIT 20
""",
)


def _lang_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.withColumn("n_tokens", T.token_count("text"))
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").alias("total_chars"),
            F.sum("n_tokens").alias("total_tokens"),
        )
        .withColumn(
            "avg_tokens",
            F.round(F.col("total_tokens") / F.col("n_docs"), 6),
        )
    )


register(
    "lang_stats",
    _lang_stats,
    f"""
SELECT lang, count(*) AS n_docs, CAST(SUM(n_chars) AS BIGINT) AS total_chars,
       CAST(SUM(CAST({_NTOK} AS BIGINT)) AS BIGINT) AS total_tokens,
       round(SUM(CAST({_NTOK} AS BIGINT)) / count(*), 6) AS avg_tokens
FROM documents GROUP BY lang
""",
)


def _lang_guess(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id", "lang", T.lang_guess("text").alias("guessed")
    )


def _lang_guess_oracle() -> str:
    langs = sorted(T.LANG_MARKERS)
    score_cols = []
    for lang in langs:
        markers = ", ".join(f"'{w}'" for w in T.LANG_MARKERS[lang])
        score_cols.append(
            f"len(list_filter({_TOKS}, t -> list_contains([{markers}], t))) AS s_{lang}"
        )
    mx = "greatest(" + ", ".join(f"s_{lang}" for lang in langs) + ")"
    # first lang (sorted order) reaching the max wins == the fold in
    # functions/text.py::lang_guess (later langs replace only if strictly greater)
    whens = " ".join(f"WHEN s_{lang} = {mx} THEN '{lang}'" for lang in langs)
    return f"""
SELECT doc_id, lang,
       CASE WHEN {mx} = 0 THEN 'und' {whens} END AS guessed
FROM (SELECT doc_id, lang, text, {', '.join(score_cols)} FROM documents)
"""


register("lang_guess_docs", _lang_guess, _lang_guess_oracle())


def _fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return docs.select("doc_id", T.content_md5("text").alias("fp_md5"))


register(
    "doc_fingerprint_md5",
    _fingerprint,
    r"""
SELECT doc_id,
       md5(regexp_replace(trim(lower(text)), '\s+', ' ', 'g')) AS fp_md5
FROM documents
""",
)


def _rolling_fp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-level polynomial rolling hash — per-token values are
    md5-derived, so the whole fold is exactly reproducible in DuckDB
    (nibble Horner over the hex digest + list_reduce)."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.select("doc_id", T.rolling_hash("text").alias("fp_rolling"))


def _rolling_fp_oracle() -> str:
    # first 8 md5 hex digits as an int via Horner nibble lookup —
    # bit-identical to Spark's conv(substring(md5(t), 1, 8), 16, 10)
    nib = lambda p: (  # noqa: E731
        f"(strpos('0123456789abcdef', substr(md5(t), {p}, 1)) - 1)"
    )
    val = nib(1)
    for i in range(2, 9):
        val = f"({val} * 16 + {nib(i)})"
    return f"""
WITH w AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
v AS (SELECT doc_id,
             list_transform(toks, t -> {val} % 2147483647) AS vals FROM w)
SELECT doc_id,
       CAST(list_reduce(list_prepend(CAST(0 AS BIGINT), vals),
            (acc, x) -> (acc * 131 + x) % 2147483647) AS BIGINT) AS fp_rolling
FROM v
"""


register("doc_fingerprint_rolling", _rolling_fp, _rolling_fp_oracle())


def _md5_horner(var: str) -> str:
    """DuckDB expression for the first 8 md5 hex digits of ``var`` as
    an integer — nibble Horner over the digest, bit-identical to
    Spark's ``conv(substring(md5(x), 1, 8), 16, 10)``."""
    nib = lambda p: (  # noqa: E731
        f"(strpos('0123456789abcdef', substr(md5({var}), {p}, 1)) - 1)"
    )
    val = nib(1)
    for i in range(2, 9):
        val = f"({val} * 16 + {nib(i)})"
    return val


# (k=3, w=4) winnowing in DuckDB: k-grams -> md5-derived gram hashes ->
# min of each 4-wide window -> sorted distinct. Mirrors
# functions/text.py::winnow_fingerprints branch for branch.
_WINNOW_FPS_CTE = f"""
g AS (
  SELECT doc_id, list_transform(range(1, len(w) - 1),
           i -> concat_ws(' ', w[i], w[i+1], w[i+2])) AS grams
  FROM (SELECT doc_id, string_split(text, ' ') AS w FROM documents)
), h AS (
  SELECT doc_id,
         list_transform(grams, t -> {_md5_horner('t')} % 2147483647) AS hs
  FROM g
), fp AS (
  SELECT doc_id,
         CASE WHEN len(hs) = 0 THEN []::BIGINT[]
              WHEN len(hs) < 4 THEN [list_min(hs)]
              ELSE list_sort(list_distinct(list_transform(
                     range(1, len(hs) - 2), i -> list_min(hs[i:i+3]))))
         END AS fps
  FROM h
)"""


def _winnow_fps(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        T.winnow_fingerprints("text").alias("fps"),
    ).withColumn("n_fps", F.size("fps").cast("long"))


register(
    "doc_winnow_fingerprints",
    _winnow_fps,
    f"""
WITH {_WINNOW_FPS_CTE}
SELECT doc_id, fps, CAST(len(fps) AS BIGINT) AS n_fps FROM fp
""",
)


# BM25 query terms — literal in query and oracle alike.
_BM25_TERMS = ("vector", "hash", "broadcast", "shuffle")
_BM25_K1, _BM25_B = 1.2, 0.75


def _bm25(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Okapi BM25 scores for a fixed term set, top 20 documents.

    Scale shape: the exploded-token stream is filtered to the query
    terms BEFORE the (doc_id, term) shuffle — at 100 TB only postings
    for |Q| terms move, not the corpus vocabulary. df and the corpus
    stats are broadcast back. Per-term contributions are quantized to
    integer micro-units before the per-doc sum so the result is
    independent of summation order (engine-portable like _q6).
    """
    docs = load_table(spark, sf_dir, "documents")
    dl = docs.select("doc_id", T.token_count("text").alias("dl"))
    stats = dl.agg(
        F.count(F.lit(1)).alias("n_docs"), F.avg("dl").alias("avgdl")
    )
    tf = (
        docs.select("doc_id", F.explode(T.tokens("text")).alias("term"))
        .filter(F.col("term").isin(*_BM25_TERMS))
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    dfc = tf.groupBy("term").agg(F.countDistinct("doc_id").alias("df"))
    idf = F.log(
        F.lit(1.0)
        + (F.col("n_docs") - F.col("df") + F.lit(0.5)) / (F.col("df") + F.lit(0.5))
    )
    denom = F.col("tf") + F.lit(_BM25_K1) * (
        F.lit(0.25) + F.lit(_BM25_B) * F.col("dl") / F.col("avgdl")
    )
    comp = (
        tf.join(F.broadcast(dfc), "term")
        .join(dl, "doc_id")
        .join(F.broadcast(stats))
        .withColumn(
            "cu",
            F.floor(
                idf * (F.col("tf") * F.lit(2.2)) / denom * F.lit(1e6)
            ).cast("long"),
        )
    )
    return (
        comp.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_terms"),
            (F.sum("cu") / F.lit(1e6)).alias("bm25"),
        )
        .orderBy(F.col("bm25").desc(), F.col("doc_id").asc())
        .limit(20)
    )


register(
    "bm25_top_docs",
    _bm25,
    f"""
WITH dl AS (
  SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS dl
  FROM documents
), s AS (
  SELECT count(*) AS n_docs, avg(dl) AS avgdl FROM dl
), tf AS (
  SELECT doc_id, term, count(*) AS tf
  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents)
  WHERE term IN ({', '.join(repr(t) for t in _BM25_TERMS)})
  GROUP BY doc_id, term
), dfc AS (
  SELECT term, count(DISTINCT doc_id) AS df FROM tf GROUP BY term
), comp AS (
  SELECT tf.doc_id,
         CAST(floor(
           ln(1.0 + (s.n_docs - dfc.df + 0.5) / (dfc.df + 0.5))
           * (tf.tf * 2.2)
           / (tf.tf + 1.2 * (0.25 + 0.75 * dl.dl / s.avgdl))
           * 1000000.0) AS BIGINT) AS cu
  FROM tf
  JOIN dfc USING (term)
  JOIN dl ON tf.doc_id = dl.doc_id
  CROSS JOIN s
)
SELECT doc_id, count(*) AS n_terms, SUM(cu) / 1000000.0 AS bm25
FROM comp GROUP BY doc_id
ORDER BY bm25 DESC, doc_id ASC LIMIT 20
""",
)


def _bpe_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        T.token_count("text").alias("ws_tokens"),
        F.size(T.bpe_ish_tokens("text")).cast("long").alias("bpe_tokens"),
    )


register(
    "token_count_bpe",
    _bpe_counts,
    f"""
SELECT doc_id, CAST({_NTOK} AS BIGINT) AS ws_tokens,
       CAST(len(list_filter(string_split_regex(
         trim(regexp_replace(text, '([a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\\s])', '\\1 ', 'g')),
         '\\s+'), t -> t <> '')) AS BIGINT) AS bpe_tokens
FROM documents
""",
)


def _pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Concat-and-chunk packing profile (operators/packing.py): global
    token offsets via the DISTRIBUTED two-level prefix sum — the
    single-partition Window.orderBy form this replaces is the classic
    Spark scale trap. Oracle computes the same offsets with a plain
    SQL window cumsum."""
    from ..operators.packing import pack_sequences

    docs = load_table(spark, sf_dir, "documents")
    return pack_sequences(docs, seq_len=512)


register(
    "pack_sequences_512",
    _pack_sequences,
    f"""
WITH sized AS (
  SELECT doc_id, CAST({_NTOK} AS BIGINT) AS n_tokens FROM documents
), packed AS (
  SELECT doc_id, n_tokens,
         COALESCE(SUM(n_tokens) OVER (ORDER BY doc_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS start_offset
  FROM sized
)
SELECT doc_id, n_tokens, CAST(start_offset AS BIGINT) AS start_offset,
       CAST(floor(start_offset / 512) AS BIGINT) AS chunk_id,
       CAST(floor((start_offset + greatest(n_tokens, 1) - 1) / 512)
            - floor(start_offset / 512) + 1 AS BIGINT) AS n_chunks
FROM packed
""",
)
