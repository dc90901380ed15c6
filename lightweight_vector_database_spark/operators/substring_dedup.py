"""Exact substring-window deduplication (training-data curation).

The "dedup by exact repeated spans" operator from the training-data
literature (Lee et al. 2022, "Deduplicating Training Data Makes
Language Models Better"): slide a fixed-width token window over every
document, hash each window, and find windows whose hash occurs in two
or more distinct documents — exact repeated spans, the signal used to
cut boilerplate/licence blocks that whole-document or near-dup
hashing misses.

Scale shape: a document with n tokens emits n - w + 1 window hashes
(all derived in one codegen projection — tokenize once, slice + hash
per position; no UDF, no self-join). The only shuffle is the
groupBy(window_hash) duplicate census, which moves (hash, doc_id)
pairs — linear in corpus token count, never quadratic in documents.
At 100 TB you would swap the md5 text hash for xxhash64 (8-byte keys
instead of 32-char strings); md5 is used here because the oracle
replays it verbatim in DuckDB.

The reference has no text surface at all (SURVEY.md §2B) — this is
part of the LLM-pipeline extension mandated alongside it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions import text as T

__all__ = [
    "token_window_hashes",
    "duplicate_window_stats",
    "decontaminate_by_windows",
]


def token_window_hashes(
    docs: DataFrame,
    window: int,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """One row per sliding ``window``-token span: (id_col, pos, whash)
    where pos is the 1-based start token and whash = md5 of the
    space-joined window text. Documents shorter than ``window`` tokens
    emit nothing."""
    if window < 1:
        raise ValueError("window must be >= 1")
    if not docs.isStreaming:
        # scan-parallelism fix (see dedup.minhash_signatures): the
        # window-hash HOF pipeline is interpreted per token and a small
        # single-file corpus runs it on one task (no-op at scale)
        from ..sources import fan_out

        docs = fan_out(docs)
    toks = T.tokens(text_col)
    n = F.size(toks)
    idx = F.when(
        n >= window, F.sequence(F.lit(1), n - (window - 1))
    ).otherwise(F.array().cast("array<int>"))
    wins = F.transform(
        idx, lambda i: F.md5(F.array_join(F.slice(toks, i, window), " "))
    )
    return docs.select(
        id_col, F.posexplode(wins).alias("pos0", "whash")
    ).select(id_col, (F.col("pos0") + 1).alias("pos"), "whash")


def decontaminate_by_windows(
    corpus: DataFrame,
    heldout: DataFrame,
    window: int,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Benchmark decontamination by exact n-token overlap (the GPT-3 /
    Lee-et-al recipe, typically with 13-token windows): flag every
    corpus document sharing at least one ``window``-token span with
    the held-out set.

    Returns (id_col, n_hits, n_windows, hit_ratio) for flagged corpus
    documents — a curation pipeline anti-joins the corpus against
    these ids before training.

    Scale shape: the held-out side reduces to its DISTINCT window
    hashes (eval sets are tiny relative to the corpus, so this
    relation broadcast-joins); the corpus side is one linear
    projection + one aggregation. Nothing is quadratic and the corpus
    text never shuffles.
    """
    held_hashes = (
        token_window_hashes(heldout, window, text_col=text_col, id_col=id_col)
        .select("whash")
        .distinct()
        .withColumn("hit", F.lit(1))
    )
    wins = token_window_hashes(corpus, window, text_col=text_col, id_col=id_col)
    flagged = wins.join(F.broadcast(held_hashes), "whash", "left")
    return (
        flagged.groupBy(id_col)
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_windows"),
            F.coalesce(F.sum("hit"), F.lit(0)).cast("long").alias("n_hits"),
        )
        .filter(F.col("n_hits") > 0)
        .withColumn(
            "hit_ratio", F.round(F.col("n_hits") / F.col("n_windows"), 6)
        )
        .select(id_col, "n_hits", "n_windows", "hit_ratio")
    )


def duplicate_window_stats(
    docs: DataFrame,
    window: int,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-document repeated-span census: (id_col, n_windows,
    n_dup_windows, dup_ratio) for every document with at least one
    window whose hash also appears in ANOTHER document.

    dup_ratio is the fraction of the document's windows that are
    cross-document duplicates — the score a curation pipeline
    thresholds on to drop boilerplate-heavy documents.
    """
    wins = token_window_hashes(docs, window, text_col=text_col, id_col=id_col)
    census = wins.groupBy("whash").agg(
        F.countDistinct(id_col).alias("nd")
    )
    dup = census.filter(F.col("nd") >= 2).select("whash")
    flagged = wins.join(dup.withColumn("is_dup", F.lit(1)), "whash", "left")
    return (
        flagged.groupBy(id_col)
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_windows"),
            F.coalesce(F.sum("is_dup"), F.lit(0))
            .cast("long")
            .alias("n_dup_windows"),
        )
        .filter(F.col("n_dup_windows") > 0)
        .withColumn(
            "dup_ratio",
            F.round(F.col("n_dup_windows") / F.col("n_windows"), 6),
        )
    )
