"""Corpus-level overlap estimation between document groups.

Estimates the Jaccard similarity of the distinct-shingle SETS of two
corpora (e.g. two crawl sources, two dataset versions) from per-group
minhash signatures — the sketch answer to "how much of source B is
already in source A?" that drives mixture design and dataset-version
diffing in training-data pipelines.

Scale shape: the only corpus-sized stages are the distinct
(group, shingle) projection and one groupBy(group, perm) min — both
map-side-combinable, both linear. The signature relation is
|groups| x |perms| rows regardless of corpus size, so the pairwise
comparison (a self-join on the perm index) is effectively free: at
100 TB with thousands of sources it is a few-MB broadcast join.

Hashes are md5(perm || ':' || shingle) so the estimator replays
verbatim in DuckDB (min over strings is lexicographic in both
engines); production would use xxhash64(shingle, seed=perm).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions import text as T

__all__ = ["group_minhash_signatures", "pairwise_group_overlap"]


def group_minhash_signatures(
    docs: DataFrame,
    n_perms: int = 16,
    ngram: int = 3,
    group_col: str = "source",
    text_col: str = "text",
) -> DataFrame:
    """Per-group minhash signature rows: (group_col, p, sig) for
    p = 0..n_perms-1, where sig = min over the group's DISTINCT word
    ``ngram``-shingles of md5(p || ':' || shingle)."""
    if n_perms < 1:
        raise ValueError("n_perms must be >= 1")
    if not docs.isStreaming:
        # scan-parallelism fix (see dedup.minhash_signatures): the
        # n-gram shingle explode and the n_perms-way hash expansion
        # otherwise run on a single-row-group scan's ONE task (no-op
        # at any real corpus scale)
        from ..sources import fan_out

        docs = fan_out(docs)
    grams = (
        docs.select(
            group_col, F.explode(T.word_ngrams(text_col, ngram)).alias("g")
        )
        .distinct()
    )
    withp = grams.select(
        group_col,
        F.explode(F.sequence(F.lit(0), F.lit(n_perms - 1))).alias("p"),
        "g",
    ).withColumn(
        "h", F.md5(F.concat_ws(":", F.col("p").cast("string"), F.col("g")))
    )
    return withp.groupBy(group_col, "p").agg(F.min("h").alias("sig"))


def pairwise_group_overlap(
    docs: DataFrame,
    n_perms: int = 16,
    ngram: int = 3,
    group_col: str = "source",
    text_col: str = "text",
) -> DataFrame:
    """Estimated Jaccard between every unordered pair of groups:
    (group_a, group_b, matches, est_jaccard) with group_a < group_b.
    est_jaccard = fraction of matching signature components; standard
    minhash estimator with std error ~ 1/sqrt(n_perms)."""
    sigs = group_minhash_signatures(
        docs, n_perms=n_perms, ngram=ngram,
        group_col=group_col, text_col=text_col,
    )
    a = sigs.select(
        F.col(group_col).alias("group_a"), "p", F.col("sig").alias("sig_a")
    )
    b = sigs.select(
        F.col(group_col).alias("group_b"), "p", F.col("sig").alias("sig_b")
    )
    pairs = a.join(
        b, (a.p == b.p) & (F.col("group_a") < F.col("group_b"))
    )
    return pairs.groupBy("group_a", "group_b").agg(
        F.sum((F.col("sig_a") == F.col("sig_b")).cast("long"))
        .cast("long")
        .alias("matches"),
        F.round(
            F.sum((F.col("sig_a") == F.col("sig_b")).cast("long"))
            / F.lit(float(n_perms)),
            6,
        ).alias("est_jaccard"),
    )
