"""Corpus-trained n-gram language-model scoring (perplexity filtering).

The classic quality-filter in LLM data pipelines (CCNet / Wenzek et
al. 2020 score documents with a KenLM model; Gopher and C4 filter on
the same signal): train a bigram LM with add-k smoothing ON the corpus
itself, then score every document's cross-entropy under that model —
boilerplate and gibberish sit in the tails.

All counting, smoothing, and scoring is built-in-function dataflow
(explode → count → join → avg), no Python in the loop, and the exact
arithmetic replays in ANSI SQL:

    P(w2 | w1) = (C(w1 w2) + k) / (C(w1 ·) + k · V)
    H(doc)     = -mean over doc bigrams of ln P(w2 | w1)

where C(w1 ·) is the context count (bigrams starting with w1) and V
the corpus vocabulary size.

Scale shape: bigram counts are a map-side-combinable groupBy on the
bigram string; scoring joins the doc-bigram stream to the two count
relations on their natural keys (shuffle-hash/SMJ — both sides large
at 100 TB, exactly the shape you want); V is a 1-row broadcast.  Hot
bigrams (stopword pairs) skew the count join's build side, not the
probe groups, so no salting is needed — the groupBy that follows is
keyed by doc.

The reference (513-LoC kd-tree) has no text surface; north-star
pipeline machinery.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..functions.text import tokens, word_ngrams


def bigram_lm_scores(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: float = 0.5,
) -> DataFrame:
    """Per-document bigram cross-entropy under the corpus's own add-k
    bigram model.  Documents with fewer than 2 tokens are excluded
    (they have no bigrams to score).

    Returns ``(id_col, n_bigrams long, cross_entropy double)``;
    lower = more typical of the corpus.
    """
    if not docs.isStreaming:
        # scan-parallelism fix (see dedup.minhash_signatures): the
        # bigram explode chain is evaluated from THREE subtrees (the
        # scoring side and both count aggregates — Catalyst does no CSE
        # across DataFrame reuse) and a small single-file corpus runs
        # each on one task (no-op at scale)
        from ..sources import fan_out

        docs = fan_out(docs)
    bg = (
        docs.select(F.col(id_col), word_ngrams(text_col, 2).alias("g"))
        .select(F.col(id_col), F.explode("g").alias("bg"))
        .withColumn("w1", F.split(F.col("bg"), " ")[0])
    )
    bg_counts = bg.groupBy("bg").agg(F.count(F.lit(1)).alias("c_bg"))
    ctx_counts = bg.groupBy("w1").agg(F.count(F.lit(1)).alias("c_w1"))
    vocab = docs.select(
        F.explode(tokens(text_col)).alias("w")
    ).agg(F.countDistinct("w").alias("v"))

    scored = (
        bg.join(bg_counts, "bg")
        .join(ctx_counts, "w1")
        .crossJoin(F.broadcast(vocab))
        .withColumn(
            "logp",
            F.log(
                (F.col("c_bg") + F.lit(k))
                / (F.col("c_w1") + F.lit(k) * F.col("v"))
            ),
        )
    )
    return scored.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_bigrams"),
        (-F.avg("logp")).alias("cross_entropy"),
    )
