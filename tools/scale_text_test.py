"""Text-pipeline scale stress: 1M synthetic docs (with planted
near-duplicates) through exact dedup, MinHash+LSH candidates,
connected-components clustering, Bloom decontamination, and a
count-min frequency sketch — the full LLM-curation path end-to-end.

Docs are generated Spark-side: each doc is ~80 words drawn from a
5000-word vocabulary keyed by a deterministic hash; 10% of docs are
near-copies of an earlier doc (a few words perturbed), 2% exact
copies. Usage: python tools/scale_text_test.py [n_docs]
"""

from __future__ import annotations

import sys
import time

from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F

from lightweight_vector_database_spark.operators.dedup import (
    exact_dedup,
    lsh_candidate_pairs,
    minhash_signatures,
)
from lightweight_vector_database_spark.operators.graph import connected_components
from lightweight_vector_database_spark.session import get_spark

WORDS_PER_DOC = 80
VOCAB = 5000


def generate(spark, n_docs: int):
    base = spark.range(n_docs).select(F.col("id").alias("doc_id"))
    # source id: 10% near-dup of doc_id - (doc_id % 10_000) (same seed
    # words with a perturbation), 2% exact copy, rest unique
    bucket = F.pmod(F.xxhash64(F.col("doc_id")), F.lit(100))
    src = (
        F.when(bucket < 2, F.col("doc_id") - F.pmod(F.col("doc_id"), F.lit(997)))
        .when(bucket < 12, F.col("doc_id") - F.pmod(F.col("doc_id"), F.lit(997)))
        .otherwise(F.col("doc_id"))
    )
    perturb = F.when(
        (bucket >= 2) & (bucket < 12), F.col("doc_id")
    ).otherwise(F.lit(0))
    words = F.transform(
        F.sequence(F.lit(1), F.lit(WORDS_PER_DOC)),
        lambda i: F.concat(
            F.lit("w"),
            F.pmod(
                F.pmod(F.xxhash64(src, i), F.lit(VOCAB))
                # perturbation flips ~4 of 80 words for near-dups
                # (pmod first: raw hash sums overflow int64 under ANSI)
                + F.when(
                    (F.pmod(i, F.lit(20)) == 0) & (perturb > 0),
                    F.pmod(F.xxhash64(perturb, i), F.lit(VOCAB)),
                ).otherwise(F.lit(0)),
                F.lit(VOCAB),
            ).cast("string"),
        ),
    )
    return base.select("doc_id", F.array_join(words, " ").alias("text"))


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    spark = get_spark("scale-text")
    spark.sparkContext.setLogLevel("ERROR")

    path = "/tmp/lvdb_scale_docs"
    t0 = time.time()
    generate(spark, n_docs).write.mode("overwrite").parquet(path)
    docs = spark.read.parquet(path)
    print(f"generate+write: {time.time()-t0:.1f}s ({n_docs} docs)")

    t0 = time.time()
    kept = exact_dedup(docs, "text", "doc_id")
    n_kept = kept.count()
    print(f"exact dedup: {time.time()-t0:.1f}s ({n_docs - n_kept} exact dups removed)")

    t0 = time.time()
    # expr beats arrow here (35s vs 145s at 1M: the ragged hash arrays
    # would have to cross the Arrow boundary) — see minhash_signatures
    sigs = minhash_signatures(docs, "doc_id", "text", num_hashes=32, ngram=3).cache()
    sigs.count()
    print(f"minhash signatures (3-gram, 32 perms): {time.time()-t0:.1f}s")

    t0 = time.time()
    cands = lsh_candidate_pairs(sigs, bands=8, sig_len=32).cache()
    n_cands = cands.count()
    print(f"LSH candidates (8 bands): {time.time()-t0:.1f}s ({n_cands} pairs)")

    t0 = time.time()
    comp = connected_components(cands, max_iter=10)
    n_clusters = comp.select("component").distinct().count()
    n_nodes = comp.count()
    print(
        f"connected components: {time.time()-t0:.1f}s "
        f"({n_nodes} near-dup docs in {n_clusters} clusters)"
    )
    sigs.unpersist()
    cands.unpersist()

    from lightweight_vector_database_spark.functions.text import word_ngrams
    from lightweight_vector_database_spark.operators.sketches import (
        bloom_build,
        bloom_probe,
        cms_build_stream,
        cms_estimate,
    )

    # Bloom decontamination: doc_id < 1000 plays the benchmark set
    # (~73k distinct 8-grams); a 4 Mbit filter is ~57 bits/item ->
    # false-positive rate ~2e-5 with 4 hashes.
    t0 = time.time()
    m_bits = 1 << 22
    grams = docs.select(
        "doc_id", F.explode(F.array_distinct(word_ngrams("text", 8))).alias("ng")
    )
    words = bloom_build(
        grams.filter(F.col("doc_id") < 1000).select("ng"), "ng", m_bits
    )
    hits = bloom_probe(
        grams.filter(F.col("doc_id") >= 1000), "ng", words, m_bits
    )
    n_contam = (
        hits.groupBy("doc_id")
        .agg(F.count_if(F.col("bloom_hit")).alias("h"))
        .filter("h >= 2")
        .count()
    )
    print(
        f"bloom decontamination (4 Mbit, 4 hashes): {time.time()-t0:.1f}s "
        f"({n_contam} train docs flagged)"
    )

    # count-min straight from the raw bigram stream: map-side partials
    # collapse each partition to <= 4x1024 cells, so the sketch build
    # never shuffles the ~25M-distinct bigram key space
    t0 = time.time()
    bigrams = docs.select(F.explode(word_ngrams("text", 2)).alias("ng"))
    cells = cms_build_stream(bigrams, "ng").cache()
    cells.count()
    t_build = time.time() - t0
    # the exact top-100 baseline pays that full-key-space shuffle —
    # the cost the sketch avoids at serve time
    t0 = time.time()
    counts = bigrams.groupBy("ng").agg(F.count(F.lit(1)).alias("n"))
    top = counts.orderBy(F.col("n").desc(), "ng").limit(100)
    est = cms_estimate(top.select("ng"), "ng", cells)
    mx = est.agg(F.max("cms_n")).first()[0]
    print(
        f"count-min sketch (4x1024) build from raw stream: {t_build:.1f}s; "
        f"exact top-100 baseline + estimates: {time.time()-t0:.1f}s "
        f"(max estimate {mx})"
    )
    cells.unpersist()


if __name__ == "__main__":
    main()
