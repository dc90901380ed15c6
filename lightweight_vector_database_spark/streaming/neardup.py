"""Streaming near-duplicate detection: a stream-static LSH join.

The ingestion-time form of the batch MinHash+LSH dedup
(operators/dedup.py): incoming documents are MinHash-signed and banded
with the SAME stateless expressions the batch path uses (pure Catalyst
— no UDF, no state), then joined against a STATIC band index built
from the existing corpus. Stream-static equi-joins are stateless in
Structured Streaming (each micro-batch probes the static side; no
watermark, no state store), so this runs append-mode with bounded
memory at any stream rate — the standard "is this new doc a near-dup
of anything we already have?" admission check for a training-data
ingest pipeline.

At 100 TB the static side is the persisted signature/band index (it IS
the dedup index; see minhash_dedup_candidates' cache note). Here the
band relation is broadcast when small; for corpus-scale indexes drop
the broadcast hint and let the join shuffle the (tiny) per-batch
stream side against the bucketed index instead.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators.dedup import banded_signatures, minhash_signatures


def corpus_band_index(
    docs: DataFrame,
    num_hashes: int = 32,
    bands: int = 8,
    ngram: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(corpus_id, band, bucket) — the static side of the stream-static
    join. Build once from the corpus (batch), persist/broadcast."""
    sigs = minhash_signatures(docs, id_col, text_col, num_hashes, ngram)
    return banded_signatures(sigs, bands, num_hashes).select(
        F.col("id").alias("corpus_id"), "band", "bucket"
    )


def stream_near_dup_pairs(
    stream_docs: DataFrame,
    index: DataFrame,
    num_hashes: int = 32,
    bands: int = 8,
    ngram: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
    broadcast_index: bool = True,
) -> DataFrame:
    """(doc_id, corpus_id, band) for every band collision between a
    streamed document and the corpus index (self-matches on equal ids
    excluded). Stateless and append-safe; a pair sharing several bands
    appears once per band (streaming `distinct` would need state —
    dedupe downstream in the sink or batch layer if needed).

    Works identically on a BATCH DataFrame (the signature/banding
    expressions are stateless), which is how the equality test pins
    stream == batch.
    """
    sigs = minhash_signatures(stream_docs, id_col, text_col, num_hashes, ngram)
    banded = banded_signatures(sigs, bands, num_hashes)
    right = F.broadcast(index) if broadcast_index else index
    return (
        banded.join(right, ["band", "bucket"])
        .filter(F.col("id") != F.col("corpus_id"))
        .select(F.col("id").alias(id_col), "corpus_id", "band")
    )


def extend_band_index(
    store,
    new_docs: DataFrame,
    num_hashes: int = 32,
    bands: int = 8,
    ngram: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> int:
    """Incrementally maintain a PERSISTED band index: append the new
    documents' (corpus_id, band, bucket) rows to a DeltaSnapshotStore
    keyed by ``corpus_id``. O(new docs) per batch — the index is never
    rebuilt; removing a document is ``store.commit_delete`` on its
    corpus_id (the tombstone anti-join drops all its band rows).
    ``store.read()`` is then the static side of
    ``stream_near_dup_pairs``, so the admission check always probes
    the up-to-date corpus. Returns the committed version."""
    idx = corpus_band_index(
        new_docs, num_hashes, bands, ngram, id_col, text_col
    )
    # always append: commit_mutation handles the empty store, and a
    # commit_full here would be a check-then-act race (two concurrent
    # first batches -> the second's rewrite silently drops the
    # first's rows) AND would stamp v0 as a rewrite, blocking any
    # read_changes range that includes it
    return store.commit_append(idx)
