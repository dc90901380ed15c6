"""Streaming-window queries — batch twins over ``events`` (the oracle
checks window semantics; true streaming execution is pytest-verified
in tests/test_streaming.py with the same functions)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..sources import load_table
from ..streaming.windows import (
    first_event_per_key,
    session_agg,
    sliding_agg,
    tumbling_agg,
    windowed_topk,
)
from . import register

_Q6_SQL = (
    "(CAST(SUM(CAST(floor(value * 1000000.0) AS BIGINT)) AS DOUBLE) / 1000000.0)"
)


def _tumbling(spark: SparkSession, sf_dir: str) -> DataFrame:
    return tumbling_agg(load_table(spark, sf_dir, "events"), "1 hour")


register(
    "stream_tumbling_1h",
    _tumbling,
    f"""
SELECT epoch_us(date_trunc('hour', ts)) AS window_start_us, event_type,
       count(*) AS n, {_Q6_SQL} AS sum_value
FROM events GROUP BY 1, 2
""",
)


def _sliding(spark: SparkSession, sf_dir: str) -> DataFrame:
    return sliding_agg(load_table(spark, sf_dir, "events"), "1 hour", "15 minutes")


# each event belongs to 4 windows: starts at 15-min-floor(ts) - k*15min
register(
    "stream_sliding_1h_15m",
    _sliding,
    f"""
WITH expanded AS (
  SELECT epoch_us(time_bucket(INTERVAL '15 minutes', ts)
                  - o * INTERVAL '15 minutes') AS window_start_us, value
  FROM events CROSS JOIN (SELECT unnest([0, 1, 2, 3]) AS o)
)
SELECT window_start_us, count(*) AS n, {_Q6_SQL} AS sum_value
FROM expanded GROUP BY 1
""",
)


def _session(spark: SparkSession, sf_dir: str) -> DataFrame:
    return session_agg(load_table(spark, sf_dir, "events"), "30 minutes")


# gaps-and-islands formulation of gap-based sessions
register(
    "stream_session_30m",
    _session,
    f"""
WITH marked AS (
  SELECT user_id, ts, event_id, value,
         CASE WHEN lag(ts) OVER w IS NULL
                OR ts - lag(ts) OVER w >= INTERVAL '30 minutes'
              THEN 1 ELSE 0 END AS new_session
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), numbered AS (
  SELECT user_id, ts, value,
         SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                ROWS UNBOUNDED PRECEDING) AS session_id
  FROM marked
)
SELECT user_id, epoch_us(min(ts)) AS session_start_us,
       count(*) AS n, {_Q6_SQL} AS sum_value
FROM numbered GROUP BY user_id, session_id
""",
)


def _first_per_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    out = first_event_per_key(load_table(spark, sf_dir, "events"))
    return out.select("event_id", "user_id", "event_type")


register(
    "stream_dedup_first_event",
    _first_per_key,
    """
SELECT event_id, user_id, event_type FROM (
  SELECT event_id, user_id, event_type,
         row_number() OVER (PARTITION BY user_id, event_type
                            ORDER BY ts ASC, event_id ASC) AS rn
  FROM events
) WHERE rn = 1
""",
)


_INGEST_DIRS: dict[tuple[str, str], str] = {}


def _session_store_dir(kind: str, sf_dir: str) -> tuple[str, bool]:
    """A snapshot dir that OUTLIVES the query function, so the
    registered query can return a LIVE plan over the store's parquet
    files instead of a collect→createDataFrame round-trip (a
    TemporaryDirectory would be deleted before the caller executes the
    plan — VERDICT r4 item 3). First call per (kind, sf_dir) creates
    and ingests; subsequent calls in the same session read the same
    store. Removed at interpreter exit."""
    import atexit
    import shutil
    import tempfile

    key = (kind, sf_dir)
    created = key not in _INGEST_DIRS
    if created:
        d = tempfile.mkdtemp(prefix=f"lvdb_ingest_{kind}_")
        _INGEST_DIRS[key] = d
        atexit.register(shutil.rmtree, d, ignore_errors=True)
    return _INGEST_DIRS[key], created


def _vector_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming vector ingestion (streaming/ingest.py): the embeddings
    table arrives in two micro-batches; result is the per-cell count
    profile of the final cell-partitioned snapshot plus the total-id
    invariant columns. The ingest pipeline (id minting, epoch replay
    protection, incremental stats) is what's under test — pytest holds
    the invariants (tests/test_streaming_ingest.py). Returns a live
    plan over the session-scoped snapshot store."""
    from pyspark.sql import functions as F

    from ..plans.grid_index import GridIndex
    from ..sources.snapshots import SnapshotStore
    from ..streaming.ingest import VectorIngest

    emb = load_table(spark, sf_dir, "embeddings").select("embedding", "label")
    index = GridIndex([-1.0] * 64, [1.0] * 64, num_splits=2, depth=4)
    d, fresh = _session_store_dir("snap", sf_dir)
    store = SnapshotStore(spark, f"{d}/snap")
    if fresh:
        ingest = VectorIngest(store, index)
        ingest.apply_batch(emb.filter(F.col("label") < 5), 0)
        ingest.apply_batch(emb.filter(F.col("label") >= 5), 1)
    snap = store.read()
    return (
        snap.groupBy(F.col("cell_id").cast("long").alias("cell_id"))
        .agg(F.count(F.lit(1)).alias("n"), F.countDistinct("vec_id").alias("n_ids"))
        .orderBy("cell_id")
    )


def _ingest_profile_sql(depth: int = 4, bins: int = 3) -> str:
    # depth-4 quantization over dims 1..4, bounds [-1, 1] — mirrors
    # GridIndex.cell_expr for depth <= dim (one level per dim); the
    # ingest result's per-cell profile must equal it exactly, and ids
    # stay distinct (n_ids == n)
    terms = []
    for level in range(depth):
        digit = (
            f"least(greatest(CAST(floor((CAST(embedding[{level + 1}] AS DOUBLE)"
            f" + 1.0) / 2.0 * {bins}) AS BIGINT), 0), {bins - 1})"
        )
        terms.append(f"{digit} * {bins ** (depth - 1 - level)}")
    return " + ".join(terms)


register(
    "stream_vector_ingest",
    _vector_ingest,
    f"""
SELECT ({_ingest_profile_sql()}) AS cell_id, count(*) AS n, count(*) AS n_ids
FROM embeddings GROUP BY 1
""",
)


def _vector_ingest_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Same two-micro-batch ingestion through the O(delta) store
    (sources/delta_snapshots.py): appends + metadata-minted ids, then a
    compaction — the 100 TB ingest shape. Exactly oracled: the final
    per-cell profile equals the depth-4 quantization computed in SQL,
    and every row keeps a distinct id (n_ids == n). Returns a live
    plan over the session-scoped delta store."""
    from pyspark.sql import functions as F

    from ..plans.grid_index import GridIndex
    from ..sources.delta_snapshots import DeltaSnapshotStore
    from ..streaming.ingest import VectorIngest

    emb = load_table(spark, sf_dir, "embeddings").select("embedding", "label")
    index = GridIndex([-1.0] * 64, [1.0] * 64, num_splits=2, depth=4)
    d, fresh = _session_store_dir("delta", sf_dir)
    store = DeltaSnapshotStore(spark, f"{d}/snap")
    if fresh:
        ingest = VectorIngest(store, index)
        ingest.apply_batch(emb.filter(F.col("label") < 5), 0)
        ingest.apply_batch(emb.filter(F.col("label") >= 5), 1)
        store.compact(partition_by=["cell_id"])
    snap = store.read()
    return (
        snap.groupBy(F.col("cell_id").cast("long").alias("cell_id"))
        .agg(F.count(F.lit(1)).alias("n"), F.countDistinct("vec_id").alias("n_ids"))
        .orderBy("cell_id")
    )


register(
    "stream_vector_ingest_delta",
    _vector_ingest_delta,
    f"""
SELECT ({_ingest_profile_sql()}) AS cell_id, count(*) AS n, count(*) AS n_ids
FROM embeddings GROUP BY 1
""",
)


def _cdc_feed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The delta store's CDC change feed, value-checked: build a
    4-version store from deterministic modulo-sliced orders commits
    (full -> append -> delete -> atomic delete+append), then return
    `read_changes(v0)`. The oracle derives the identical net feed from
    plain SQL set algebra over the same slices — pinning insert
    attribution, preimage deletes, and commit-version stamping against
    an engine that never saw the log."""
    from pyspark.sql import functions as F

    from ..sources.delta_snapshots import DeltaSnapshotStore
    from ..sources.tables import load_table as _lt

    d, created = _session_store_dir("cdcfeed", sf_dir)
    store = DeltaSnapshotStore(spark, f"{d}/store", id_col="vec_id")
    if created:
        o = _lt(spark, sf_dir, "orders").selectExpr(
            "o_orderkey AS vec_id", "o_totalprice AS price"
        )
        k = F.col("vec_id")
        store.commit_full(o.filter((k % 7).isin(0, 1, 2)))          # v0
        store.commit_append(o.filter(k % 7 == 3))                   # v1
        store.commit_delete(                                        # v2
            o.filter((k % 7 == 0) & (k % 3 == 0)).select("vec_id")
        )
        store.commit_mutation(                                      # v3
            append_df=o.filter(k % 7 == 4),
            delete_ids=o.filter((k % 7 == 1) & (k % 2 == 0)).select("vec_id"),
        )
    return store.read_changes(0)


register(
    "delta_change_feed",
    _cdc_feed,
    """
SELECT o_orderkey AS vec_id, o_totalprice AS price,
       'insert' AS _change_type, CAST(1 AS BIGINT) AS _commit_version
FROM orders WHERE o_orderkey % 7 = 3
UNION ALL
SELECT o_orderkey, o_totalprice, 'insert', CAST(3 AS BIGINT)
FROM orders WHERE o_orderkey % 7 = 4
UNION ALL
SELECT o_orderkey, o_totalprice, 'delete', CAST(2 AS BIGINT)
FROM orders WHERE o_orderkey % 7 = 0 AND o_orderkey % 3 = 0
UNION ALL
SELECT o_orderkey, o_totalprice, 'delete', CAST(3 AS BIGINT)
FROM orders WHERE o_orderkey % 7 = 1 AND o_orderkey % 2 = 0
""",
)


def _wds_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WebDataset export/import round-trip, value-checked: documents
    are packed into tar shards (sources/webdataset.py — distributed,
    driver-free, one tar stream per task) and read back; the oracle is
    plain SQL over the original table, so any loss or corruption in
    the container round-trip breaks the value hash."""
    from pyspark.sql import functions as F

    from ..sources.webdataset import (
        read_webdataset_shards,
        write_webdataset_shards,
    )

    d, created = _session_store_dir("wds", sf_dir)
    out = f"{d}/shards"
    if created:
        docs = load_table(spark, sf_dir, "documents").select(
            "doc_id", "text", "lang"
        )
        write_webdataset_shards(
            docs, out, "doc_id", text_cols=("text", "lang"), shard_size=200
        ).collect()
    back = read_webdataset_shards(
        spark, out, text_cols=("text", "lang"), key_type="long"
    )
    return back.select(
        F.col("key").alias("doc_id"),
        "lang",
        F.length("text").cast("long").alias("n_chars_rt"),
        F.md5("text").alias("text_md5"),
    )


register(
    "webdataset_roundtrip",
    _wds_roundtrip,
    """
SELECT doc_id, lang, CAST(length(text) AS BIGINT) AS n_chars_rt,
       md5(text) AS text_md5
FROM documents
""",
)


# --- per-window heavy hitters (round 7) ---------------------------------------


def _topk_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 event types per tumbling hour — the streaming heavy-hitter
    surface; tests/test_streaming.py pins the true-stream foreachBatch
    ranking against this batch form."""
    return windowed_topk(load_table(spark, sf_dir, "events"), "1 hour", 3)


register(
    "stream_topk_hourly",
    _topk_hourly,
    """
WITH c AS (
  SELECT epoch_us(date_trunc('hour', ts)) AS window_start_us,
         event_type, count(*) AS n
  FROM events GROUP BY 1, 2
), r AS (
  SELECT *, row_number() OVER (
    PARTITION BY window_start_us ORDER BY n DESC, event_type ASC) AS rank
  FROM c
)
SELECT window_start_us, event_type, n, CAST(rank AS BIGINT) AS rank
FROM r WHERE rank <= 3
""",
)
