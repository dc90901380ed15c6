"""Streaming vector ingestion: the reference's insert path
(kd_tree_database.py:262-270) run as a Structured Streaming sink —
micro-batches land in the versioned, cell-partitioned snapshot with
monotonic ids and incrementally maintained index stats."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from lightweight_vector_database_spark.operators.knn import knn
from lightweight_vector_database_spark.plans.grid_index import (
    GridIndex,
    index_stats,
    knn_indexed,
)
from lightweight_vector_database_spark.sources.snapshots import SnapshotStore
from lightweight_vector_database_spark.streaming.ingest import VectorIngest

DIM = 4


def _batch(spark, seed: int, n: int):
    rng = np.random.RandomState(seed)
    rows = [
        (rng.uniform(0, 1, DIM).astype(np.float32).tolist(), int(seed))
        for _ in range(n)
    ]
    return spark.createDataFrame(rows, "embedding array<float>, label int")


@pytest.fixture()
def index():
    return GridIndex([0.0] * DIM, [1.0] * DIM, num_splits=2, depth=4)


def test_ingest_batches_maintain_invariants(spark, tmp_path, index):
    store = SnapshotStore(spark, str(tmp_path / "snap"))
    ingest = VectorIngest(store, index)

    sizes = [30, 20, 25]
    for epoch, (seed, n) in enumerate(zip([1, 2, 3], sizes)):
        ingest.apply_batch(_batch(spark, seed, n), epoch)
        snap = store.read()
        total = sum(sizes[: epoch + 1])
        # count invariant and cross-structure invariant (reference
        # tests:20-28: len(db) == index-derived count)
        assert snap.count() == total
        assert sum(ingest.stats.values()) == total
        assert ingest.stats == index_stats(snap)
        # ids unique and monotonic across batches, never reused
        ids = [r.vec_id for r in snap.select("vec_id").collect()]
        assert sorted(ids) == list(range(total))

    assert store.versions() == [0, 1, 2]


def test_ingest_replayed_epoch_is_idempotent(spark, tmp_path, index):
    store = SnapshotStore(spark, str(tmp_path / "snap"))
    ingest = VectorIngest(store, index)
    b = _batch(spark, 7, 15)
    ingest.apply_batch(b, 0)
    v = store.latest_version()
    ingest.apply_batch(b, 0)  # foreachBatch failure replay
    assert store.latest_version() == v
    assert store.read().count() == 15
    assert sum(ingest.stats.values()) == 15


def test_ingest_then_knn_indexed_equals_brute(spark, tmp_path, index):
    store = SnapshotStore(spark, str(tmp_path / "snap"))
    ingest = VectorIngest(store, index)
    for epoch, seed in enumerate([11, 12]):
        ingest.apply_batch(_batch(spark, seed, 40), epoch)

    snap = store.read()
    probe = [0.31, 0.62, 0.18, 0.77]
    brute = knn(snap, probe, 5).select("vec_id", "dist").collect()
    indexed = (
        knn_indexed(snap, index, probe, 5, stats=ingest.stats)
        .select("vec_id", "dist")
        .collect()
    )
    assert [(r.vec_id, round(r.dist, 9)) for r in brute] == [
        (r.vec_id, round(r.dist, 9)) for r in indexed
    ]


def test_ingest_through_real_stream(spark, tmp_path, index):
    """End-to-end through readStream: parquet file source, one file
    per micro-batch, availableNow."""
    src = tmp_path / "incoming"
    for seed in (21, 22, 23):
        _batch(spark, seed, 10).coalesce(1).write.mode("append").parquet(str(src))

    store = SnapshotStore(spark, str(tmp_path / "snap"))
    ingest = VectorIngest(store, index)
    stream = (
        spark.readStream.schema("embedding array<float>, label int")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
    )
    q = ingest.start(stream, checkpoint=str(tmp_path / "ckpt"))
    q.awaitTermination(120)

    snap = store.read()
    assert snap.count() == 30
    assert sum(ingest.stats.values()) == 30
    assert ingest.stats == index_stats(snap)
    ids = sorted(r.vec_id for r in snap.select("vec_id").collect())
    assert ids == list(range(30))
    # landed data is cell-partitioned: the serving filter prunes files
    assert "cell_id" in snap.columns


def test_ingest_start_scheduler_pool_contract(spark, tmp_path, index):
    """start(scheduler_pool=) tags the stream's micro-batch jobs with
    a fair-scheduler pool (the StreamExecution thread inherits the
    local property at start) and ALWAYS restores the calling thread's
    own pool — the serve thread must not leak into the maintenance
    pool after launching the stream. Ingest results are unchanged."""
    sc = spark.sparkContext
    src = tmp_path / "incoming"
    for seed in (31, 32):
        _batch(spark, seed, 10).coalesce(1).write.mode("append").parquet(str(src))
    store = SnapshotStore(spark, str(tmp_path / "snap"))
    ingest = VectorIngest(store, index)
    stream = (
        spark.readStream.schema("embedding array<float>, label int")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
    )
    sc.setLocalProperty("spark.scheduler.pool", "serve")
    try:
        q = ingest.start(
            stream,
            checkpoint=str(tmp_path / "ckpt"),
            scheduler_pool="maintenance",
        )
        # restored immediately after start(), not at query end
        assert sc.getLocalProperty("spark.scheduler.pool") == "serve"
        q.awaitTermination(120)
        assert store.read().count() == 20
        assert sc.getLocalProperty("spark.scheduler.pool") == "serve"
    finally:
        sc.setLocalProperty("spark.scheduler.pool", None)
    assert sc.getLocalProperty("spark.scheduler.pool") is None


def test_cdc_batches_full_mutation_surface(spark, tmp_path, index):
    """CDC sink: insert / update (delete+insert keeping id) / delete,
    with incremental stats staying consistent throughout."""
    store = SnapshotStore(spark, str(tmp_path / "snap"))
    ingest = VectorIngest(store, index)

    def cdc(rows):
        return spark.createDataFrame(
            rows, "op string, vec_id long, embedding array<float>, label int"
        )

    # epoch 0: 4 inserts (ids minted 0..3)
    v = lambda x: [float(x)] * DIM
    ingest.apply_cdc_batch(
        cdc([("I", None, v(0.1), 0), ("I", None, v(0.2), 1),
             ("I", None, v(0.3), 2), ("I", None, v(0.4), 3)]),
        0,
    )
    snap = store.read()
    assert sorted(r.vec_id for r in snap.collect()) == [0, 1, 2, 3]
    assert sum(ingest.stats.values()) == 4

    # epoch 1: delete id 1, move id 2 (update keeps the id), insert one
    ingest.apply_cdc_batch(
        cdc([("D", 1, None, None), ("U", 2, v(0.9), 2), ("I", None, v(0.5), 4)]),
        1,
    )
    snap = store.read()
    rows = {r.vec_id: (list(r.embedding), r.label) for r in snap.collect()}
    assert sorted(rows) == [0, 2, 3, 4]  # 1 gone; new row minted id 4 (max+1)
    assert rows[2][0] == [np.float32(0.9)] * DIM  # moved, id preserved
    assert sum(ingest.stats.values()) == 4
    from lightweight_vector_database_spark.plans.grid_index import index_stats as istats
    assert ingest.stats == istats(snap)

    # epoch 1 replayed: idempotent
    ingest.apply_cdc_batch(cdc([("D", 0, None, None)]), 1)
    assert store.read().count() == 4

    # epoch 2: unmatched U inserts with the given id (MERGE semantics)
    ingest.apply_cdc_batch(cdc([("U", 77, v(0.6), 5)]), 2)
    snap = store.read()
    assert 77 in {r.vec_id for r in snap.collect()}
    assert ingest.stats == istats(snap)
    # kNN still exact against the final snapshot
    got = knn_indexed(snap, index, [0.9] * DIM, 1, stats=ingest.stats).collect()
    assert got[0].vec_id == 2


def test_ingest_retention_bounds_store(spark, tmp_path, index):
    store = SnapshotStore(spark, str(tmp_path / "snap"))
    ingest = VectorIngest(store, index, retain_versions=2)
    for epoch, seed in enumerate([31, 32, 33, 34]):
        ingest.apply_batch(_batch(spark, seed, 10), epoch)
    assert len(store.versions()) == 2
    assert store.read().count() == 40
    assert sum(ingest.stats.values()) == 40


def test_ingest_crash_between_commit_and_sidecar_is_exactly_once(
    spark, tmp_path, index
):
    # crash window: the sink commits the snapshot, then dies BEFORE the
    # sidecar epoch record is written. The epoch rides in the commit's
    # manifest metadata (one atomic pointer swap), so a restarted sink
    # replaying the same epoch must skip it — no duplicate rows.
    import os

    store = SnapshotStore(spark, str(tmp_path / "snap"))
    ingest = VectorIngest(store, index)
    b = _batch(spark, 1, 40)
    ingest.apply_batch(b, 0)
    # simulate the crash: sidecar lost, manifest survived
    os.remove(ingest._epoch_path())
    v_before = store.latest_version()

    restarted = VectorIngest(store, index)
    restarted.apply_batch(b, 0)  # foreachBatch replay after recovery
    assert store.read().count() == 40
    assert store.latest_version() == v_before  # no extra commit
    assert sum(restarted.stats.values()) == 40


def test_ingest_with_adaptive_index_keeps_one_keyspace(spark, tmp_path):
    # streaming ingest under an AdaptiveGridIndex: the snapshot's
    # cell_id column (leaf-encoded via assign_cells) and the
    # incrementally maintained stats must live in the SAME keyspace
    from lightweight_vector_database_spark.plans.grid_index import (
        AdaptiveGridIndex,
    )

    b0 = _batch(spark, 1, 200)
    aidx = AdaptiveGridIndex(
        [0.0] * DIM, [1.0] * DIM, num_splits=2, max_depth=6, max_leaf_size=32
    )
    aidx.fit(b0)
    store = SnapshotStore(spark, str(tmp_path / "snap"))
    ingest = VectorIngest(store, aidx)
    ingest.apply_batch(b0, 0)
    ingest.apply_batch(_batch(spark, 2, 150), 1)
    snap = store.read()
    assert snap.count() == 350
    assert ingest.stats == index_stats(snap)  # key-for-key, not just sums

    # an unfitted adaptive index must refuse the first batch loudly
    fresh = AdaptiveGridIndex([0.0] * DIM, [1.0] * DIM)
    ingest2 = VectorIngest(SnapshotStore(spark, str(tmp_path / "s2")), fresh)
    with pytest.raises(ValueError, match="fit"):
        ingest2.apply_batch(b0, 0)


def test_ingest_delta_store_appends_not_rewrites(spark, tmp_path, index):
    # the O(batch) ingest path: each micro-batch commits ONLY its own
    # rows (one add dir per batch), ids minted from the high-water
    # mark in commit metadata — same invariants as the rewrite path
    from lightweight_vector_database_spark.sources.delta_snapshots import (
        DeltaSnapshotStore,
    )

    store = DeltaSnapshotStore(spark, str(tmp_path / "delta"))
    ingest = VectorIngest(store, index)
    sizes = [30, 20, 25]
    for epoch, (seed, n) in enumerate(zip([1, 2, 3], sizes)):
        ingest.apply_batch(_batch(spark, seed, n), epoch)
    snap = store.read()
    total = sum(sizes)
    assert snap.count() == total
    assert sum(ingest.stats.values()) == total
    assert ingest.stats == index_stats(snap)
    # ids are unique and dense 0..total-1 (minted per-batch from the
    # metadata high-water mark, no table scan)
    ids = sorted(r.vec_id for r in snap.select("vec_id").collect())
    assert ids == list(range(total))
    # log shape proves append-only: one add dir per batch, no rewrite
    assert store.log_depth() == (3, 0)

    # replay idempotency via manifest epoch (exactly-once)
    ingest2 = VectorIngest(store, index)
    ingest2.apply_batch(_batch(spark, 1, 30), 2)  # stale epoch
    assert store.read().count() == total


def test_cdc_delta_store_atomic_mutation(spark, tmp_path, index):
    from lightweight_vector_database_spark.sources.delta_snapshots import (
        DeltaSnapshotStore,
    )

    store = DeltaSnapshotStore(spark, str(tmp_path / "delta"))
    ingest = VectorIngest(store, index)

    def cdc(rows):
        return spark.createDataFrame(
            rows, "op string, vec_id long, embedding array<float>, label int"
        )

    v = lambda x: [float(x)] * DIM
    ingest.apply_cdc_batch(
        cdc([("I", None, v(0.1), 0), ("I", None, v(0.2), 1),
             ("I", None, v(0.3), 2)]),
        0,
    )
    assert sorted(r.vec_id for r in store.read().collect()) == [0, 1, 2]

    # ONE atomic commit: delete id 0, replace id 1 (same id survives the
    # tombstone via the sequence rule), insert a new row (minted id 3)
    ingest.apply_cdc_batch(
        cdc([("D", 0, None, None), ("U", 1, v(0.9), 77),
             ("I", None, v(0.5), 4)]),
        1,
    )
    snap = store.read()
    got = {r.vec_id: r.label for r in snap.collect()}
    assert got == {1: 77, 2: 2, 3: 4}
    assert ingest.stats == index_stats(snap)
    # the mutation was O(delta): no rewrite — log grew, not reset
    n_adds, n_tombs = store.log_depth()
    assert n_adds >= 2 and n_tombs == 1

    # replay idempotency (epoch in the same atomic manifest entry)
    ingest.apply_cdc_batch(cdc([("D", 1, None, None)]), 1)
    assert store.read().count() == 3

    # compaction preserves the visible state and restores scan-only
    store.compact(partition_by=["cell_id"])
    assert {r.vec_id: r.label for r in store.read().collect()} == got
    assert store.log_depth() == (1, 0)


def test_cdc_delta_unmatched_update_never_reuses_ids(spark, tmp_path, index):
    # MERGE semantics: an unmatched U inserts with its explicit id; a
    # later minted id must never collide with it (the delta path minds
    # the high-water mark in metadata, not a table scan)
    from lightweight_vector_database_spark.sources.delta_snapshots import (
        DeltaSnapshotStore,
    )

    store = DeltaSnapshotStore(spark, str(tmp_path / "delta"))
    ingest = VectorIngest(store, index)

    def cdc(rows):
        return spark.createDataFrame(
            rows, "op string, vec_id long, embedding array<float>, label int"
        )

    v = lambda x: [float(x)] * DIM
    ingest.apply_cdc_batch(cdc([("U", 77, v(0.6), 5)]), 0)  # explicit id 77
    ingest.apply_cdc_batch(cdc([("I", None, v(0.7), 6)]), 1)
    ids = sorted(r.vec_id for r in store.read().collect())
    assert ids == [77, 78]  # minted ABOVE the explicit id, no reuse
    assert ingest.stats == index_stats(store.read())


def test_ingest_delta_auto_compaction(spark, tmp_path, index):
    # the maintenance cadence: once the log exceeds compact_every dirs
    # the sink folds it; visible rows, ids, stats, and the metadata
    # high-water mark all survive the fold
    from lightweight_vector_database_spark.sources.delta_snapshots import (
        DeltaSnapshotStore,
    )

    store = DeltaSnapshotStore(spark, str(tmp_path / "delta"))
    ingest = VectorIngest(store, index, compact_every=3)
    for epoch, seed in enumerate([1, 2, 3, 4]):
        ingest.apply_batch(_batch(spark, seed, 10), epoch)
    snap = store.read()
    assert snap.count() == 40
    assert sorted(r.vec_id for r in snap.collect()) == list(range(40))
    assert ingest.stats == index_stats(snap)
    n_adds, n_tombs = store.log_depth()
    assert n_adds <= 3 and n_tombs == 0  # the log was folded
    # the high-water mark survived compaction: next batch keeps minting
    ingest.apply_batch(_batch(spark, 5, 5), 4)
    assert sorted(r.vec_id for r in store.read().collect()) == list(range(45))


def test_ingest_delta_drift_triggers_retrain_and_recall_restores(
    spark, tmp_path, index
):
    """VERDICT r9 item 6: the DriftMonitor wired INTO the ingest loop,
    end to end through a REAL stream over the delta store — planted
    drift mid-stream trips the retrain trigger from inside
    foreachBatch, the retrain_fn rebuilds the serving model from the
    CURRENT snapshot, and post-retrain nprobe recall on the drifted
    probes is restored while the refreshed monitor goes quiet."""
    from lightweight_vector_database_spark.operators.drift import (
        DriftMonitor,
        staleness_threshold,
    )
    from lightweight_vector_database_spark.operators.knn import knn_join
    from lightweight_vector_database_spark.operators.similarity import (
        ivf_assign,
        ivf_search,
        train_centroids,
    )
    from lightweight_vector_database_spark.sources.delta_snapshots import (
        DeltaSnapshotStore,
    )

    def cluster_batch(seed: int, n: int, center: float, amp: float = 0.02):
        rng = np.random.RandomState(seed)
        rows = [
            ((center + amp * rng.uniform(-1, 1, DIM)).tolist(), int(seed))
            for _ in range(n)
        ]
        return spark.createDataFrame(rows, "embedding array<double>, label int")

    # deploy-time state: base data committed, model trained on it
    store = DeltaSnapshotStore(spark, str(tmp_path / "delta"))
    bootstrap = VectorIngest(store, index)
    bootstrap.apply_batch(
        cluster_batch(1, 60, 0.15).unionByName(cluster_batch(2, 60, 0.85)), 0
    )
    deployed = store.read()
    cents = train_centroids(
        deployed, n_centroids=2, iters=5, sample_rows=512,
        sample_id_col="vec_id",
    )
    thr = staleness_threshold(deployed, cents, q=0.95)

    def retrain(st, mon):
        snap = st.read()
        new_cents = train_centroids(
            snap, n_centroids=4, iters=5, sample_rows=512,
            sample_id_col="vec_id",
        )
        return new_cents, staleness_threshold(snap, new_cents, q=0.95)

    monitor = DriftMonitor(cents, thr, stale_limit=0.5)
    ingest = VectorIngest(
        store, index, drift_monitor=monitor, retrain_fn=retrain
    )

    # mid-stream batches: 2 in-distribution (no trigger), then the
    # drifted cluster at the midpoint — equidistant from both trained
    # centroids, the silent-recall-loss geometry
    src = tmp_path / "incoming"
    cluster_batch(3, 40, 0.16).coalesce(1).write.mode("append").parquet(str(src))
    cluster_batch(4, 40, 0.84).coalesce(1).write.mode("append").parquet(str(src))
    cluster_batch(5, 80, 0.5, amp=0.04).coalesce(1).write.mode("append").parquet(
        str(src)
    )
    stream = (
        spark.readStream.schema("embedding array<double>, label int")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
    )
    q = ingest.start(stream, checkpoint=str(tmp_path / "ckpt"))
    q.awaitTermination(180)

    # the trigger fired exactly once, on the drifted batch, and the
    # refreshed monitor is quiet
    assert len(ingest.retrain_epochs) == 1
    assert not monitor.should_retrain
    new_cents = monitor.centroids

    # recall re-pin on the final snapshot: drifted probes through the
    # OLD model lose their neighborhood, through the retrained model
    # they recover it
    snap = store.read()
    drifted = snap.filter(
        F.col("embedding")[0].between(0.4, 0.6)
    )
    probes = drifted.limit(12).select(
        F.col("vec_id").alias("probe_id"),
        F.col("embedding").cast("array<double>").alias("probe_vec"),
    )
    want: dict[int, set] = {}
    for r in knn_join(probes, snap, 10, strategy="window").collect():
        want.setdefault(r.probe_id, set()).add(r.vec_id)

    def mean_recall(model):
        assigned = ivf_assign(snap, model).cache()
        recs = []
        for pid, vec in sorted(
            (r.probe_id, [float(x) for x in r.probe_vec])
            for r in probes.collect()
        ):
            got = {
                r.vec_id
                for r in ivf_search(
                    assigned, model, vec, k=10, nprobe=1
                ).collect()
            }
            recs.append(len(got & want[pid]) / 10)
        assigned.unpersist()
        return sum(recs) / len(recs)

    degraded = mean_recall(cents)
    restored = mean_recall(new_cents)
    assert restored >= 0.9, f"retrain did not restore recall: {restored}"
    assert restored > degraded + 0.2, (
        f"drift fixture too easy: old {degraded}, new {restored}"
    )
