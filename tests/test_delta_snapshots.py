"""DeltaSnapshotStore: O(delta) commits must be observationally
identical to the full-rewrite SnapshotStore, including time travel,
atomic CDC (sequence rule), compaction, and vacuum sharing."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from lightweight_vector_database_spark.sources.delta_snapshots import (
    DeltaSnapshotStore,
)


def _df(spark, rows):
    return spark.createDataFrame(rows, "vec_id long, v double")


def _state(store, version=None):
    return {(r.vec_id, r.v) for r in store.read(version).collect()}


def test_append_and_time_travel(spark, tmp_path):
    store = DeltaSnapshotStore(spark, str(tmp_path / "d"))
    v0 = store.commit_full(_df(spark, [(0, 0.0), (1, 1.0)]))
    v1 = store.commit_append(_df(spark, [(2, 2.0)]))
    v2 = store.commit_append(_df(spark, [(3, 3.0)]))
    assert _state(store) == {(0, 0.0), (1, 1.0), (2, 2.0), (3, 3.0)}
    assert _state(store, v0) == {(0, 0.0), (1, 1.0)}
    assert _state(store, v1) == {(0, 0.0), (1, 1.0), (2, 2.0)}
    assert store.versions() == [v0, v1, v2]


def test_delete_is_logical_and_versioned(spark, tmp_path):
    store = DeltaSnapshotStore(spark, str(tmp_path / "d"))
    v0 = store.commit_full(_df(spark, [(0, 0.0), (1, 1.0), (2, 2.0)]))
    store.commit_delete(_df(spark, [(1, 0.0)]).select("vec_id"))
    assert _state(store) == {(0, 0.0), (2, 2.0)}
    assert _state(store, v0) == {(0, 0.0), (1, 1.0), (2, 2.0)}  # history intact


def test_atomic_update_same_commit(spark, tmp_path):
    # the sequence rule: tombstoning id 1 and appending its replacement
    # in ONE commit must keep the replacement (a naive tombstone that
    # applied to ALL adds would delete it)
    store = DeltaSnapshotStore(spark, str(tmp_path / "d"))
    store.commit_full(_df(spark, [(0, 0.0), (1, 1.0)]))
    store.commit_mutation(
        append_df=_df(spark, [(1, 99.0), (5, 5.0)]),
        delete_ids=_df(spark, [(1, 0.0)]).select("vec_id"),
    )
    assert _state(store) == {(0, 0.0), (1, 99.0), (5, 5.0)}
    # and a LATER tombstone does remove the replacement
    store.commit_delete(_df(spark, [(1, 0.0)]).select("vec_id"))
    assert _state(store) == {(0, 0.0), (5, 5.0)}


def test_compact_preserves_state_and_resets_log(spark, tmp_path):
    store = DeltaSnapshotStore(spark, str(tmp_path / "d"))
    store.commit_full(_df(spark, [(0, 0.0)]))
    for i in range(1, 5):
        store.commit_append(_df(spark, [(i, float(i))]))
    store.commit_delete(_df(spark, [(2, 0.0)]).select("vec_id"))
    before = _state(store)
    assert store.log_depth() == (5, 1)
    store.compact()
    assert store.log_depth() == (1, 0)
    assert _state(store) == before


def test_vacuum_keeps_shared_dirs(spark, tmp_path):
    store = DeltaSnapshotStore(spark, str(tmp_path / "d"))
    store.commit_full(_df(spark, [(0, 0.0)]))
    store.commit_append(_df(spark, [(1, 1.0)]))
    store.commit_append(_df(spark, [(2, 2.0)]))
    dropped = store.vacuum(keep_last=1)
    assert len(dropped) == 2
    # the latest version still reads all rows: its add dirs (shared
    # with dropped versions) must have survived the vacuum
    assert _state(store) == {(0, 0.0), (1, 1.0), (2, 2.0)}
    with pytest.raises(KeyError):
        store.read(0)


def test_metadata_rides_commits(spark, tmp_path):
    store = DeltaSnapshotStore(spark, str(tmp_path / "d"))
    assert store.latest_metadata() == {}
    store.commit_full(_df(spark, [(0, 0.0)]), metadata={"next_id": 1})
    store.commit_append(_df(spark, [(1, 1.0)]), metadata={"next_id": 2, "query_epoch": 7})
    assert store.latest_metadata() == {"next_id": 2, "query_epoch": 7}


def test_empty_and_error_cases(spark, tmp_path):
    store = DeltaSnapshotStore(spark, str(tmp_path / "d"))
    with pytest.raises(KeyError):
        store.read()
    with pytest.raises(ValueError, match="nothing to commit"):
        store.commit_mutation()


def test_concurrent_writers_no_lost_update(spark, tmp_path):
    # two independent store handles on the same path commit interleaved
    # WITHOUT coordination; the claim-file OCC must keep every commit
    # in the log (naive read-modify-swap would drop one)
    path = str(tmp_path / "d")
    a = DeltaSnapshotStore(spark, path)
    b = DeltaSnapshotStore(spark, path)
    a.commit_full(_df(spark, [(0, 0.0)]))
    for i in range(1, 7):
        writer = a if i % 2 else b
        writer.commit_append(_df(spark, [(i, float(i))]))
    assert _state(a) == {(i, float(i)) for i in range(7)}
    assert a.versions() == list(range(7))
    # no claim files left behind
    import os

    assert not [f for f in os.listdir(path) if f.startswith("_claim")]


def test_stale_claim_is_broken(spark, tmp_path):
    # a dead writer's claim (crash between claim and swap) must not
    # wedge the store: writers break claims older than the timeout
    import os
    import time as _t

    path = str(tmp_path / "d")
    store = DeltaSnapshotStore(spark, path)
    store.commit_full(_df(spark, [(0, 0.0)]))
    dead = f"{path}/_claim_v1"
    with open(dead, "w"):
        pass
    old = _t.time() - DeltaSnapshotStore.STALE_CLAIM_SECONDS - 5
    os.utime(dead, (old, old))
    store.commit_append(_df(spark, [(1, 1.0)]))  # must not hang
    assert _state(store) == {(0, 0.0), (1, 1.0)}
    assert not os.path.exists(dead)


def test_compact_aborts_on_concurrent_commit(spark, tmp_path):
    # conditional rewrite: a commit that lands between compact's read
    # and its manifest swap must force a retry, never be dropped
    path = str(tmp_path / "d")
    store = DeltaSnapshotStore(spark, path)
    store.commit_full(_df(spark, [(0, 0.0)]))
    store.commit_append(_df(spark, [(1, 1.0)]))

    # simulate the race: the direct conditional commit with a stale
    # base must abort and change nothing
    stale_base = store.latest_version() - 1
    v = store.commit_mutation(
        append_df=_df(spark, [(0, 0.0)]),
        _rewrite=True,
        _expected_base=stale_base,
    )
    assert v is None
    assert _state(store) == {(0, 0.0), (1, 1.0)}

    # the public compact() retries until it folds the true tip
    store.compact()
    assert _state(store) == {(0, 0.0), (1, 1.0)}
    assert store.log_depth() == (1, 0)
