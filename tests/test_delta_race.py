"""Multiprocess commit race for the delta store (VERDICT r7 item 7).

The claim-file protocol (sources/delta_snapshots._claim_version) and
the fresh-manifest merge were tested single-process; this drives TWO
real OS processes (separate JVMs, separate DeltaSnapshotStore
instances) through interleaved commit_append / commit_mutation against
one store directory and pins:

- **no lost rows**: the final snapshot is exactly the deterministic
  union of everything both writers committed (minus writer 0's own
  tombstones);
- **linearizable version history**: versions are contiguous 0..15,
  every (writer, batch) commit appears exactly ONCE in the manifest
  (no dropped or double-applied commit), and each writer's own batch
  sequence appears in submission order (per-writer program order is
  preserved by the claim protocol);
- **monotone log**: every version's add-dir list extends its
  predecessor's (append-only history, no rewrite), so time travel
  across the race window stays consistent.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time
from pathlib import Path

import pytest

from lightweight_vector_database_spark.sources.delta_snapshots import (
    DeltaSnapshotStore,
)

WORKER = Path(__file__).resolve().parent / "_delta_race_worker.py"


@pytest.fixture(scope="module")
def raced_store(spark, tmp_path_factory):
    root = tmp_path_factory.mktemp("delta_race")
    store_path = str(root / "store")
    go_file = str(root / "go")
    procs = [
        subprocess.Popen(
            [sys.executable, str(WORKER), store_path, str(w), go_file],
            stdout=subprocess.PIPE,
            stderr=subprocess.PIPE,
        )
        for w in (0, 1)
    ]
    deadline = time.time() + 120
    while not all(
        os.path.exists(f"{go_file}.ready.{w}") for w in (0, 1)
    ):
        assert time.time() < deadline, "workers never became ready"
        for p in procs:
            assert p.poll() is None or p.returncode == 0, (
                p.communicate()[1].decode()[-2000:]
            )
        time.sleep(0.05)
    Path(go_file).touch()
    outs = []
    for p in procs:
        out, err = p.communicate(timeout=600)
        outs.append((p.returncode, out, err))
    for rc, out, err in outs:
        assert rc == 0, err.decode()[-2000:]
    return DeltaSnapshotStore(spark, store_path)


def _expected_ids() -> set[int]:
    w0 = set(range(0, 800)) - set(range(100, 110)) - set(range(400, 410))
    w1 = set(range(10_000, 10_800))
    return w0 | w1


def test_no_lost_rows(spark, raced_store):
    got = {r["vec_id"] for r in raced_store.read().select("vec_id").collect()}
    assert got == _expected_ids()


def test_version_history_is_linearizable(raced_store):
    versions = raced_store.versions()
    assert versions == list(range(16))
    with open(f"{raced_store._path}/_MANIFEST.json") as f:
        m = json.load(f)
    seen = []
    for v in versions:
        md = m["versions"][str(v)]["metadata"]
        seen.append((md["writer"], md["batch"]))
    # every commit exactly once — nothing lost, nothing double-applied
    assert sorted(seen) == [(w, b) for w in (0, 1) for b in range(8)]
    # per-writer program order survives the interleaving
    for w in (0, 1):
        batches = [b for ww, b in seen if ww == w]
        assert batches == sorted(batches)
    # the race really happened: neither writer ran strictly first
    writers_in_order = [w for w, _ in seen]
    assert writers_in_order != sorted(writers_in_order)
    assert writers_in_order != sorted(writers_in_order, reverse=True)


def test_log_is_monotone_append_only(raced_store):
    with open(f"{raced_store._path}/_MANIFEST.json") as f:
        m = json.load(f)
    prev_adds: list = []
    prev_tombs: list = []
    for v in range(16):
        info = m["versions"][str(v)]
        adds = [tuple(x) for x in info["adds"]]
        tombs = [tuple(x) for x in info["tombstones"]]
        assert adds[: len(prev_adds)] == prev_adds, f"v{v} rewrote history"
        assert tombs[: len(prev_tombs)] == prev_tombs
        assert not info["rewrite"]
        prev_adds, prev_tombs = adds, tombs
    # no claim files left behind
    leftovers = [
        p for p in os.listdir(raced_store._path) if p.startswith("_claim")
    ]
    assert leftovers == []


def test_time_travel_across_race_window(spark, raced_store):
    # every historical version is readable and row counts are
    # consistent with its own log (100 rows per add dir minus the
    # tombstoned ids visible at that version)
    with open(f"{raced_store._path}/_MANIFEST.json") as f:
        m = json.load(f)
    for v in (0, 5, 10, 15):
        info = m["versions"][str(v)]
        n = raced_store.read(v).count()
        expect = 100 * len(info["adds"]) - 10 * len(info["tombstones"])
        assert n == expect, f"version {v}: {n} != {expect}"
