"""Versioned snapshot store — durable CRUD with time travel.

The reference is purely in-memory (no persistence at all, SURVEY.md
§1.1); a real engine needs mutations to survive a restart. This is a
minimal copy-on-write snapshot log:

    store = SnapshotStore(spark, path)
    v0 = store.commit(df)                  # full snapshot write
    v1 = store.commit(crud.delete(store.read(), pred)[0])
    store.read()        # latest
    store.read(v0)      # time travel
    store.versions()    # history

Each version is a complete parquet directory + a tiny manifest. At
100 TB you'd commit deltas (appended files + tombstone sets) instead
of rewriting — that's exactly the Delta/Iceberg design, implemented
in ``delta_snapshots.DeltaSnapshotStore`` with the same surface
(read/commit/time-travel/metadata/vacuum), so callers — including the
streaming ingest sink — swap stores without code changes and get
O(batch) commits. Writes are atomic via write-then-rename of the
manifest pointer in both stores.
"""

from __future__ import annotations

import json
import os
import time

from pyspark.sql import DataFrame, SparkSession


class SnapshotStore:
    def __init__(self, spark: SparkSession, path: str):
        self._spark = spark
        self._path = path.rstrip("/")
        os.makedirs(self._path, exist_ok=True)

    def _manifest_path(self) -> str:
        return f"{self._path}/_MANIFEST.json"

    def _load_manifest(self) -> dict:
        try:
            with open(self._manifest_path()) as f:
                return json.load(f)
        except FileNotFoundError:
            return {"latest": -1, "versions": {}}

    def commit(
        self,
        df: DataFrame,
        partition_by: list[str] | None = None,
        metadata: dict | None = None,
    ) -> int:
        """Write ``df`` as the next version; returns the version id.

        ``metadata`` rides inside the atomically-swapped manifest entry
        — writers that need commit + bookkeeping to be ONE atomic step
        (e.g. the streaming sink's exactly-once epoch) put it here
        instead of in a separate file that could diverge on a crash."""
        m = self._load_manifest()
        version = m["latest"] + 1
        vdir = f"{self._path}/v{version}"
        w = df.write.mode("overwrite")
        if partition_by:
            w = w.partitionBy(*partition_by)
        w.parquet(vdir)
        m["versions"][str(version)] = {
            "dir": vdir,
            "committed_at": time.time(),
            "partition_by": partition_by or [],
            "metadata": metadata or {},
        }
        m["latest"] = version
        tmp = self._manifest_path() + ".tmp"
        with open(tmp, "w") as f:
            json.dump(m, f)
        os.replace(tmp, self._manifest_path())  # atomic pointer swap
        return version

    def read(self, version: int | None = None) -> DataFrame:
        m = self._load_manifest()
        v = m["latest"] if version is None else version
        info = m["versions"].get(str(v))
        if info is None:
            raise KeyError(f"no snapshot version {v} at {self._path}")
        return self._spark.read.parquet(info["dir"])

    def versions(self) -> list[int]:
        return sorted(int(v) for v in self._load_manifest()["versions"])

    def latest_version(self) -> int:
        return self._load_manifest()["latest"]

    def latest_metadata(self) -> dict:
        """Commit metadata of the newest version ({} before any commit)."""
        m = self._load_manifest()
        info = m["versions"].get(str(m["latest"]))
        return (info or {}).get("metadata") or {}

    def vacuum(self, keep_last: int = 1) -> list[int]:
        """Drop all but the newest ``keep_last`` versions (continuous
        ingestion commits one version per micro-batch — without
        retention the store grows without bound). The manifest pointer
        is swapped atomically BEFORE directories are removed, so a
        concurrent reader either sees a retained version or a clean
        KeyError, never a half-deleted directory. Returns the dropped
        version ids."""
        import shutil

        if keep_last < 1:
            raise ValueError("keep_last must be >= 1")
        m = self._load_manifest()
        keep = sorted(int(v) for v in m["versions"])[-keep_last:]
        dropped = [int(v) for v in m["versions"] if int(v) not in keep]
        if not dropped:
            return []
        dirs = [m["versions"][str(v)]["dir"] for v in dropped]
        m["versions"] = {
            str(v): m["versions"][str(v)] for v in keep
        }
        tmp = self._manifest_path() + ".tmp"
        with open(tmp, "w") as f:
            json.dump(m, f)
        os.replace(tmp, self._manifest_path())
        for d in dirs:
            shutil.rmtree(d, ignore_errors=True)
        return sorted(dropped)
