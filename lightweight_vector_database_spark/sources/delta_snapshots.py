"""Delta snapshot store — append/tombstone commits instead of rewrites.

``SnapshotStore`` (snapshots.py) rewrites the WHOLE table per commit:
correct, simple, and O(table) per mutation — a scale-killer for
continuous ingestion, where each micro-batch would rewrite 100 TB.
``DeltaSnapshotStore`` keeps the same read/commit/time-travel/metadata
surface but makes mutations O(delta), the log-structured design Delta
Lake / Iceberg document publicly:

- a version is a MANIFEST entry listing (add dirs, tombstone dirs,
  metadata); committing writes ONLY the delta's files and swaps the
  manifest pointer (write-then-rename) — one atomic step, exactly
  like ``SnapshotStore``;
- ``commit_mutation(append_df, delete_ids)`` is the primitive: both
  the new rows and the tombstoned ids land in ONE manifest entry, so
  a CDC batch (delete + replace + insert) is atomic — no torn state
  visible between "rows deleted" and "replacements added";
- every add/tombstone dir carries the SEQUENCE NUMBER of the version
  that created it, and a tombstone applies only to add dirs with a
  strictly SMALLER sequence (Iceberg's sequence-number rule): an
  update that tombstones id X and appends its replacement in the same
  commit does not delete its own replacement;
- ``read(v)`` reconstructs the state lazily: add dirs grouped by
  their applicable tombstone set, one anti-join per group — Catalyst
  still pushes filters/column pruning into every parquet scan;
- ``compact()`` folds the log into one add dir (the maintenance job
  that restores scan-only reads and bounds read fan-in).

Reads pay the anti-join while tombstones exist — the classic
merge-on-read trade. Add dirs accept ``partition_by`` so cell pruning
keeps working on appended data.

Schema evolution (additive + numeric widening, the Iceberg-public
rules): an append may introduce new columns or widen an existing
numeric column within its family (int -> bigint, float -> double);
the manifest records the MERGED schema and ``read()`` aligns every
file to it (null-fill / cast-up) with a pure projection Catalyst
folds into the scan — history is never rewritten.
"""

from __future__ import annotations

import json
import os
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


# numeric widening ranks (Iceberg-style type promotion: a column may
# widen within its family — int -> bigint, float -> double — and the
# recorded schema keeps the widest type seen; reads cast per file)
_INT_RANK = {"tinyint": 1, "smallint": 2, "int": 3, "bigint": 4}
_FLOAT_RANK = {"float": 1, "double": 2}


def _promote(a, b):
    """Widest of two types within one numeric family; None if the
    pair is not promotable."""
    sa, sb = a.simpleString(), b.simpleString()
    for rank in (_INT_RANK, _FLOAT_RANK):
        if sa in rank and sb in rank:
            return a if rank[sa] >= rank[sb] else b
    return None


def _merged_schema_json(prev_json: str | None, append_df: DataFrame | None) -> str | None:
    """Union of the table's recorded schema and an append's schema,
    by field name (lakehouse schema evolution: new columns append,
    existing columns may only widen within their numeric family).
    Order: existing fields first, new fields in append order."""
    if append_df is None:
        return prev_json
    if prev_json is None:
        return append_df.schema.json()
    from pyspark.sql.types import StructField, StructType

    prev_schema = StructType.fromJson(json.loads(prev_json))
    fields = {f.name: f for f in prev_schema.fields}
    order = [f.name for f in prev_schema.fields]
    for f in append_df.schema.fields:
        old = fields.get(f.name)
        if old is None:
            fields[f.name] = f
            order.append(f.name)
        elif old.dataType != f.dataType:
            wide = _promote(old.dataType, f.dataType)
            if wide is None:
                raise ValueError(
                    f"schema evolution cannot change column {f.name!r}: "
                    f"{old.dataType.simpleString()} -> {f.dataType.simpleString()}"
                )
            fields[f.name] = StructField(f.name, wide, True)
    return StructType([fields[n] for n in order]).json()


class DeltaSnapshotStore:
    def __init__(
        self,
        spark: SparkSession,
        path: str,
        id_col: str = "vec_id",
        min_retention: int = 1,
        auto_compact_depth: int | None = None,
    ):
        """``min_retention``: the retention floor — ``vacuum`` refuses
        ``keep_last`` below it. Size it to the oldest version any CDC
        consumer may still hold (``read_changes(from_version=N)`` needs
        N retained), so maintenance can never delete a version out from
        under a reader mid-feed — the Delta Lake
        ``delta.deletedFileRetentionDuration`` contract, version-count
        flavored.

        ``auto_compact_depth`` (VERDICT r9 item 7): the store-level
        read-amplification ceiling. After any commit that leaves the
        latest version referencing MORE than this many log dirs
        (adds + tombstones — the read-path fan-in: one scan per add
        dir, one anti-join per tombstone group), the store folds the
        log itself, using the committing call's ``partition_by`` so
        the compacted layout keeps its partition pruning. None (the
        default) leaves maintenance to the caller's schedule (the
        VectorIngest ``compact_every`` cadence); set it when ARBITRARY
        CDC writers share the store and no single caller owns the
        maintenance loop — under continuous CDC the ceiling is what
        keeps read cost O(table), not O(history)."""
        self._spark = spark
        self._path = path.rstrip("/")
        self.id_col = id_col
        if min_retention < 1:
            raise ValueError("min_retention must be >= 1")
        self.min_retention = min_retention
        if auto_compact_depth is not None and auto_compact_depth < 1:
            raise ValueError("auto_compact_depth must be >= 1")
        self.auto_compact_depth = auto_compact_depth
        self._compacting = False
        os.makedirs(self._path, exist_ok=True)
        self._next_file = 0

    # -- manifest ------------------------------------------------------

    def _manifest_path(self) -> str:
        return f"{self._path}/_MANIFEST.json"

    def _load_manifest(self) -> dict:
        try:
            with open(self._manifest_path()) as f:
                return json.load(f)
        except FileNotFoundError:
            return {"latest": -1, "versions": {}}

    def _swap_manifest(self, m: dict) -> None:
        tmp = self._manifest_path() + ".tmp"
        with open(tmp, "w") as f:
            json.dump(m, f)
        os.replace(tmp, self._manifest_path())  # atomic pointer swap

    def _new_dir(self, kind: str) -> str:
        # names carry a counter + pid so a crashed write (dir exists,
        # manifest never swapped) is simply unreferenced garbage
        self._next_file += 1
        return (
            f"{self._path}/{kind}_{int(time.time() * 1000)}"
            f"_{os.getpid()}_{self._next_file}"
        )

    def _entry(self, m: dict, version: int) -> dict:
        info = m["versions"].get(str(version))
        if info is None:
            raise KeyError(f"no snapshot version {version} at {self._path}")
        return info

    # -- commits (all O(delta), one atomic pointer swap each) ----------

    def commit_mutation(
        self,
        append_df: DataFrame | None = None,
        delete_ids: DataFrame | None = None,
        partition_by: list[str] | None = None,
        metadata: dict | None = None,
        _rewrite: bool = False,
        _expected_base: int | None = None,
    ) -> int | None:
        """The commit primitive: write the delta's files, then ONE
        manifest swap covering both the appends and the tombstones.

        Sequence rule: the new files carry this version's sequence;
        the tombstone applies only to add dirs from STRICTLY earlier
        sequences, so delete+replace of the same id in one call is an
        atomic update.

        Concurrency: the heavy file writes happen OUTSIDE any claim
        (dirs are private until referenced); the version id is then
        allocated via an atomic claim file and the manifest merged
        from the FRESH latest entry, so a concurrent writer's commit
        is never dropped (no read-modify-swap lost update)."""
        if append_df is None and delete_ids is None and not _rewrite:
            raise ValueError("nothing to commit")
        new_add = new_tomb = None
        if append_df is not None:
            new_add = self._new_dir("add")
            w = append_df.write.mode("overwrite")
            if partition_by:
                w = w.partitionBy(*partition_by)
            w.parquet(new_add)
        if delete_ids is not None:
            new_tomb = self._new_dir("tomb")
            delete_ids.select(F.col(self.id_col)).distinct().write.mode(
                "overwrite"
            ).parquet(new_tomb)

        while True:
            version, m, claim, token = self._claim_version()
            if _expected_base is not None and m["latest"] != _expected_base:
                # conditional commit (compaction): the log advanced
                # under us — folding the stale read would drop the
                # concurrent commit's rows. Abort; caller re-reads.
                self._release_claim(claim, token)
                return None
            try:
                if _rewrite or m["latest"] < 0:
                    prev = {
                        "adds": [],
                        "tombstones": [],
                        # an explicit rewrite with data REPLACES the
                        # schema (the one way to retype or drop a
                        # column); a data-less rewrite (truncate) keeps
                        # the table's schema so it stays readable
                        "schema": (
                            self._entry(m, m["latest"]).get("schema")
                            if m["latest"] >= 0 and append_df is None
                            else None
                        ),
                    }
                else:
                    prev = self._entry(m, m["latest"])
                # recorded so a version whose log holds only tombstone
                # dirs (pure delete) stays readable as an empty table;
                # MERGED with the previous schema so appends may evolve
                # the table (add columns) without rewriting history —
                # read() null-fills old files (see _align). May raise
                # on an incompatible evolution — inside the try so the
                # claim is released rather than leaked (a leaked claim
                # stalls every writer for STALE_CLAIM_SECONDS).
                new_schema = _merged_schema_json(prev.get("schema"), append_df)
            except Exception:
                self._release_claim(claim, token)
                raise
            adds = [list(x) for x in prev["adds"]]
            tombs = [list(x) for x in prev["tombstones"]]
            if new_add is not None:
                adds.append([new_add, version])
            if new_tomb is not None:
                tombs.append([new_tomb, version])
            m["versions"][str(version)] = {
                "adds": adds,
                "tombstones": tombs,
                "committed_at": time.time(),
                "metadata": metadata or {},
                "schema": new_schema,
                # rewrites (compaction/truncate) restate the table
                # without log-level row identity — the change feed
                # refuses to cross them (read_changes)
                "rewrite": bool(_rewrite),
            }
            m["latest"] = version
            if partition_by:
                # the table's established layout, remembered so a
                # maintenance fold triggered by a partition-LESS commit
                # (e.g. a tombstone-only commit_delete) preserves it —
                # an unpartitioned auto-compaction would silently strip
                # the cell layout every serving scan prunes on
                m["partition_by"] = list(partition_by)
            # last-moment ownership re-check: if a peer broke our claim
            # as "stale" (we stalled past STALE_CLAIM_SECONDS mid-merge)
            # another writer may own this version now — swapping our
            # merge would silently overwrite theirs. Abort and redo the
            # whole claim+merge against the fresh manifest instead.
            if not self._claim_is_ours(claim, token):
                del m["versions"][str(version)]
                continue
            self._swap_manifest(m)
            self._release_claim(claim, token)
            # store-level auto-compaction (see __init__): fold when the
            # committed version's read fan-in crossed the ceiling. The
            # guard flag breaks recursion (compact() commits through
            # this same primitive; its fold is 1 add dir anyway).
            if (
                self.auto_compact_depth is not None
                and not self._compacting
                and not _rewrite
                and len(adds) + len(tombs) > self.auto_compact_depth
            ):
                self._compacting = True
                try:
                    # fall back to the table's remembered layout: the
                    # TRIGGERING commit may be partition-less (a pure
                    # delete), and folding unpartitioned would destroy
                    # the pruning layout earlier commits established
                    self.compact(
                        partition_by=partition_by
                        or m.get("partition_by")
                    )
                finally:
                    self._compacting = False
            return version

    # A claim file older than this is treated as a dead writer's
    # leftover (crashed between claim and swap) and broken by the next
    # writer. HAZARD: a slow-but-ALIVE writer stalled past this long
    # (GC pause, Spark stall) also gets its claim broken — it detects
    # that via the ownership token re-check immediately before its
    # manifest swap and redoes the commit instead of overwriting the
    # breaker's. Tune UP for environments with long stop-the-world
    # pauses; the only cost of a larger value is slower takeover from
    # genuinely crashed writers.
    STALE_CLAIM_SECONDS = 60.0

    def _claim_version(self) -> tuple[int, dict, str, str]:
        """Allocate the next version id by atomically creating its
        claim file (O_EXCL — the local-FS analogue of a table format's
        put-if-absent commit). Exactly one writer wins each version;
        losers re-read the manifest and retry against the winner's
        entry. The claim file body is an ownership token: breaking a
        stale claim recreates the file with a DIFFERENT token, which is
        how the original (slow, not dead) writer later detects the
        takeover and aborts instead of double-committing."""
        while True:
            m = self._load_manifest()
            version = m["latest"] + 1
            claim = f"{self._path}/_claim_v{version}"
            token = f"{os.getpid()}_{id(self)}_{time.time_ns()}"
            try:
                fd = os.open(claim, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
                try:
                    os.write(fd, token.encode())
                finally:
                    os.close(fd)
                # re-validate UNDER the claim: if someone committed this
                # version between our manifest read and the claim (and
                # already cleaned their claim file), ours is stale
                m = self._load_manifest()
                if m["latest"] != version - 1:
                    self._release_claim(claim, token)
                    continue
                return version, m, claim, token
            except FileExistsError:
                try:
                    age = time.time() - os.path.getmtime(claim)
                except FileNotFoundError:
                    continue  # winner just swapped + cleaned; re-read
                if age > self.STALE_CLAIM_SECONDS:
                    try:
                        os.remove(claim)  # break the dead writer's claim
                    except FileNotFoundError:
                        pass
                    continue
                time.sleep(0.05)  # live writer mid-swap; wait it out

    def _claim_is_ours(self, claim: str, token: str) -> bool:
        try:
            with open(claim) as f:
                return f.read() == token
        except OSError:
            return False

    def _release_claim(self, claim: str, token: str) -> None:
        # remove only OUR claim file — after a stale-claim takeover the
        # same path holds the breaker's token, and removing it would
        # break the breaker's claim in turn
        if self._claim_is_ours(claim, token):
            try:
                os.remove(claim)
            except FileNotFoundError:
                pass

    def commit_full(
        self,
        df: DataFrame,
        partition_by: list[str] | None = None,
        metadata: dict | None = None,
    ) -> int:
        """Base snapshot / explicit rewrite: one add dir, empty log."""
        return self.commit_mutation(
            append_df=df, partition_by=partition_by, metadata=metadata,
            _rewrite=True,
        )

    def commit_append(
        self,
        df: DataFrame,
        partition_by: list[str] | None = None,
        metadata: dict | None = None,
        strict: bool = False,
    ) -> int:
        """Append ONLY ``df``'s rows — O(batch), never O(table).

        ``strict=True`` additionally requires the append to supply
        EVERY column of the recorded schema (Delta/Iceberg behavior):
        by default a writer bug that drops a column becomes silent
        nulls on read (old columns are null-filled by _align), which
        strict mode turns into a commit-time error instead. New columns
        are still allowed either way (schema evolution)."""
        if strict:
            sj = None
            m = self._load_manifest()
            if m["latest"] >= 0:
                sj = self._entry(m, m["latest"]).get("schema")
            if sj:
                from pyspark.sql.types import StructType

                recorded = {f.name for f in StructType.fromJson(json.loads(sj))}
                missing = recorded - {f.name for f in df.schema.fields}
                if missing:
                    raise ValueError(
                        f"strict append is missing recorded column(s) "
                        f"{sorted(missing)} — they would read back as "
                        "silent nulls"
                    )
        return self.commit_mutation(
            append_df=df, partition_by=partition_by, metadata=metadata
        )

    def commit_delete(self, ids: DataFrame, metadata: dict | None = None) -> int:
        """Logical delete: write ONLY the id set as a tombstone dir."""
        if self.latest_version() < 0:
            # a first-ever pure delete would create a version with no
            # data files AND no recorded schema — unreadable forever
            raise ValueError(
                "cannot delete from an empty store (no schema recorded "
                "yet) — commit data first"
            )
        return self.commit_mutation(delete_ids=ids, metadata=metadata)

    # -- reads ---------------------------------------------------------

    def read(self, version: int | None = None) -> DataFrame:
        m = self._load_manifest()
        v = m["latest"] if version is None else version
        info = self._entry(m, v)
        if not info["adds"]:
            # a version whose log is pure tombstones (e.g. the store's
            # first commit was a delete) is an EMPTY table, not an
            # error — serve it from the recorded schema
            sj = info.get("schema")
            if sj:
                from pyspark.sql.types import StructType

                return self._spark.createDataFrame(
                    [], StructType.fromJson(json.loads(sj))
                )
            raise KeyError(
                f"version {v} has no data files and no recorded schema "
                "(store created by an older writer?)"
            )
        # group add dirs by the tombstone set that applies to them
        # (tombs with seq STRICTLY greater); at most one anti-join per
        # group keeps the plan small — in the common ingest workload
        # tombstones are rare, so typically zero or one anti-join.
        # add dirs are read one relation each (each is its own
        # partitioned root, so a single multi-path scan would fail
        # partition discovery); compaction bounds the union fan-in.
        tombs = info["tombstones"]
        groups: dict[tuple, list[str]] = {}
        for d, seq in info["adds"]:
            applicable = tuple(td for td, ts in tombs if ts > seq)
            groups.setdefault(applicable, []).append(d)

        # schema evolution: files written before a column existed are
        # null-filled and every part is aligned to the recorded merged
        # schema (a pure projection Catalyst folds into the scan)
        target = None
        if info.get("schema"):
            from pyspark.sql.types import StructType

            target = StructType.fromJson(json.loads(info["schema"]))

        def _align(df: DataFrame) -> DataFrame:
            return self._align_df(df, target)

        parts: list[DataFrame] = []
        for applicable, dirs in groups.items():
            adds = [_align(self._spark.read.parquet(d)) for d in dirs]
            df = adds[0]
            for a in adds[1:]:
                df = df.unionByName(a)
            if applicable:
                # tombstone dirs are flat (no partitioning), but may
                # have been written under DIFFERENT physical id types
                # (schema evolution widened id_col, e.g. int->bigint):
                # a single multi-path scan would make the anti-join key
                # type depend on whichever file's schema the reader
                # picks. Read per-dir and align each to the recorded id
                # type instead; the unions are trivial (id-only rows).
                id_type = None
                if target is not None:
                    for f in target.fields:
                        if f.name == self.id_col:
                            id_type = f.dataType
                tparts = []
                for td in applicable:
                    t = self._spark.read.parquet(td).select(self.id_col)
                    if id_type is not None and t.schema[0].dataType != id_type:
                        t = t.select(
                            F.col(self.id_col).cast(id_type).alias(self.id_col)
                        )
                    tparts.append(t)
                t = tparts[0]
                for extra in tparts[1:]:
                    t = t.unionByName(extra)
                df = df.join(t, self.id_col, "left_anti")
            parts.append(df)
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        return out

    @staticmethod
    def _align_df(df: DataFrame, target) -> DataFrame:
        """Project ``df`` onto the recorded ``target`` schema:
        null-fill columns that did not exist yet, cast-up columns
        written before they widened. Pure projection — Catalyst folds
        it into the scan."""
        if target is None or df.schema == target:
            return df
        have = {f.name: f.dataType for f in df.schema.fields}
        cols = []
        for f in target.fields:
            dt = have.get(f.name)
            if dt is None:
                cols.append(F.lit(None).cast(f.dataType).alias(f.name))
            elif dt != f.dataType:
                cols.append(F.col(f.name).cast(f.dataType).alias(f.name))
            else:
                cols.append(F.col(f.name))
        return df.select(*cols)

    def read_changes(
        self, from_version: int, to_version: int | None = None
    ) -> DataFrame:
        """CDC change feed: the NET row changes in
        ``(from_version, to_version]``, as full rows plus
        ``_change_type`` ('insert' | 'delete') and ``_commit_version``
        (the sequence that added / first tombstoned the row). The
        Delta-Lake table_changes / Iceberg incremental-read surface.

        Log-based, O(delta) on the insert side: only add/tombstone
        dirs COMMITTED IN THE RANGE are read; a row added then
        tombstoned inside the range nets out via the same
        sequence-rule anti-join ``read`` uses. The delete side emits
        preimages, which requires reading the ``from_version`` state
        once — but joined against the (broadcast-small) tombstoned-id
        set, so the table scan never shuffles. A same-id delete +
        re-insert in the range appears as both (an update pair).

        Raises if the range crosses a rewrite (compaction/truncate):
        a rewrite restates the table without row-level log identity,
        so the feed cannot be derived — diff ``read(v1)`` against
        ``read(v2)`` instead, or read changes up to the rewrite and
        from it separately. Vacuumed versions raise KeyError as usual
        (CDC needs retained history, same as Delta's CDF).
        """
        m = self._load_manifest()
        v2 = m["latest"] if to_version is None else to_version
        v1 = from_version
        if v1 > v2:
            raise ValueError(f"from_version {v1} > to_version {v2}")
        if v1 >= 0:
            # must be a RETAINED version (not vacuumed, not arbitrary)
            # — a made-up from_version would silently mis-slice the
            # range instead of erroring
            self._entry(m, v1)
        info2 = self._entry(m, v2)
        for v in range(v1 + 1, v2 + 1):
            e = self._entry(m, v)
            if "rewrite" not in e:
                # manifest written by a pre-rewrite-tracking writer:
                # whether this version restated the table is UNKNOWN,
                # and defaulting to "not a rewrite" would silently
                # cross a legacy compaction and emit a wrong feed —
                # refuse instead (ADVICE r6)
                raise ValueError(
                    f"version {v} predates rewrite tracking (legacy "
                    "manifest, no 'rewrite' flag); cannot prove the "
                    "change feed does not cross a compaction — diff "
                    "read() states around it instead, or recommit the "
                    "version with a current writer"
                )
            if e["rewrite"]:
                raise ValueError(
                    f"version {v} is a rewrite (compaction/truncate); "
                    "the change feed cannot cross it — diff read() "
                    "states around it instead"
                )

        from pyspark.sql.types import StructType

        target = (
            StructType.fromJson(json.loads(info2["schema"]))
            if info2.get("schema")
            else None
        )
        id_type = None
        if target is not None:
            for f in target.fields:
                if f.name == self.id_col:
                    id_type = f.dataType

        def _tag(df: DataFrame, kind: str, seq) -> DataFrame:
            return df.withColumn("_change_type", F.lit(kind)).withColumn(
                "_commit_version", F.lit(seq).cast("long")
            )

        new_adds = [(d, s) for d, s in info2["adds"] if v1 < s <= v2]
        new_tombs = [(d, s) for d, s in info2["tombstones"] if v1 < s <= v2]

        def _tomb_ids(dirs: list[tuple[str, int]]) -> DataFrame | None:
            parts = []
            for td, ts in dirs:
                t = self._spark.read.parquet(td).select(self.id_col)
                if id_type is not None and t.schema[0].dataType != id_type:
                    t = t.select(
                        F.col(self.id_col).cast(id_type).alias(self.id_col)
                    )
                parts.append(t.withColumn("__seq", F.lit(ts).cast("long")))
            if not parts:
                return None
            out = parts[0]
            for p in parts[1:]:
                out = out.unionByName(p)
            return out

        pieces: list[DataFrame] = []
        # insert side: range adds, minus range tombstones with a
        # strictly greater sequence (read()'s rule — a commit never
        # deletes its own replacement). The tombstone relation is
        # built ONCE per distinct applicable set (read()'s grouping),
        # not once per add dir — O(adds x tombs) scans otherwise.
        tomb_memo: dict[tuple, DataFrame | None] = {}
        for d, seq in new_adds:
            df = self._align_df(self._spark.read.parquet(d), target)
            key = tuple(td for td, ts in new_tombs if ts > seq)
            if key not in tomb_memo:
                rel = _tomb_ids([(td, ts) for td, ts in new_tombs if ts > seq])
                tomb_memo[key] = (
                    None if rel is None
                    else rel.select(self.id_col).distinct()
                )
            applicable = tomb_memo[key]
            if applicable is not None:
                df = df.join(
                    F.broadcast(applicable), self.id_col, "left_anti"
                )
            pieces.append(_tag(df, "insert", seq))

        # delete side: from_version rows whose id was tombstoned in
        # the range (every range tombstone's sequence exceeds every
        # from_version add's), attributed to the FIRST tombstone
        tombs = _tomb_ids(new_tombs)
        if tombs is not None and v1 >= 0:
            first = tombs.groupBy(self.id_col).agg(
                F.min("__seq").alias("_commit_version")
            )
            pre = self._align_df(self.read(v1), target)
            deleted = pre.join(F.broadcast(first), self.id_col)
            pieces.append(
                deleted.withColumn("_change_type", F.lit("delete")).select(
                    *[f.name for f in pre.schema.fields],
                    "_change_type",
                    "_commit_version",
                )
            )

        if not pieces:
            empty_base = self.read(v2).limit(0)
            return _tag(empty_base, "insert", -1).limit(0)
        out = pieces[0]
        for p in pieces[1:]:
            out = out.unionByName(p)
        return out

    def versions(self) -> list[int]:
        return sorted(int(v) for v in self._load_manifest()["versions"])

    def latest_version(self) -> int:
        return self._load_manifest()["latest"]

    def latest_metadata(self) -> dict:
        m = self._load_manifest()
        if m["latest"] < 0:
            return {}
        return self._entry(m, m["latest"]).get("metadata") or {}

    # -- maintenance ---------------------------------------------------

    def log_depth(self) -> tuple[int, int]:
        """(n_add_dirs, n_tombstone_dirs) of the latest version — the
        compaction trigger signal."""
        m = self._load_manifest()
        if m["latest"] < 0:
            return (0, 0)
        info = self._entry(m, m["latest"])
        return (len(info["adds"]), len(info["tombstones"]))

    def compact(
        self,
        partition_by: list[str] | None = None,
        metadata: dict | None = None,
        cluster_by=None,
        num_files: int | None = None,
    ) -> int:
        """Fold the log into one add dir (same visible rows, scan-only
        reads again). The one intentionally O(table) operation — run on
        the maintenance schedule, not per batch.

        ``cluster_by`` (a Column, e.g. a Morton code from
        sources/layout.py) additionally range-partitions the fold into
        ``num_files`` sorted files on that key — the OPTIMIZE ZORDER
        maintenance move: per-batch appends land unclustered and
        erode file-stat pruning; the clustered fold restores tight
        min/max footers in every interleaved dimension. The cluster
        key is evaluated during the rewrite only, not stored (pass it
        as a real column in your appends if the read path filters on
        it).

        Safe against concurrent commits: the fold is a CONDITIONAL
        rewrite on the base version it read — if the log advanced while
        the compacted data was being written, the commit aborts and the
        fold retries from the new tip (a concurrent append's rows can
        never be dropped)."""
        while True:
            base = self.latest_version()
            current = self.read(base)
            if cluster_by is not None:
                cols = [f.name for f in current.schema.fields]
                # pick a key name no existing column can collide with
                # (withColumn would silently REPLACE a user column)
                ckey = "__cluster"
                while ckey in cols:
                    ckey += "_"
                clustered = current.withColumn(ckey, cluster_by)
                clustered = clustered.repartitionByRange(
                    num_files or 32, ckey
                ).sortWithinPartitions(ckey)
                current = clustered.select(*cols)
            meta = metadata if metadata is not None else self.latest_metadata()
            v = self.commit_mutation(
                append_df=current, partition_by=partition_by, metadata=meta,
                _rewrite=True, _expected_base=base,
            )
            if v is not None:
                return v

    def vacuum(self, keep_last: int = 1) -> list[int]:
        """Drop old versions; physical dirs are removed only when no
        retained version references them (dirs are shared across the
        log). Pointer swap happens BEFORE any rmtree, same contract as
        SnapshotStore.vacuum.

        Serializes with commits through the SAME claim protocol they
        use: vacuum holds the claim for the next version while it swaps
        (so no commit can land between its manifest read and swap — the
        read-modify-swap lost-update hazard), but does NOT consume the
        version number (``latest`` is unchanged; the next committer
        claims the same id afresh)."""
        import shutil

        if keep_last < 1:
            raise ValueError("keep_last must be >= 1")
        if keep_last < self.min_retention:
            raise ValueError(
                f"keep_last={keep_last} is below this store's retention "
                f"floor min_retention={self.min_retention}; a CDC consumer "
                "may still hold a version inside the floor — raise "
                "keep_last or construct the store with a lower "
                "min_retention if no consumer depends on it"
            )
        _version, m, claim, token = self._claim_version()
        try:
            keep = sorted(int(v) for v in m["versions"])[-keep_last:]
            dropped = [int(v) for v in m["versions"] if int(v) not in keep]
            if not dropped:
                return []
            referenced: set[str] = set()
            for v in keep:
                info = m["versions"][str(v)]
                referenced.update(d for d, _ in info["adds"])
                referenced.update(d for d, _ in info["tombstones"])
            removable: set[str] = set()
            for v in dropped:
                info = m["versions"][str(v)]
                removable.update(d for d, _ in info["adds"])
                removable.update(d for d, _ in info["tombstones"])
            removable -= referenced
            m["versions"] = {str(v): m["versions"][str(v)] for v in keep}
            if not self._claim_is_ours(claim, token):
                # claim broken mid-vacuum (we stalled); a commit may be
                # merging from the pre-vacuum manifest — swapping now
                # could erase it. Retry against the fresh state.
                return self.vacuum(keep_last)
            self._swap_manifest(m)
        finally:
            self._release_claim(claim, token)
        for d in removable:
            shutil.rmtree(d, ignore_errors=True)
        return sorted(dropped)
