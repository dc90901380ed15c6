"""WebDataset-style tar shard sink and source (stdlib tarfile only).

WebDataset (public format: github.com/webdataset/webdataset) packs each
training sample's files into consecutive tar members sharing a key —
``<key>.txt``, ``<key>.jpg``, … — and shards the stream into
``shard-NNNNN.tar`` files that loaders read sequentially. It is the
de-facto container for multimodal training corpora because a tar
stream is seekless sequential I/O at any object-store scale.

Both directions here are fully distributed and driver-free:

- **sink**: every task writes its own shards (named by partition id +
  local counter — no coordination, no driver bottleneck) through an
  Arrow-batched ``mapInPandas``; the returned manifest DataFrame
  (shard, n_samples, n_bytes) is the action that drives the export,
  and doubles as the shard index a loader or audit job consumes.
- **source**: a DataFrame of shard paths fans out over the cluster;
  each task streams its tars and emits one row per sample key. Reading
  is a plain ``mapInPandas`` too, so predicates/projections on the
  reconstructed columns stay in Spark.

Text columns are encoded UTF-8; binary columns pass through untouched
(the multimodal ``binary`` column convention, operators/multimodal.py).

Paths here are plain ``os``/``glob`` file I/O — shared filesystem or
fuse-mounted object store; for native s3://-style URIs swap the open/
rename/list calls for the object store's SDK (the tar streaming and
the distribution shape are unchanged).
"""

from __future__ import annotations

import io
import os
import tarfile

from pyspark.sql import DataFrame, SparkSession


def _check_dot_free_cols(*col_groups: tuple[str, ...]) -> None:
    """Member names are parsed back as <key>.<col> at the LAST dot, so
    a dotted column name (e.g. 'cap.txt') would write members the
    reader silently skips — every sample vanishes with no error."""
    for cols in col_groups:
        for c in cols:
            if "." in c:
                raise ValueError(
                    f"column name {c!r} contains '.'; WebDataset member "
                    "suffixes must be dot-free (rename the column)"
                )


def write_webdataset_shards(
    df: DataFrame,
    path: str,
    key_col: str,
    text_cols: tuple[str, ...] = (),
    binary_cols: tuple[str, ...] = (),
    shard_size: int = 10_000,
) -> DataFrame:
    """Write ``df`` as WebDataset tar shards under ``path``; returns
    the shard manifest (shard, n_samples, n_bytes) — collect or save
    it to materialize the export. Keys are stringified ``key_col``
    values; each sample contributes one ``<key>.<col>`` member per
    non-null column. ``shard_size`` bounds samples per tar (the
    loader-parallelism knob, like maxRecordsPerFile for JSONL).
    Manifest n_samples counts INPUT rows; a row whose columns are all
    null contributes no members and is invisible to a reader — in
    this format a sample IS its files."""
    if not text_cols and not binary_cols:
        raise ValueError("need at least one text or binary column")
    _check_dot_free_cols(text_cols, binary_cols)
    os.makedirs(path, exist_ok=True)
    cols = [key_col, *text_cols, *binary_cols]
    proj = df.select(*cols)

    def _write(batches):
        import pandas as pd
        from pyspark import TaskContext

        ctx = TaskContext.get()
        pid = ctx.partitionId()
        # the tmp name carries the task ATTEMPT id: a speculative or
        # retried attempt running concurrently with the original would
        # otherwise write the same shard-NNNNN.tar.tmp and the rename
        # could publish an interleaved (corrupt) tar (ADVICE r6). Final
        # names stay attempt-free — whichever attempt renames last wins
        # with a complete file, matching FileOutputCommitter semantics.
        attempt = ctx.taskAttemptId()
        shard_idx = 0
        tar = None
        tar_path = None
        n = 0
        out = []

        def _open():
            nonlocal tar, tar_path, shard_idx
            tar_path = os.path.join(path, f"shard-{pid:05d}-{shard_idx:05d}.tar")
            tar = tarfile.open(f"{tar_path}.{attempt}.tmp", "w")
            shard_idx += 1

        def _close():
            nonlocal tar, n
            if tar is not None:
                tar.close()
                os.rename(f"{tar_path}.{attempt}.tmp", tar_path)  # atomic publish
                out.append((tar_path, n, os.path.getsize(tar_path)))
                tar = None
                n = 0

        def _add(name: str, payload: bytes) -> None:
            info = tarfile.TarInfo(name=name)
            info.size = len(payload)
            info.mtime = 0  # deterministic output
            tar.addfile(info, io.BytesIO(payload))

        for pdf in batches:
            for row in pdf.itertuples(index=False):
                if tar is None:
                    _open()
                key = str(getattr(row, key_col))
                if "." in key:
                    # member names are parsed back as <key>.<col> on
                    # the LAST dot — a dotted key would silently
                    # corrupt the column split on read
                    raise ValueError(
                        f"sample key {key!r} contains '.'; WebDataset "
                        "keys must be dot-free (sanitize upstream)"
                    )
                for c in text_cols:
                    v = getattr(row, c)
                    if v is not None:
                        _add(f"{key}.{c}", str(v).encode("utf-8"))
                for c in binary_cols:
                    v = getattr(row, c)
                    if v is not None:
                        _add(f"{key}.{c}", bytes(v))
                n += 1
                if n >= shard_size:
                    _close()
        _close()
        yield pd.DataFrame(out, columns=["shard", "n_samples", "n_bytes"])

    return proj.mapInPandas(
        _write, "shard string, n_samples long, n_bytes long"
    )


def read_webdataset_shards(
    spark: SparkSession,
    path: str,
    text_cols: tuple[str, ...] = (),
    binary_cols: tuple[str, ...] = (),
    key_type: str = "string",
) -> DataFrame:
    """Read WebDataset shards back into one row per sample key. The
    shard list parallelizes across the cluster (one task per ~shard);
    missing members come back null. ``key_type`` casts the key column
    (e.g. 'long' for integer ids)."""
    import glob as _glob

    _check_dot_free_cols(text_cols, binary_cols)
    shards = sorted(_glob.glob(os.path.join(path, "*.tar")))
    if not shards:
        raise FileNotFoundError(f"no .tar shards under {path}")
    paths = spark.createDataFrame([(s,) for s in shards], "shard string")
    fields = ", ".join(
        ["key string"]
        + [f"{c} string" for c in text_cols]
        + [f"{c} binary" for c in binary_cols]
    )

    def _read(batches):
        import pandas as pd

        for pdf in batches:
            rows = []
            for shard in pdf["shard"]:
                samples: dict[str, dict] = {}
                order: list[str] = []
                with tarfile.open(shard, "r") as tar:
                    for m in tar:
                        if not m.isfile() or "." not in m.name:
                            continue
                        key, col = m.name.rsplit(".", 1)
                        if col not in text_cols and col not in binary_cols:
                            continue
                        if key not in samples:
                            samples[key] = {}
                            order.append(key)
                        data = tar.extractfile(m).read()
                        samples[key][col] = (
                            data.decode("utf-8") if col in text_cols else data
                        )
                for key in order:
                    s = samples[key]
                    rows.append(
                        [key]
                        + [s.get(c) for c in text_cols]
                        + [s.get(c) for c in binary_cols]
                    )
            yield pd.DataFrame(
                rows, columns=["key", *text_cols, *binary_cols]
            )

    out = paths.repartition(min(len(shards), 64)).mapInPandas(_read, fields)
    if key_type != "string":
        from pyspark.sql import functions as F

        out = out.withColumn("key", F.col("key").cast(key_type))
    return out
