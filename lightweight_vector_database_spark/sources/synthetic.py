"""Custom connector via the Spark 4 Python DataSource API: a
deterministic synthetic-vector source.

The reference has no external sources at all (in-memory only,
SURVEY.md §1.1); this is engine-surface breadth: the same API a real
connector (REST vector store, annoy/faiss dump, ...) would use.
Partition-parallel and Arrow-batched: each of ``partitions`` input
splits generates its own slice from a per-partition seed, yielding
pyarrow RecordBatches — no driver materialization and no per-row
Python, so generation scales with executor count exactly like
``tools/scale_test.py``'s inline generator.

Usage:
    spark.dataSource.register(SyntheticVectorsDataSource)
    df = (spark.read.format("synthetic_vectors")
          .option("n", 100000).option("dim", 64)
          .option("partitions", 32).option("seed", 7).load())

Determinism: rows are generated from a counter-based Philox stream
aligned to per-row block boundaries, so row ``i`` is a pure function
of (seed, i) — two reads with different ``partitions`` settings
return identical rows.
"""

from __future__ import annotations

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamReader,
    InputPartition,
)


class _Split(InputPartition):
    def __init__(self, start: int, end: int, seed: int, dim: int, n_labels: int):
        self.start, self.end = start, end
        self.seed, self.dim, self.n_labels = seed, dim, n_labels


class SyntheticVectorsReader(DataSourceReader):
    def __init__(self, options):
        self.n = int(options.get("n", 1000))
        self.dim = int(options.get("dim", 64))
        self.seed = int(options.get("seed", 42))
        self.n_parts = int(options.get("partitions", 8))
        self.n_labels = int(options.get("n_labels", 10))

    def partitions(self):
        step = -(-self.n // self.n_parts)  # ceil div
        return [
            _Split(lo, min(lo + step, self.n), self.seed, self.dim, self.n_labels)
            for lo in range(0, self.n, step)
        ]

    def read(self, partition: _Split):
        import numpy as np
        import pyarrow as pa

        lo, hi = partition.start, partition.end
        n = hi - lo
        # counter-based generation: one Philox stream keyed by the
        # global seed, jumped to this split's first row. Rows are
        # padded to whole 4-word Philox blocks so every row starts on
        # a block boundary — row content is then independent of the
        # partition layout (tested).
        padded = -(-partition.dim // 4) * 4
        rng = np.random.Generator(
            np.random.Philox(key=partition.seed, counter=lo * (padded // 4))
        )
        vecs = (
            rng.uniform(-1.0, 1.0, size=(n, padded))[:, : partition.dim]
            .astype(np.float32)
        )
        ids = np.arange(lo, hi, dtype=np.int64)
        labels = (ids % partition.n_labels).astype(np.int32)
        yield pa.RecordBatch.from_arrays(
            [
                pa.array(ids),
                pa.FixedSizeListArray.from_arrays(
                    pa.array(vecs.reshape(-1)), partition.dim
                ).cast(pa.list_(pa.float32())),
                pa.array(labels),
            ],
            names=["vec_id", "embedding", "label"],
        )


class SyntheticVectorsStreamReader(DataSourceStreamReader):
    """Micro-batch streaming over the same deterministic row space:
    offsets are row indices; each trigger advances by
    ``rows_per_batch`` until ``n`` rows have been emitted (a finite
    stream, so availableNow drains it). Row ``i`` is bit-identical to
    the batch reader's row ``i`` — stream ingest == batch load."""

    def __init__(self, options):
        self.total = int(options.get("n", 1000))
        self.per_batch = int(options.get("rows_per_batch", 100))
        self.dim = int(options.get("dim", 64))
        self.seed = int(options.get("seed", 42))
        self.n_labels = int(options.get("n_labels", 10))

    def initialOffset(self) -> dict:
        return {"row": 0}

    def latestOffset(self) -> dict:
        return {"row": self.total}

    def partitions(self, start: dict, end: dict):
        lo, hi = start["row"], min(end["row"], self.total)
        step = self.per_batch
        return [
            _Split(a, min(a + step, hi), self.seed, self.dim, self.n_labels)
            for a in range(lo, hi, step)
        ] or [_Split(lo, lo, self.seed, self.dim, self.n_labels)]

    def read(self, partition: _Split):
        yield from SyntheticVectorsReader.read(self, partition)

    def commit(self, end: dict) -> None:
        pass


class SyntheticVectorsDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "synthetic_vectors"

    def schema(self) -> str:
        return "vec_id bigint, embedding array<float>, label int"

    def reader(self, schema):
        return SyntheticVectorsReader(self.options)

    def streamReader(self, schema):
        return SyntheticVectorsStreamReader(self.options)
