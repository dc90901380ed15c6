"""Synthesize an sf1-scale fixture (10x sf0.1) for the linearity probe.

The driver provides sf0.001/0.01/0.1 only (TESTDATA.md; /root/testdata
is read-only), but the 100 TB story needs evidence that the headline
queries scale LINEARLY — so this builds a 10x dataset by key-shifted
replication of sf0.1 into ``<repo>/.sf1_data`` (gitignored):

- every scaled table is unioned 10x with its PRIMARY KEY offset by
  copy_index * (max_key + 1); foreign keys get the SAME offset, so
  join fan-outs per row are IDENTICAL to sf0.1 (a join that matched k
  rows still matches k — the workload scales, the selectivity doesn't);
- nation/region stay fixed (TPC-H semantics: dimension tables don't
  scale);
- document text gets a per-copy suffix token so exact/near-dup density
  does not artificially multiply (10 identical copies of every doc
  would turn the dedup queries into a different workload);
- events keep their timestamps (window populations scale 10x) but
  user_id is offset (user cardinality scales like a real corpus).

Deterministic: pure column arithmetic on the driver's seed=42 data.

Usage: python tools/make_sf1.py [out_dir] [copies=10]
"""

from __future__ import annotations

import os
import sys

from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F

from lightweight_vector_database_spark.session import get_spark

SRC = "/root/testdata/sf0.1"
COPIES = 10

# table -> columns needing the per-copy key offset (col -> offset key
# domain). Offsets use the MAX of the key's own domain so every copy's
# ids are disjoint.
KEYED = {
    "orders": {"o_orderkey": "o_orderkey", "o_custkey": "c_custkey"},
    "customer": {"c_custkey": "c_custkey"},
    "supplier": {"s_suppkey": "s_suppkey"},
    "part": {"p_partkey": "p_partkey"},
    "lineitem": {
        "l_orderkey": "o_orderkey",
        "l_partkey": "p_partkey",
        "l_suppkey": "s_suppkey",
    },
    "events": {"event_id": "event_id", "user_id": "user_id"},
    "documents": {"doc_id": "doc_id"},
    "embeddings": {"vec_id": "vec_id"},
}

DOMAIN_TABLE = {
    "o_orderkey": "orders",
    "c_custkey": "customer",
    "s_suppkey": "supplier",
    "p_partkey": "part",
    "event_id": "events",
    "user_id": "events",
    "doc_id": "documents",
    "vec_id": "embeddings",
}


def main() -> None:
    out = sys.argv[1] if len(sys.argv) > 1 else str(
        Path(__file__).resolve().parent.parent / ".sf1_data"
    )
    copies = int(sys.argv[2]) if len(sys.argv) > 2 else COPIES
    os.makedirs(out, exist_ok=True)
    spark = get_spark("make-sf1")
    spark.sparkContext.setLogLevel("ERROR")

    # key domains (max + 1 per key column)
    spans: dict[str, int] = {}
    for key, table in DOMAIN_TABLE.items():
        df = spark.read.parquet(f"{SRC}/{table}.parquet")
        spans[key] = int(df.agg(F.max(key)).first()[0]) + 1

    for t in ("region", "nation"):
        spark.read.parquet(f"{SRC}/{t}.parquet").write.mode(
            "overwrite"
        ).parquet(f"{out}/{t}.parquet")
        print(f"{t}: copied (dimension, unscaled)")

    for t, keys in KEYED.items():
        base = spark.read.parquet(f"{SRC}/{t}.parquet")
        parts = []
        for i in range(copies):
            c = base
            for col, dom in keys.items():
                c = c.withColumn(
                    col, (F.col(col) + F.lit(i * spans[dom])).cast("long")
                )
            if t == "documents" and i > 0:
                # distinct text per copy: near-dup structure stays
                # sf0.1-like instead of every doc gaining 9 exact twins
                c = c.withColumn(
                    "text", F.concat(F.col("text"), F.lit(f" copytag{i}"))
                ).withColumn("n_chars", F.length("text").cast("int"))
            parts.append(c)
        u = parts[0]
        for p in parts[1:]:
            u = u.unionByName(p)
        u.write.mode("overwrite").parquet(f"{out}/{t}.parquet")
        print(f"{t}: {u.count()} rows")


if __name__ == "__main__":
    main()
