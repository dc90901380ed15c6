"""Fast pre-commit oracle subset (VERDICT r4 item 8): the flagship
index/ANN/dedup/ingest queries most likely to rotate into the driver's
CORRECTNESS sample are differentially checked against their DuckDB
oracles at sf0.01 on every test run — byte-stable before every commit,
without waiting for the full-suite sweep (tools/check_oracle.py).
"""

from __future__ import annotations

import importlib.util
from pathlib import Path

import pytest

_REPO = Path(__file__).resolve().parent.parent
_spec = importlib.util.spec_from_file_location(
    "check_oracle", _REPO / "tools" / "check_oracle.py"
)
_co = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(_co)

SF_DIR_001 = "/root/testdata/sf0.01"

FLAGSHIP = [
    "knn_grid_indexed",
    "knn_join_grid_indexed",
    "dedup_exact_summary",
    "dedup_minhash_candidates",
    "dedup_lsh_clusters",
    "dedup_jaccard_prefix_filtered",
    "stream_vector_ingest_delta",
    "curation_bloom_contamination",
    "sketch_cms_topk_bigrams",
]


@pytest.fixture(scope="module")
def oracle_con():
    import duckdb

    from lightweight_vector_database_spark.sources import TABLES

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR_001}/{t}.parquet'"
        )
    yield con
    con.close()


@pytest.mark.parametrize("name", FLAGSHIP)
def test_flagship_oracle_exact(spark, oracle_con, name):
    import __spark_entry__ as se

    qs, oracles = se.queries(), se.oracle_sql()
    assert name in qs, f"{name} missing from queries()"
    assert name in oracles, f"{name} must keep an EXACT oracle"

    sdf = qs[name](spark, SF_DIR_001)
    scols = sdf.columns
    srows = sdf.collect()

    res = oracle_con.execute(oracles[name])
    dcols = [d[0] for d in res.description]
    drows = res.fetchall()

    assert len(srows) == len(drows), f"rowcount {len(srows)} != {len(drows)}"
    assert sorted(scols) == sorted(dcols)
    sm = _co.rows_to_multiset(scols, [[r[c] for c in scols] for r in srows])
    dm = _co.rows_to_multiset(dcols, drows)
    assert sm == dm, (
        f"value mismatch; oracle-only={list((dm - sm).items())[:2]} "
        f"spark-only={list((sm - dm).items())[:2]}"
    )
