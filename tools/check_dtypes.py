"""Driver-hash risk audit: run every queries() entry and its
oracle_sql() twin, pull BOTH results into pandas (Spark ``toPandas``
vs DuckDB ``.df()``), and compare per-column dtypes plus null masks.

The driver's value-hash is dtype-sensitive at the pandas layer: a
DuckDB ``SUM(BIGINT)`` comes back HUGEINT -> float64 while Spark's
``sum(long)`` stays int64, and a NULL in an integer column flips the
whole pandas column to float64 NaN on one side only.  Either way two
value-identical results hash differently.  This tool finds every such
column so the suite can be made hash-canonical (outer CAST AS BIGINT /
COALESCE on both engines).

Usage: python tools/check_dtypes.py [sf_dir] [query_name ...]
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def _norm_dtype(dt) -> str:
    s = str(dt)
    # Timezone-aware vs naive timestamps and unit differences are
    # canonicalized by the driver's own conversion; treat all
    # datetime64 flavors as one.
    if s.startswith("datetime64"):
        return "datetime64"
    return s


def main() -> int:
    import duckdb

    import __spark_entry__ as se
    from lightweight_vector_database_spark.session import get_spark
    from lightweight_vector_database_spark.sources import TABLES

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    only = set(sys.argv[2:])

    spark = get_spark("dtype-check")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    queries = se.queries()
    oracles = se.oracle_sql()
    n_bad = 0
    for name, fn in queries.items():
        if only and name not in only:
            continue
        if name not in oracles:
            continue
        try:
            sdf = fn(spark, sf_dir).toPandas()
            odf = con.execute(oracles[name]).df()
        except Exception as e:  # noqa: BLE001
            print(f"ERROR {name}: {type(e).__name__}: {e}")
            n_bad += 1
            continue
        problems = []
        scols = sorted(sdf.columns)
        ocols = sorted(odf.columns)
        if scols != ocols:
            problems.append(f"columns spark={scols} oracle={ocols}")
        else:
            for c in scols:
                sd = _norm_dtype(sdf[c].dtype)
                od = _norm_dtype(odf[c].dtype)
                if sd != od:
                    problems.append(f"{c}: spark={sd} oracle={od}")
                sn = int(sdf[c].isna().sum())
                on = int(odf[c].isna().sum())
                if (sn > 0) != (on > 0):
                    problems.append(f"{c}: nulls spark={sn} oracle={on}")
        if problems:
            n_bad += 1
            print(f"DTYPE-MISMATCH {name}: " + "; ".join(problems))
    print(f"done: {n_bad} queries with dtype/null-mask mismatches")
    return 1 if n_bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
