"""Run any suite query by name and print its result (debug/demo CLI).

Usage:
  python tools/run_query.py <query_name> [sf_dir] [--explain] [--limit N]
  python tools/run_query.py --list
"""

from __future__ import annotations

import sys

from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> int:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    flags = {a for a in sys.argv[1:] if a.startswith("--")}
    limit = 20
    for a in sys.argv[1:]:
        if a.startswith("--limit="):
            limit = int(a.split("=", 1)[1])

    import __spark_entry__ as se

    qs = se.queries()
    if "--list" in flags or not args:
        oracles = se.oracle_sql()
        for name in qs:
            print(f"{name}{'' if name in oracles else '  (rows-only)'}")
        return 0

    name = args[0]
    sf_dir = args[1] if len(args) > 1 else "/root/testdata/sf0.01"
    if name not in qs:
        print(f"unknown query {name!r}; use --list")
        return 1

    from lightweight_vector_database_spark.session import get_spark

    spark = get_spark("run-query")
    spark.sparkContext.setLogLevel("ERROR")
    df = qs[name](spark, sf_dir)
    if "--explain" in flags:
        df.explain("formatted")
    df.show(limit, truncate=False)
    print(f"({df.count()} rows total)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
