"""The driver-facing contract (__spark_entry__.py): entry() smoke,
registry/oracle key integrity, callable signatures."""

from __future__ import annotations

import inspect

import __spark_entry__ as se


def test_registry_and_oracle_keys_consistent():
    q = se.queries()
    o = se.oracle_sql()
    assert len(q) >= 137
    assert set(o) <= set(q), "oracle entries must match a registered query"
    assert all(isinstance(k, str) and k for k in q)
    assert all(isinstance(v, str) and v.strip() for v in o.values())


def test_query_callables_take_spark_and_sf_dir():
    for name, fn in se.queries().items():
        params = [
            p
            for p in inspect.signature(fn).parameters.values()
            if p.default is inspect.Parameter.empty
            and p.kind
            in (
                inspect.Parameter.POSITIONAL_ONLY,
                inspect.Parameter.POSITIONAL_OR_KEYWORD,
            )
        ]
        assert len(params) == 2, f"{name} must take (spark, sf_dir)"


def test_entry_smoke(spark):
    df = se.entry(spark)
    assert df.schema.simpleString() == (
        "struct<vec_id:bigint,label:int,dist:double>"
    )
    rows = df.collect()
    assert len(rows) == 10
    dists = [r.dist for r in rows]
    assert dists == sorted(dists)


def test_loaded_tables_have_normalized_types(spark, sf_dir):
    # environment-drift guard: the fixture parquet's physical types have
    # drifted across rounds (TIMESTAMP(NANOS) -> TIMESTAMP_NTZ micros);
    # load_table is the single choke point that must absorb any future
    # drift. Pin the normalized schema every query depends on.
    from lightweight_vector_database_spark.sources import load_all

    tables = load_all(spark, sf_dir)
    assert dict(tables["events"].dtypes)["ts"] == "timestamp"
    assert dict(tables["embeddings"].dtypes)["embedding"] == "array<float>"
    assert dict(tables["documents"].dtypes)["text"] == "string"
    # the fixture stores TPC-H dates as naive timestamps; DuckDB reads
    # the same parquet the same way, so queries compare them as
    # timestamps on both sides — pin that shared contract (a drift to
    # date or string would silently skew every date filter)
    assert dict(tables["orders"].dtypes)["o_orderdate"] in (
        "timestamp_ntz", "timestamp", "date"
    )
    assert dict(tables["lineitem"].dtypes)["l_shipdate"] in (
        "timestamp_ntz", "timestamp", "date"
    )


def test_quadratic_baselines_flagged_in_registry():
    """VERDICT r7 item 4: the sf>=1 sweep quarantine lives in the
    registry (register(..., quadratic_baseline=...)), not in a
    hand-maintained tools dict. Every all-pairs exact baseline must
    either be flagged, or be proven to scale by the recorded sf1
    breadth sweep — a *_pairs anchor that is neither would silently
    hang the next sweep."""
    import json
    from pathlib import Path

    from lightweight_vector_database_spark.suite import QUADRATIC, QUERIES

    assert set(QUADRATIC) <= set(QUERIES)
    for name in (
        "dedup_jaccard_pairs",
        "dedup_ngram3_jaccard_pairs",
        "embedding_nearest_pairs",
        "dedup_connected_clusters",
        "embedding_srp_pairs",
        "dedup_lsh_quality",
        "dedup_semantic_pairs",
        "dedup_semantic_drop",
    ):
        assert name in QUADRATIC and QUADRATIC[name], name

    scale_all = Path(__file__).resolve().parent.parent / "SCALE_ALL_sf1.json"
    if scale_all.exists():
        recorded = json.loads(scale_all.read_text())["queries"]
        for name in QUERIES:
            if "pairs" not in name or name in QUADRATIC:
                continue
            status = recorded.get(name, {}).get("status")
            assert status in (None, "OK"), (
                f"{name} is an unflagged pairs query that did not "
                f"complete the sf1 sweep ({status}) — flag it with "
                "quadratic_baseline or fix its scale path"
            )
        # VERDICT r8 item 2: "completed sf1" is not enough — a
        # quadratic anchor can complete sf1 slowly and still dominate
        # every sf>=3 sweep (dedup_semantic_pairs: 205.8s at sf1,
        # 2120.3s at sf3). Any query whose RECORDED sf1 wall exceeds
        # the budget must be flagged quadratic (and thereby name its
        # registered scale twin) so bigger sweeps skip it.
        sf1_budget_sec = 100.0
        for name, rec in recorded.items():
            if name in QUADRATIC or name not in QUERIES:
                continue
            sec = rec.get("sec")
            assert sec is None or sec <= sf1_budget_sec, (
                f"{name} took {sec}s at sf1 (> {sf1_budget_sec}s) and "
                "is not flagged quadratic_baseline — flag it (naming "
                "its scale twin) or fix its plan"
            )

    # VERDICT r9 item 2: the sf1 wall alone lets a quadratic slip under
    # the bar (dedup_containment_pairs: 89.7s at sf1 — under budget —
    # but 7.8x at 3x data). Reject unflagged SUPER-LINEAR growth across
    # the recorded sf points: at 3x data a linear query should grow
    # ~3x; >4.5x with a non-trivial sf3 wall means the plan has an
    # all-pairs term and must be flagged (naming its scale twin).
    sf3_path = Path(__file__).resolve().parent.parent / "SCALE_ALL_sf3.json"
    if scale_all.exists() and sf3_path.exists():
        rec1 = json.loads(scale_all.read_text())["queries"]
        rec3 = json.loads(sf3_path.read_text())["queries"]
        growth_cap = 4.5       # 1.5x superlinear margin over the 3x data
        sf3_floor_sec = 60.0   # ignore sub-minute walls (warm-up noise)
        for name, r3 in rec3.items():
            if name in QUADRATIC or name not in QUERIES:
                continue
            s1 = rec1.get(name, {}).get("sec")
            s3 = r3.get("sec")
            if not s1 or not s3 or s3 <= sf3_floor_sec:
                continue
            assert s3 / s1 <= growth_cap, (
                f"{name} grew {s3 / s1:.1f}x from sf1 ({s1:.1f}s) to sf3 "
                f"({s3:.1f}s) — super-linear and unflagged; add "
                "quadratic_baseline naming its scale twin or fix the plan"
            )
