"""k-nearest-neighbor operators, Spark-first.

Reference semantics (kd_tree_database.py:285-304, SURVEY.md §2A.5),
all preserved here:

- metadata filter applies BEFORE top-k ("k nearest matching", not
  "matching among k nearest") — kd_tree_database.py:186-190;
- returns min(k, matching rows), sorted ascending by distance;
- distances in the metric's native units (squared for the default
  Euclidean metric);
- ties broken by id (the reference leaves tie order unspecified; we
  make it total so results are deterministic and oracle-comparable).

Physical plan notes:
- ``knn`` compiles to filter → codegen'd distance expression →
  ``TakeOrderedAndProject`` (ORDER BY dist LIMIT k): no full sort, no
  wide shuffle — each task keeps a k-heap, driver merges. This scales
  to any base-table size.
- ``knn_join`` broadcasts the (small) probe set against the base table
  so the base is never shuffled for the join itself. Two top-k
  strategies:
  * ``window``  — global Window.partitionBy(probe).orderBy(dist):
    simple, but shuffles |base| x |probes| rows. Fine for small data.
  * ``partial`` — per-input-partition top-k (Arrow-batched
    mapInPandas, a pure reduction: each partition emits at most
    k x |probes| rows) followed by the window on the reduced set.
    At 100 TB this is the only viable plan: shuffle volume drops from
    |base| x |probes| to (#partitions x k x |probes|).
"""

from __future__ import annotations

from collections.abc import Iterator, Sequence

import numpy as np
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..functions.distance import metric_expr


def knn(
    df: DataFrame,
    probe: Sequence[float],
    k: int,
    metric: str = "euclidean_sq",
    pred: Column | None = None,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    dist_col: str = "dist",
    **metric_kwargs,
) -> DataFrame:
    """k nearest rows to ``probe``; reference find_k_nearest_neighbors
    (database.py:31-48) as a declarative plan."""
    if pred is not None:
        df = df.filter(pred)  # filter-before-topk, kd_tree_database.py:186-190
    dist = metric_expr(metric, vec_col, list(probe), **metric_kwargs)
    # dimension guard: zip_with silently null-pads mismatched arrays,
    # which would sort nulls FIRST and return garbage neighbors. Fail
    # loudly instead (the reference asserts dims at insert; queries
    # here must assert at read). assert_true returns NULL on success.
    guard = F.assert_true(
        F.size(F.col(vec_col)) == len(list(probe)),
        F.concat(
            F.lit(f"probe dim {len(list(probe))} != vector dim "),
            F.size(F.col(vec_col)).cast("string"),
        ),
    )
    scored = df.withColumn(dist_col, F.when(guard.isNull(), dist))
    # ORDER BY + LIMIT plans as TakeOrderedAndProject (per-task k-heap).
    return scored.orderBy(F.col(dist_col).asc(), F.col(id_col).asc()).limit(k)


def radius_search(
    df: DataFrame,
    probe: Sequence[float],
    radius: float,
    metric: str = "euclidean_sq",
    pred: Column | None = None,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    dist_col: str = "dist",
    **metric_kwargs,
) -> DataFrame:
    """All rows within ``radius`` of ``probe`` (range query), sorted
    ascending with id tie-break. Radius is in the metric's native
    units (squared for euclidean_sq, like the reference's distances)."""
    if pred is not None:
        df = df.filter(pred)
    dist = metric_expr(metric, vec_col, list(probe), **metric_kwargs)
    return (
        df.withColumn(dist_col, dist)
        .filter(F.col(dist_col) <= radius)
        .orderBy(F.col(dist_col).asc(), F.col(id_col).asc())
    )


def knn_join(
    probes: DataFrame,
    base: DataFrame,
    k: int,
    metric: str = "euclidean_sq",
    probe_id_col: str = "probe_id",
    probe_vec_col: str = "probe_vec",
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    dist_col: str = "dist",
    strategy: str = "auto",
) -> DataFrame:
    """For every probe row, the k nearest base rows (batch kNN).

    Output: (probe_id, vec_id, dist, rank) sorted within each probe.

    strategy='auto' picks 'partial' (map-side top-k reduction before
    the window shuffle) when the base table spans enough partitions
    for the reduction to pay for its Arrow round-trip, else the plain
    window. Both produce identical results (tested).
    """
    if strategy == "auto":
        # large base + squared-Euclidean: the matmul map-side path
        # (vectorized C) beats the pair join, whose per-pair HOF fold
        # is interpreted when the probe is a column (measured 1.5s vs
        # 26s for 20 probes x 2M rows)
        if metric == "euclidean_sq" and base.rdd.getNumPartitions() > 8:
            strategy = "matmul"
        else:
            strategy = "partial" if base.rdd.getNumPartitions() > 8 else "window"
    if strategy == "matmul":
        return knn_join_matmul(
            probes, base, k, probe_id_col=probe_id_col,
            probe_vec_col=probe_vec_col, vec_col=vec_col, id_col=id_col,
        )
    pairs = base.join(F.broadcast(probes))  # broadcast nested loop; base never shuffles
    scored = pairs.withColumn(
        dist_col, metric_expr(metric, vec_col, F.col(probe_vec_col))
    ).select(probe_id_col, id_col, dist_col)

    if strategy == "partial":
        scored = _partial_topk(scored, probe_id_col, id_col, dist_col, k)

    w = Window.partitionBy(probe_id_col).orderBy(
        F.col(dist_col).asc(), F.col(id_col).asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def _partial_topk(
    scored: DataFrame, key_col: str, id_col: str, dist_col: str, k: int
) -> DataFrame:
    """Per-input-partition top-k per key: a map-side combine for top-k.

    Runs BEFORE any shuffle, so each of the N input partitions emits at
    most k rows per key — the subsequent exact window top-k only sees
    N*k*|keys| rows instead of |base|*|keys|.
    """
    import pandas as pd

    schema = scored.schema

    def local_topk(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        acc: list[pd.DataFrame] = []
        for pdf in batches:
            acc.append(
                pdf.sort_values([key_col, dist_col, id_col])
                .groupby(key_col, sort=False)
                .head(k)
            )
        if acc:
            out = pd.concat(acc)
            yield (
                out.sort_values([key_col, dist_col, id_col])
                .groupby(key_col, sort=False)
                .head(k)
            )

    return scored.mapInPandas(local_topk, schema=schema)


MATMUL_MAX_PROBES_PER_PASS = 10_000


def knn_join_matmul(
    probes: DataFrame,
    base: DataFrame,
    k: int,
    probe_id_col: str = "probe_id",
    probe_vec_col: str = "probe_vec",
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    max_probes_per_pass: int = MATMUL_MAX_PROBES_PER_PASS,
) -> DataFrame:
    """Batched kNN-join for LARGE batches: one mapInPandas pass over
    the base table with every probe in the task closure.

    Per Arrow batch: one matmul scores all rows against all probes
    (vectorized C instead of one interpreted HOF fold per pair — the
    pair-join formulation evaluates the lambda 64 times per pair, which
    measured ~58s for 20 probes x 2M rows), argpartition keeps the
    batch-local top-k per probe, and ONLY those k*B candidate rows get
    their distance recomputed with the exact (a-b)^2 formula (so
    reported distances match the codegen/oracle path bit-for-bit; the
    matmul form differs by ~1e-12 relative and is used solely for
    candidate selection, padded 2x against fp-boundary flips). A final
    window ranks k per probe. Squared-Euclidean only.

    Base rows never shuffle; output of the map phase is k*B rows per
    partition, so the window input is tiny.

    The probe batch rides the task closure, which bounds it: over
    ``max_probes_per_pass`` probes (default 10^4 — ~5 MB of closure at
    dim 64, plus the B x batch distance matrix in task memory) the
    probes are CHUNKED into ceil(P/bound) independent map passes whose
    outputs union before the shared window. Each pass re-scans the
    base (chunks x scans total) — for probe sets that large, consider
    the index-partitioned path (plans/grid_index.knn_join_indexed)
    instead; the chunking here makes the closure bound enforced rather
    than documented-only. Results are identical regardless of
    chunking: each probe's candidate set is computed independently.
    """
    import pandas as pd

    probe_rows = probes.select(probe_id_col, probe_vec_col).collect()
    if not probe_rows:
        return knn_join(probes, base, k, probe_id_col=probe_id_col,
                        probe_vec_col=probe_vec_col, vec_col=vec_col, id_col=id_col)
    if max_probes_per_pass < 1:
        raise ValueError("max_probes_per_pass must be >= 1")
    all_pids = np.array([r[0] for r in probe_rows], dtype=np.int64)
    all_P = np.stack([np.asarray(list(r[1]), dtype=np.float64) for r in probe_rows])
    keep = min(2 * k, 10**9)  # fp-boundary padding for candidate selection
    src = base.select(id_col, vec_col)

    def scored_chunk(pids: np.ndarray, P: np.ndarray) -> DataFrame:
        p_sq = (P**2).sum(axis=1)
        nb = len(pids)

        def fn(batches):
            for pdf in batches:
                if not len(pdf):
                    continue
                M = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
                ids = pdf[id_col].to_numpy()
                D = (M**2).sum(axis=1)[:, None] - 2.0 * (M @ P.T) + p_sq[None, :]
                kk = min(keep, len(ids))
                sel = np.argpartition(D, kk - 1, axis=0)[:kk] if kk < len(ids) else (
                    np.arange(len(ids))[:, None].repeat(nb, axis=1)
                )
                out_pid, out_id, out_dist = [], [], []
                for bi in range(nb):
                    rows = sel[:, bi]
                    exact = ((M[rows] - P[bi][None, :]) ** 2).sum(axis=1)
                    out_pid.extend([pids[bi]] * len(rows))
                    out_id.extend(ids[rows].tolist())
                    out_dist.extend(exact.tolist())
                yield pd.DataFrame(
                    {probe_id_col: out_pid, id_col: out_id, "dist": out_dist}
                )

        return src.mapInPandas(
            fn, f"{probe_id_col} long, {id_col} long, dist double"
        )

    chunks = [
        scored_chunk(all_pids[i : i + max_probes_per_pass],
                     all_P[i : i + max_probes_per_pass])
        for i in range(0, len(all_pids), max_probes_per_pass)
    ]
    scored = chunks[0]
    for extra in chunks[1:]:
        scored = scored.unionAll(extra)
    w = Window.partitionBy(probe_id_col).orderBy(
        F.col("dist").asc(), F.col(id_col).asc()
    )
    return scored.withColumn("rank", F.row_number().over(w)).filter(
        F.col("rank") <= k
    )
