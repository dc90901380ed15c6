"""Distance metrics as Catalyst Column builders.

Mirrors the reference's pluggable-metric surface
(``/root/reference/vectordb/distance_metric.py``) but each metric is a
*SQL expression builder* over ``array<float>`` columns, not a Python
callable: the whole distance computation stays inside whole-stage
codegen on the JVM — no per-row Python, no Arrow boundary. This is the
Spark analogue of the reference preferring closed-form ``point2plane``
over its scipy blackbox (distance_metric.py:39-45): expression first,
pandas_udf only as the escape hatch for metrics Catalyst can't express
(e.g. full-matrix Mahalanobis — see ``mahalanobis_full_udf``).

Semantics pinned to the reference (verified in SURVEY.md §2A.3):

- ``euclidean_sq``: **squared** Euclidean, no sqrt
  (distance_metric.py:57-60) — the default metric.
- ``manhattan``: one-norm (distance_metric.py:107-109).
- ``chebyshev``: infinity-norm / max-abs (distance_metric.py:95-104).
- ``mahalanobis_diag``: diagonal-covariance Mahalanobis — elementwise
  reciprocal weights (distance_metric.py:66-82).
- ``cosine_distance``: engine extra (not in the reference) needed by
  the similarity-search / dedup north-star ops.

All arithmetic is done in double (cast from the stored float32), left
fold with 0.0 seed, so results are bit-reproducible against the DuckDB
oracle computing the same fold.
"""

from __future__ import annotations

from collections.abc import Callable, Sequence

from pyspark.sql import Column
from pyspark.sql import functions as F


def vec_lit(values: Sequence[float]) -> Column:
    """A literal array<double> column from a Python float sequence.

    Built as ONE ``F.expr`` call with SQL double literals instead of a
    per-element ``F.array(F.lit(...), ...)`` chain: each F.lit/F.array
    is a py4j round trip, so a 64-dim vector cost ~65 driver calls and
    a K x dim centroid table thousands — measured seconds of pure
    DRIVER time per query construction for the SRP/IVF families
    (OPTIMIZATION_r12.md). ``repr(float)`` is the shortest round-trip
    decimal, and Spark's parser reads a ``D``-suffixed literal with
    Double.parseDouble — the identical IEEE double — so the resulting
    Literal values are bit-identical to the old chain.
    """
    body = ",".join(repr(float(v)) + "D" for v in values)
    return F.expr(f"array({body})")


def matrix_lit(rows: Sequence[Sequence[float]]) -> Column:
    """A literal array<array<double>> column — one ``F.expr`` call,
    same construction-cost rationale (and the same bit-exactness
    argument) as ``vec_lit``."""
    body = ",".join(
        "array(" + ",".join(repr(float(x)) + "D" for x in r) + ")"
        for r in rows
    )
    return F.expr(f"array({body})")


def _as_double(c: Column | str) -> Column:
    c = F.col(c) if isinstance(c, str) else c
    return c.cast("array<double>")


def _coerce(b: Column | str | Sequence[float]) -> Column:
    if isinstance(b, (list, tuple)):
        return vec_lit(b)
    return _as_double(b)


def _fold_sum(arr: Column) -> Column:
    # Left fold with 0.0 seed == sequential sum; matches DuckDB list_sum
    # accumulation order so oracle hashes agree bit-for-bit.
    return F.aggregate(arr, F.lit(0.0), lambda acc, v: acc + v)


def euclidean_sq(a: Column | str, b: Column | str | Sequence[float]) -> Column:
    """Squared Euclidean distance (reference default; NO sqrt)."""
    a, b = _as_double(a), _coerce(b)
    return _fold_sum(F.zip_with(a, b, lambda x, y: (x - y) * (x - y)))


def manhattan(a: Column | str, b: Column | str | Sequence[float]) -> Column:
    """One-norm (Manhattan) distance."""
    a, b = _as_double(a), _coerce(b)
    return _fold_sum(F.zip_with(a, b, lambda x, y: F.abs(x - y)))


def chebyshev(a: Column | str, b: Column | str | Sequence[float]) -> Column:
    """Infinity-norm (Chebyshev) distance: max_i |a_i - b_i|."""
    a, b = _as_double(a), _coerce(b)
    return F.array_max(F.zip_with(a, b, lambda x, y: F.abs(x - y)))


def mahalanobis_diag(
    a: Column | str,
    b: Column | str | Sequence[float],
    inv_diag: Sequence[float] | Column,
) -> Column:
    """Diagonal-covariance Mahalanobis: sum_i (a_i-b_i)^2 * inv_diag_i.

    ``inv_diag`` is the elementwise reciprocal of the covariance
    diagonal (the reference precomputes ``1/cov`` at metric-construction
    time, distance_metric.py:71-72).
    """
    a, b = _as_double(a), _coerce(b)
    w = _coerce(inv_diag)
    diff_sq = F.zip_with(a, b, lambda x, y: (x - y) * (x - y))
    return _fold_sum(F.zip_with(diff_sq, w, lambda d, wi: d * wi))


def dot(a: Column | str, b: Column | str | Sequence[float]) -> Column:
    a, b = _as_double(a), _coerce(b)
    return _fold_sum(F.zip_with(a, b, lambda x, y: x * y))


def l2_norm(a: Column | str) -> Column:
    a = _as_double(a)
    return F.sqrt(_fold_sum(F.zip_with(a, a, lambda x, y: x * y)))


def cosine_distance(a: Column | str, b: Column | str | Sequence[float]) -> Column:
    """1 - cos(a, b). Engine extra for similarity search / near-dup."""
    a, b = _as_double(a), _coerce(b)
    num = _fold_sum(F.zip_with(a, b, lambda x, y: x * y))
    na = F.sqrt(_fold_sum(F.zip_with(a, a, lambda x, y: x * y)))
    nb = F.sqrt(_fold_sum(F.zip_with(b, b, lambda x, y: x * y)))
    return F.lit(1.0) - num / (na * nb)


def cosine_distance_prenormed(
    a: Column | str, b: Column | str, na: Column, nb: Column
) -> Column:
    """``cosine_distance`` with the two L2 norms supplied as columns.

    For pairwise (join) shapes: hoisting ``l2_norm`` to a per-ROW
    projection below the join makes each norm a value computed once
    per vector instead of once per pair, cutting 2 of the 3
    interpreted array folds from the pair expression. Bit-identical to
    ``cosine_distance`` when ``na``/``nb`` are ``l2_norm`` of the same
    vectors: the norm is the same ``sqrt(fold)`` over the same doubles,
    and the final ``1.0 - dot/(na*nb)`` is the same expression tree.
    """
    a, b = _as_double(a), _as_double(b)
    num = _fold_sum(F.zip_with(a, b, lambda x, y: x * y))
    return F.lit(1.0) - num / (na * nb)


# --- metric registry -------------------------------------------------
# The reference's custom-metric extension point (README.md:4, abstract
# DistanceMetric) becomes a name -> Column-builder registry. Builders
# take (vector_column, other) and return a distance Column.

MetricBuilder = Callable[..., Column]

METRICS: dict[str, MetricBuilder] = {
    "euclidean_sq": euclidean_sq,
    "manhattan": manhattan,
    "chebyshev": chebyshev,
    "cosine": cosine_distance,
    "mahalanobis_diag": mahalanobis_diag,
    "dot": dot,
}


# Optional per-metric cell-bound builders: the Spark analogue of the
# reference's scipy point2plane blackbox (distance_metric.py:7-19),
# which lets ANY metric prune the index, not just the closed-form ones.
# A bound callable has signature
#     fn(probe: np.ndarray(dim,), box_lo: np.ndarray(n, dim),
#        box_hi: np.ndarray(n, dim), **metric_kwargs)
#         -> (lower: np.ndarray(n,), upper: np.ndarray(n,))
# where lower = inf of metric(probe, x) over the box and upper = sup.
# Boxes may carry +-inf edges (clamped cells / unsplit dims): return
# inf for the sup of an infinite box. Metrics without a registered
# bound still work — the index serves the exact brute scan.
METRIC_CELL_BOUNDS: dict[str, Callable] = {}


def register_metric(
    name: str,
    builder: MetricBuilder,
    cell_bounds: Callable | None = None,
    point_fn: Callable | None = None,
    box_monotone: bool = False,
) -> None:
    """Register a custom metric (the reference's DistanceMetric plug
    point). Builders returning Catalyst expressions stay on the fast
    path; a pandas_udf-based builder is the escape hatch.

    ``cell_bounds`` (optional) lets the metric prune the grid index —
    see METRIC_CELL_BOUNDS for the contract. Without it, indexed entry
    points fall back to the exact brute scan for this metric.

    ``point_fn`` + ``box_monotone=True`` (VERDICT r9 item 4) is the
    BLACKBOX analogue of the reference's scipy point2plane
    (distance_metric.py:7-19, 25-54) for metrics with no hand-written
    cell bound: ``point_fn(p (dim,), X (n, dim), **kwargs) -> (n,)`` is
    the metric as a vectorized numpy callable, and ``box_monotone``
    declares that metric(p, x) depends on x only through the
    per-coordinate deviations |x_d - p_d|, non-decreasing in each —
    true for every Lp-style metric (weighted or not, any p, max-
    combinations). Under that declaration the box bounds are EXACT,
    not numeric approximations: the infimum over a box is attained at
    the coordinate-wise clamp of p into the box, the supremum at the
    per-coordinate farthest corner — so synthesized pruning can never
    drop a true neighbor (the reference's scipy local minimum cannot
    promise that; this contract is the price of keeping 'correct,
    never wrong'). Metrics that are NOT box-monotone must either ship
    a ``cell_bounds`` or stay on the exact brute path."""
    METRICS[name] = builder
    if cell_bounds is not None:
        METRIC_CELL_BOUNDS[name] = cell_bounds
    elif point_fn is not None and box_monotone:
        METRIC_CELL_BOUNDS[name] = _box_monotone_bounds(point_fn)


def _box_monotone_bounds(point_fn: Callable) -> Callable:
    """Synthesize a METRIC_CELL_BOUNDS callable from a vectorized
    point metric declared box-monotone (see register_metric)."""
    import numpy as np

    def bounds(p, lo, hi, **kwargs):
        p = np.asarray(p, dtype=np.float64)
        lo = np.asarray(lo, dtype=np.float64)
        hi = np.asarray(hi, dtype=np.float64)
        # infimum: clamp p into each box (exact under box-monotonicity;
        # +-inf edges clamp to p itself -> zero deviation in that dim)
        xl = np.clip(p[None, :], lo, hi)
        lower = np.asarray(point_fn(p, xl, **kwargs), dtype=np.float64)
        # supremum: the per-coordinate farthest corner; a box with an
        # infinite edge has an infinite sup (the documented contract)
        xu = np.where(np.abs(lo - p[None, :]) >= np.abs(hi - p[None, :]), lo, hi)
        inf_rows = ~np.isfinite(xu).all(axis=1)
        xu_safe = np.where(np.isfinite(xu), xu, p[None, :])
        upper = np.asarray(point_fn(p, xu_safe, **kwargs), dtype=np.float64)
        upper[inf_rows] = np.inf
        return lower, upper

    return bounds


def metric_expr(
    name: str, a: Column | str, b: Column | str | Sequence[float], **kwargs
) -> Column:
    if name not in METRICS:
        raise KeyError(f"unknown metric {name!r}; registered: {sorted(METRICS)}")
    return METRICS[name](a, b, **kwargs)


def mahalanobis_factor(
    a: Column | str,
    b: Column | str | Sequence[float],
    factor: Sequence[Sequence[float]],
) -> Column:
    """Full-matrix Mahalanobis distance d^T S^-1 d via a triangular
    factor L with S^-1 = L^T L, so dist = ||L d||^2.

    The reference solves ``np.linalg.solve(S, d)`` per call
    (distance_metric.py:78-80); here the factorization happens ONCE on
    the driver (numpy Cholesky, or any exact L you choose) and the
    per-row work is an unrolled dense matrix-vector product that stays
    entirely inside whole-stage codegen — the same "closed form over
    blackbox" preference the reference documents for point2plane
    (distance_metric.py:39-45). For high dimensionality where the
    unrolled expression would blow past codegen method limits, use
    ``mahalanobis_full_udf`` (Arrow escape hatch) instead.

    Zero coefficients are skipped identically on the oracle side, and
    both inner and outer sums are left folds, so results hash-match
    DuckDB bit-for-bit.
    """
    a, b = _as_double(a), _coerce(b)
    rows: list[Column] = []
    for row in factor:
        term: Column | None = None
        for i, c in enumerate(row):
            if float(c) == 0.0:
                continue
            d = F.element_at(a, i + 1) - F.element_at(b, i + 1)
            t = F.lit(float(c)) * d
            term = t if term is None else term + t
        rows.append(term if term is not None else F.lit(0.0))
    dist = F.lit(0.0)
    for r in rows:
        dist = dist + r * r
    return dist


METRICS["mahalanobis_factor"] = mahalanobis_factor


def mahalanobis_full_udf(inv_cov) -> Callable[[Column, Sequence[float]], Column]:
    """Full-matrix Mahalanobis via an Arrow-batched pandas UDF — the
    slow-path escape hatch for metrics with no Catalyst closed form
    (reference: np.linalg.solve per call, distance_metric.py:78-80; we
    precompute the inverse once and broadcast it in the closure).

    Returns a builder(vec_col, probe_list) -> Column.
    """
    import numpy as np
    import pandas as pd
    from pyspark.sql.functions import PandasUDFType, pandas_udf

    inv = np.asarray(inv_cov, dtype=np.float64)

    def builder(a: Column | str, probe: Sequence[float]) -> Column:
        p = np.asarray(list(probe), dtype=np.float64)

        # explicit functionType: type-hint inference can't resolve
        # locally-imported pandas annotations
        @pandas_udf("double", PandasUDFType.SCALAR)
        def _dist(vecs):
            m = np.stack(vecs.to_numpy()).astype(np.float64)
            d = m - p
            return pd.Series(np.einsum("ij,jk,ik->i", d, inv, d))

        return _dist(F.col(a) if isinstance(a, str) else a)

    return builder
