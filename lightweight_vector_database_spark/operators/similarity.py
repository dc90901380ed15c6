"""Approximate nearest-neighbor search over embedding columns.

Two tiers (north-star similarity search):

- ``knn`` / ``knn_join`` in knn.py are the exact brute-force baseline
  (codegen'd distance + TakeOrderedAndProject — already linear-scan
  optimal for one-shot queries).
- IVF (inverted-file) here is the scale path for repeated queries:
  partition vectors into Voronoi cells around centroids, search only
  the ``nprobe`` nearest cells. At 100 TB the assignment table is
  written partitioned by ``cell`` so a probe reads only its cells'
  files (partition pruning), exactly like the reference's grid-cell
  pruning (kd_tree_database.py:164-181) but hash-free and data-adaptive.

Centroid selection is deterministic k-means++-lite: a fixed id-based
sample refined by a few Lloyd iterations driver-side (centroid count
is small; the heavy assignment step stays distributed).
"""

from __future__ import annotations

from collections.abc import Sequence

import numpy as np
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..functions.distance import euclidean_sq, metric_expr


def _dbl_array_lit(values) -> Column:
    """Literal array<double> via ONE SQL-parse call. py4j converts a
    Python list to a JVM list element-by-element (8k reflection round
    trips for the IVF-PQ LUTs — ~10s of plan build); a single F.expr
    string parse is milliseconds."""
    body = ",".join(repr(float(v)) + "D" for v in values)
    return F.expr(f"array({body})")


def _centroid_lits(centroids: np.ndarray):
    return [[float(x) for x in c] for c in centroids]


def train_centroids_np(
    sample: np.ndarray, n_centroids: int, iters: int, seed: int = 42
) -> np.ndarray:
    """Numpy core of ``train_centroids`` — exposed so an oracle can
    retrain the SAME codebooks from the same sample without a Spark
    session (tools/check_oracle differential for the PQ queries)."""
    rng = np.random.RandomState(seed)
    idx = rng.choice(len(sample), size=min(n_centroids, len(sample)), replace=False)
    cents = sample[idx].copy()
    for _ in range(iters):
        d = ((sample[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
        assign = d.argmin(axis=1)
        for c in range(len(cents)):
            members = sample[assign == c]
            if len(members):
                cents[c] = members.mean(axis=0)
    return cents


def _training_sample(
    df: DataFrame, vec_col: str, sample_rows: int, sample_id_col: str | None
) -> np.ndarray:
    """Bounded driver-side training sample.

    ``sample_id_col`` set (the production rule): a seeded UNIFORM
    sample — rows ordered by md5(cast(id as string)), top
    ``sample_rows``. md5 of the id is a deterministic pseudo-random
    permutation of the table, so the sample is uniform over the WHOLE
    corpus regardless of file layout, it costs one TakeOrdered scan
    (per-task top-n heap, no full sort), and the identical rule runs
    in the DuckDB oracle builders (ORDER BY md5(CAST(id AS VARCHAR))).

    ``sample_id_col=None`` (legacy): head-of-table ``limit`` — kept
    only for id-less frames; on a 100 TB corpus limit() reads the
    first partitions' head, which silently biases centroids toward one
    shard's distribution (VERDICT r6 item 2) — pass an id column.
    """
    if sample_id_col is not None:
        src = (
            df.select(vec_col, sample_id_col)
            .orderBy(F.md5(F.col(sample_id_col).cast("string")))
            .limit(sample_rows)
        )
        return np.array(
            [r[0] for r in src.collect()], dtype=np.float64
        )
    return np.array(
        [r[0] for r in df.select(vec_col).limit(sample_rows).collect()],
        dtype=np.float64,
    )


def train_centroids(
    df: DataFrame,
    n_centroids: int = 16,
    vec_col: str = "embedding",
    iters: int = 5,
    sample_rows: int = 2048,
    seed: int = 42,
    sample_id_col: str | None = None,
) -> np.ndarray:
    """Deterministic Lloyd refinement on a bounded driver-side sample.

    Pass ``sample_id_col`` for the seeded-uniform sampling rule (the
    production path — see ``_training_sample``); without it the sample
    is the head of the table, which is biased at scale.
    """
    sample = _training_sample(df, vec_col, sample_rows, sample_id_col)
    return train_centroids_np(sample, n_centroids, iters, seed)


def ivf_assign(
    df: DataFrame,
    centroids: np.ndarray | Sequence[Sequence[float]],
    vec_col: str = "embedding",
    method: str = "expr",
) -> DataFrame:
    """Add a ``cell`` column = argmin_c ||v - centroid_c||^2.

    method='expr': a fold over a literal array of centroid structs —
    no UDF, plan stays JVM-only. Spark evaluates higher-order
    functions interpreted, so cost is O(n_centroids * dim) interpreted
    ops per row; fine for queries, slow for bulk index builds.

    method='arrow': Arrow-batched matmul (||v||^2 - 2 v.C^T + ||c||^2,
    argmin per batch) — the bulk-build path, ~an order of magnitude
    faster at millions of rows. Identical assignment (tested); no
    shuffle either way. Follow with .write.partitionBy('cell').
    """
    cents_np = np.asarray(centroids, dtype=np.float64)
    if method == "arrow":
        import pandas as pd
        from pyspark.sql.functions import PandasUDFType, pandas_udf

        c_t = cents_np.T.copy()
        c_sq = (cents_np**2).sum(axis=1)

        @pandas_udf("int", PandasUDFType.SCALAR)
        def assign(vecs):
            m = np.stack(vecs.to_numpy()).astype(np.float64)
            d = (m**2).sum(axis=1)[:, None] - 2.0 * (m @ c_t) + c_sq[None, :]
            return pd.Series(d.argmin(axis=1).astype("int32"))

        return df.withColumn("cell", assign(F.col(vec_col)))

    cents = _centroid_lits(cents_np)
    pairs = [
        F.struct(F.lit(i).alias("c"), euclidean_sq(vec_col, cent).alias("d"))
        for i, cent in enumerate(cents)
    ]
    best = F.aggregate(
        F.array(*pairs[1:]),
        pairs[0],
        lambda acc, x: F.when(x["d"] < acc["d"], x).otherwise(acc),
    )
    return df.withColumn("cell", best["c"])


def ivf_cell_order(
    centroids: np.ndarray | Sequence[Sequence[float]],
    probe: Sequence[float],
) -> list[int]:
    """ALL cells ordered by centroid distance to ``probe`` (nearest
    first), ties broken by cell id. Shared by ``ivf_search`` and the
    suite oracles so both sides rank cells identically — including the
    tie rule (lexsort by (distance, cell) == SQL ORDER BY d, cell)."""
    cents = np.asarray(centroids, dtype=np.float64)
    p = np.asarray(list(probe), dtype=np.float64)
    d = ((cents - p) ** 2).sum(axis=1)
    return [int(c) for c in np.lexsort((np.arange(len(d)), d))]


def ivf_search(
    assigned: DataFrame,
    centroids: np.ndarray | Sequence[Sequence[float]],
    probe: Sequence[float],
    k: int = 10,
    nprobe: int = 4,
    metric: str = "euclidean_sq",
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    pred: Column | None = None,
    filtered_cell_counts: dict[int, int] | None = None,
    qualify: bool = True,
) -> DataFrame:
    """kNN restricted to the ``nprobe`` cells nearest the probe.

    Cell selection is a driver-side sort over n_centroids values
    (tiny); the scan then carries an IN-list filter on ``cell`` that
    prunes partitions/row-groups.

    ``pred``: optional metadata predicate — FILTERED ANN with
    pre-filter semantics (the predicate applies inside the probed
    cells BEFORE top-k, so the result is the k nearest MATCHING
    vectors among the probed cells, mirroring the reference's
    filter-before-topk contract, kd_tree_database.py:186-190). Both
    filters reach the scan, so a cell-partitioned + predicate-indexed
    layout prunes on both.

    ``qualify`` (default on): with a predicate, the nprobe cells are
    the nearest QUALIFYING cells — cells holding at least one matching
    row. Without it, a predicate CORRELATED with the cell geometry
    empties whole probed cells and the search returns fewer than k
    rows (or nothing) while matches sit one cell over — the same hole
    the batched tier closes with its qualifying-cell mask
    (plans/ann_join.py step 0). Qualification costs one O(cells)
    distinct-aggregate over the filtered table per query; serving
    deployments amortize it by passing ``filtered_cell_counts`` —
    per-cell counts computed UNDER THE SAME ``pred`` (per-predicate
    stats), which skips the aggregate entirely. Passing UNFILTERED
    counts here silently reverts to the empty-probed-cell hole the
    qualification exists to close (every cell appears live, probes
    route into predicate-emptied cells) — hence the name (ADVICE r9;
    the r9 parameter name ``cell_counts`` did not say which counts)."""
    order = ivf_cell_order(centroids, probe)
    if pred is not None and qualify:
        if filtered_cell_counts is None:
            qual = {
                int(r[0])
                for r in assigned.filter(pred).select("cell").distinct().collect()
            }
        else:
            qual = {int(c) for c, n in filtered_cell_counts.items() if n > 0}
        order = [c for c in order if c in qual]
    probe_cells = order[:nprobe]
    cand = assigned.filter(F.col("cell").isin(probe_cells))
    if pred is not None:
        cand = cand.filter(pred)
    scored = cand.withColumn("dist", metric_expr(metric, vec_col, list(probe)))
    return scored.orderBy(F.col("dist").asc(), F.col(id_col).asc()).limit(k)


def lsh_near_pairs(
    df: DataFrame,
    max_cos_dist: float,
    n_planes: int = 8,
    n_tables: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Embedding near-dup pairs at scale: OR-amplified hyperplane LSH.

    Candidates = pairs sharing a bucket in ANY of ``n_tables``
    independent hash tables (recall amplification), then the exact
    cosine distance filters to ``max_cos_dist``. Work is linear in
    rows x tables plus the (small) candidate join — never the O(n^2)
    cross join of the exact baseline (dedup.embedding_topk_pairs).
    """
    from ..functions.distance import cosine_distance

    dim = len(df.select(vec_col).first()[0])
    tagged = df
    bucket_cols = []
    for t in range(n_tables):
        tagged = cosine_lsh_buckets(
            tagged, n_planes=n_planes, dim=dim, vec_col=vec_col, seed=100 + t
        ).withColumnRenamed("bucket", f"__b{t}")
        bucket_cols.append(f"__b{t}")
    slim = tagged.select(F.col(id_col).alias("id"), vec_col, *bucket_cols)

    cands = None
    for t, bc in enumerate(bucket_cols):
        a = slim.select(F.col(bc).alias("bk"), F.col("id").alias("id1"))
        b = slim.select(F.col(bc).alias("bk"), F.col("id").alias("id2"))
        p = a.join(b, "bk").filter(F.col("id1") < F.col("id2")).select("id1", "id2")
        cands = p if cands is None else cands.unionByName(p)
    cands = cands.distinct()

    v1 = slim.select(F.col("id").alias("id1"), F.col(vec_col).alias("__v1"))
    v2 = slim.select(F.col("id").alias("id2"), F.col(vec_col).alias("__v2"))
    return (
        cands.join(v1, "id1")
        .join(v2, "id2")
        .withColumn("cos_dist", cosine_distance(F.col("__v1"), F.col("__v2")))
        .filter(F.col("cos_dist") <= max_cos_dist)
        .select("id1", "id2", "cos_dist")
    )


def cosine_lsh_buckets(
    df: DataFrame,
    n_planes: int = 8,
    dim: int = 64,
    vec_col: str = "embedding",
    seed: int = 7,
) -> DataFrame:
    """Random-hyperplane LSH bucket id (sign pattern of n_planes dot
    products) for cosine similarity — near-dup pairs land in the same
    bucket with probability (1 - theta/pi)^n_planes. Pure codegen."""
    rng = np.random.RandomState(seed)
    planes = rng.randn(n_planes, dim)
    bucket = F.lit(0).cast("long")
    for i in range(n_planes):
        dp = F.aggregate(
            F.zip_with(
                F.col(vec_col).cast("array<double>"),
                F.array(*[F.lit(float(x)) for x in planes[i]]),
                lambda a, b: a * b,
            ),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
        bucket = bucket.bitwiseOR(
            F.when(dp > 0, F.lit(1 << i).cast("long")).otherwise(F.lit(0).cast("long"))
        )
    return df.withColumn("bucket", bucket)


# --- product quantization (the 100 TB memory-budget ANN tier) ---------------

def train_pq_codebooks(
    df: DataFrame,
    m: int = 8,
    ksub: int = 16,
    vec_col: str = "embedding",
    iters: int = 8,
    sample_rows: int = 2048,
    seed: int = 42,
    sample_id_col: str | None = None,
) -> np.ndarray:
    """Per-subspace codebooks, shape (m, ksub, dim/m).

    PQ stores each vector as m small codes (m bytes at ksub<=256)
    instead of dim floats — a 32x compression at dim=64/m=8 — so a
    100 TB float corpus fits a few TB of codes and distance evaluation
    becomes m table lookups (ADC) instead of dim multiplies. Training
    is Lloyd per subspace on a bounded driver-side sample, same
    determinism and sampling contract as train_centroids (pass
    ``sample_id_col`` for the seeded-uniform rule)."""
    sample = _training_sample(df, vec_col, sample_rows, sample_id_col)
    return train_pq_codebooks_np(sample, m=m, ksub=ksub, iters=iters, seed=seed)


def train_pq_codebooks_np(
    sample: np.ndarray, m: int = 8, ksub: int = 16, iters: int = 8, seed: int = 42
) -> np.ndarray:
    """Numpy core of ``train_pq_codebooks`` (same sample -> same
    codebooks, no Spark needed — used by the exact PQ oracles)."""
    dim = sample.shape[1]
    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m {m}")
    dsub = dim // m
    rng = np.random.RandomState(seed)
    books = np.empty((m, ksub, dsub), dtype=np.float64)
    for j in range(m):
        sub = sample[:, j * dsub : (j + 1) * dsub]
        idx = rng.choice(len(sub), size=min(ksub, len(sub)), replace=False)
        cents = sub[idx].copy()
        for _ in range(iters):
            d = ((sub[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
            assign = d.argmin(axis=1)
            for c in range(len(cents)):
                members = sub[assign == c]
                if len(members):
                    cents[c] = members.mean(axis=0)
        books[j, : len(cents)] = cents
        if len(cents) < ksub:  # degenerate tiny sample: pad by repeat
            books[j, len(cents) :] = cents[-1]
    return books


def pq_encode(
    df: DataFrame,
    codebooks: np.ndarray,
    vec_col: str = "embedding",
    code_col: str = "pq_code",
    method: str = "arrow",
) -> DataFrame:
    """Add ``code_col``: array<int> of length m (argmin centroid per
    subspace). method='arrow' is the bulk-build path (batched matmul
    per subspace); method='expr' keeps the plan JVM-only for small or
    streaming encodes — identical codes (tested)."""
    books = np.asarray(codebooks, dtype=np.float64)
    m, ksub, dsub = books.shape

    if method == "arrow":
        import pandas as pd
        from pyspark.sql.functions import PandasUDFType, pandas_udf

        flats = [books[j].T.copy() for j in range(m)]  # (dsub, ksub)
        sqs = [(books[j] ** 2).sum(axis=1) for j in range(m)]

        @pandas_udf("array<int>", PandasUDFType.SCALAR)
        def enc(vecs):
            mat = np.stack(vecs.to_numpy()).astype(np.float64)
            codes = np.empty((len(mat), m), dtype=np.int32)
            for j in range(m):
                sub = mat[:, j * dsub : (j + 1) * dsub]
                d = -2.0 * (sub @ flats[j]) + sqs[j][None, :]
                codes[:, j] = d.argmin(axis=1)
            return pd.Series(list(codes))

        return df.withColumn(code_col, enc(F.col(vec_col)))

    v = F.col(vec_col).cast("array<double>")
    code_parts = []
    for j in range(m):
        sub = F.slice(v, j * dsub + 1, dsub)
        pairs = []
        for c in range(ksub):
            cent = F.array(*[F.lit(float(x)) for x in books[j, c]])
            d = F.aggregate(
                F.zip_with(sub, cent, lambda a, b: (a - b) * (a - b)),
                F.lit(0.0),
                lambda acc, x: acc + x,
            )
            pairs.append(F.struct(F.lit(c).alias("c"), d.alias("d")))
        best = F.aggregate(
            F.array(*pairs[1:]),
            pairs[0],
            lambda acc, x: F.when(x["d"] < acc["d"], x).otherwise(acc),
        )
        code_parts.append(best["c"])
    return df.withColumn(code_col, F.array(*code_parts))


def pq_search(
    encoded: DataFrame,
    codebooks: np.ndarray,
    probe: Sequence[float],
    k: int = 10,
    refine: int = 4,
    vec_col: str = "embedding",
    code_col: str = "pq_code",
    id_col: str = "vec_id",
    raw: DataFrame | None = None,
) -> DataFrame:
    """ADC top-k: dist ~= sum_j LUT_j[code_j], where LUT_j holds the
    probe-to-centroid distances of subspace j (m*ksub doubles, baked
    into the plan as literals — pure codegen, no UDF, no shuffle).

    ``refine`` > 0 re-ranks the top k*refine ADC candidates with the
    exact distance on the raw vectors (asymmetric-then-exact, the
    standard IVF-PQ serving shape). The candidate cut is a
    TakeOrderedAndProject; the re-rank touches only k*refine rows."""
    books = np.asarray(codebooks, dtype=np.float64)
    m, ksub, dsub = books.shape
    p = np.asarray(list(probe), dtype=np.float64)
    luts = [
        ((books[j] - p[j * dsub : (j + 1) * dsub][None, :]) ** 2).sum(axis=1)
        for j in range(m)
    ]
    adc = F.lit(0.0)
    code = F.col(code_col)
    for j in range(m):
        lut = _dbl_array_lit(luts[j])
        adc = adc + F.element_at(lut, F.element_at(code, j + 1) + 1)
    # With ``raw`` given, the ADC phase scans ONLY (id, code) — at scale
    # that is ~32x fewer bytes than the float vectors — and the refine
    # joins the k*refine candidate ids back to the raw table (a
    # broadcast join of a tiny id set). Without it, refine reads
    # ``vec_col`` from ``encoded`` directly.
    adc_input = encoded.select(id_col, code_col) if raw is not None else encoded
    scored = adc_input.withColumn("adc_dist", adc)
    if not refine:
        return scored.orderBy(F.col("adc_dist").asc(), F.col(id_col).asc()).limit(k)
    cand = scored.orderBy(F.col("adc_dist").asc(), F.col(id_col).asc()).limit(
        k * refine
    )
    if raw is not None:
        cand = F.broadcast(cand.select(id_col, "adc_dist")).join(raw, id_col)
    exact = cand.withColumn(
        "dist", metric_expr("euclidean_sq", vec_col, list(probe))
    )
    return exact.orderBy(F.col("dist").asc(), F.col(id_col).asc()).limit(k)


# --- residual IVF-PQ (coarse cells + PQ over residuals) ---------------------

def train_ivfpq(
    df: DataFrame,
    n_centroids: int = 32,
    m: int = 8,
    ksub: int = 256,
    vec_col: str = "embedding",
    iters: int = 5,
    sample_rows: int = 8192,
    seed: int = 42,
    sample_id_col: str | None = None,
):
    """Train the coarse quantizer and residual codebooks.

    Residual encoding (x - coarse_centroid[cell]) is what makes PQ
    work on clustered data: raw-vector codebooks spend their 256 codes
    spanning the whole space (whole clusters collapse to one code —
    see BASELINE notes), while residuals are centered near zero in
    every cell, so the same bits encode LOCAL geometry. This is the
    standard IVF-PQ construction (Jegou et al., "Product Quantization
    for Nearest Neighbor Search", TPAMI 2011).

    Sampling contract as train_centroids: pass ``sample_id_col`` for
    the seeded-uniform rule.
    """
    sample = _training_sample(df, vec_col, sample_rows, sample_id_col)
    return train_ivfpq_np(
        sample, n_centroids=n_centroids, m=m, ksub=ksub, iters=iters, seed=seed
    )


def train_ivfpq_np(
    sample: np.ndarray,
    n_centroids: int = 32,
    m: int = 8,
    ksub: int = 256,
    iters: int = 5,
    seed: int = 42,
):
    """Numpy core of ``train_ivfpq`` (same sample -> same codebooks,
    no Spark needed — used by the exact PQ oracles)."""
    cents = train_centroids_np(sample, n_centroids, iters, seed)
    assign = ((sample[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2).argmin(axis=1)
    residuals = sample - cents[assign]
    books = _residual_pq_books_np(residuals, m=m, ksub=ksub, iters=iters, seed=seed)
    return cents, books


def _residual_pq_books_np(
    residuals: np.ndarray, m: int, ksub: int, iters: int, seed: int
) -> np.ndarray:
    """Per-subspace Lloyd on a residual matrix — the codebook stage of
    ``train_ivfpq_np``, factored out so OPQ can retrain books on
    rotated residuals with the IDENTICAL rng sequence (same seed ->
    byte-identical books for the unrotated input)."""
    dim = residuals.shape[1]
    if dim % m:
        # enforced ONCE at train time so every serve path agrees: a
        # truncating dsub would silently drop the trailing dims from
        # the codes, and ann_join_topk's rotation shape check
        # (rot.shape == (m*dsub, m*dsub)) would reject the dim x dim
        # rotation train_opq returns (ADVICE r10)
        raise ValueError(f"dim {dim} not divisible by m {m}")
    dsub = dim // m
    rng = np.random.RandomState(seed + 1)
    books = np.empty((m, ksub, dsub), dtype=np.float64)
    for j in range(m):
        sub = residuals[:, j * dsub : (j + 1) * dsub]
        idx = rng.choice(len(sub), size=min(ksub, len(sub)), replace=False)
        cb = sub[idx].copy()
        for _ in range(iters):
            d = ((sub[:, None, :] - cb[None, :, :]) ** 2).sum(axis=2)
            a = d.argmin(axis=1)
            for c in range(len(cb)):
                members = sub[a == c]
                if len(members):
                    cb[c] = members.mean(axis=0)
        books[j, : len(cb)] = cb
        if len(cb) < ksub:
            books[j, len(cb) :] = cb[-1]
    return books


def fold_matvec(X: np.ndarray, R: np.ndarray) -> np.ndarray:
    """Rows of ``X`` rotated by ``R`` (out[:, i] = sum_t R[i, t] *
    X[:, t]) with the sum accumulated as a LEFT FOLD over ``t`` in
    ascending order — the same IEEE order as the oracle's
    ``list_sum(list_transform(range(1, dim+1), t -> rot[i][t] *
    rv0[t]))``, so rotated residual coordinates are bit-identical on
    both engines (a BLAS ``X @ R.T`` pairs/permutes the additions and
    drifts in the last ulp, which can flip downstream argmin
    tie-breaks)."""
    acc = np.zeros((len(X), R.shape[0]))
    RT = np.ascontiguousarray(R.T)
    for t in range(X.shape[1]):
        # in-place: same per-element left-fold IEEE order, without
        # allocating a fresh accumulator per input coordinate (this
        # runs inside the hottest encode/serve kernels)
        acc += X[:, t, None] * RT[t, None, :]
    return acc


def _pq_encode_np(Y: np.ndarray, books: np.ndarray) -> np.ndarray:
    """Vectorized PQ code assignment (training-loop internal — the
    bulk Spark encode lives in ``ivfpq_encode``)."""
    m, _ksub, dsub = books.shape
    codes = np.empty((len(Y), m), dtype=np.int64)
    for j in range(m):
        sub = Y[:, j * dsub : (j + 1) * dsub]
        d = ((sub[:, None, :] - books[j][None, :, :]) ** 2).sum(axis=2)
        codes[:, j] = d.argmin(axis=1)
    return codes


def _pq_decode_np(codes: np.ndarray, books: np.ndarray) -> np.ndarray:
    m = books.shape[0]
    return np.concatenate([books[j][codes[:, j]] for j in range(m)], axis=1)


def train_opq(
    df: DataFrame,
    n_centroids: int = 32,
    m: int = 8,
    ksub: int = 256,
    vec_col: str = "embedding",
    iters: int = 5,
    opq_iters: int = 6,
    sample_rows: int = 8192,
    seed: int = 42,
    sample_id_col: str | None = None,
):
    """OPQ: coarse quantizer + orthonormal rotation + rotated-residual
    codebooks — ``(cents, R, books)``.

    Plain residual PQ quantizes each dim/m subspace independently, so
    its error is bound by how the data's variance happens to fall
    across the FIXED subspace split. OPQ (Ge et al., "Optimized
    Product Quantization", CVPR 2013 — non-parametric variant) learns
    an orthonormal rotation R jointly with the codebooks, minimizing
    ||R r - decode(encode(R r))||^2: the rotation balances variance
    across subspaces and decorrelates them, which is exactly what the
    refine-bound serving regimes need (BASELINE.md r10: PQ noise at
    m=8 swamps noise-scale cosine gaps; a lower-noise code ranks
    candidates usefully at the same byte budget). Rotation preserves
    euclidean distance, so the ADC identity and every serving contract
    (tie-safe cuts, exact re-rank) hold unchanged in the rotated
    space.

    Same sampling/determinism contract as ``train_ivfpq``."""
    sample = _training_sample(df, vec_col, sample_rows, sample_id_col)
    return train_opq_np(
        sample, n_centroids=n_centroids, m=m, ksub=ksub, iters=iters,
        opq_iters=opq_iters, seed=seed,
    )


def train_opq_np(
    sample: np.ndarray,
    n_centroids: int = 32,
    m: int = 8,
    ksub: int = 256,
    iters: int = 5,
    opq_iters: int = 6,
    seed: int = 42,
):
    """Numpy core of ``train_opq`` (same sample -> same model, no
    Spark needed — the OPQ oracles retrain from the identical
    md5-ordered sample).

    Alternating minimization: (1) fix R, Lloyd the codebooks on the
    rotated residuals; (2) fix the codes' reconstructions Yhat, solve
    the orthogonal Procrustes problem min_R ||residuals @ R.T - Yhat||
    via SVD of residuals.T @ Yhat (R = (U V^T)^T). R is applied at
    encode/serve time with the left-fold matvec (``fold_matvec``), but
    TRAINING may use BLAS freely — only encode/serve arithmetic must
    tie out against the SQL replay, the trained model is plain
    constants shared by both sides."""
    cents = train_centroids_np(sample, n_centroids, iters, seed)
    assign = ((sample[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2).argmin(axis=1)
    residuals = sample - cents[assign]
    dim = sample.shape[1]
    R = np.eye(dim)
    for _ in range(opq_iters):
        Y = residuals @ R.T
        books = _residual_pq_books_np(Y, m=m, ksub=ksub, iters=iters, seed=seed)
        Yhat = _pq_decode_np(_pq_encode_np(Y, books), books)
        # orthogonal Procrustes: min_Q ||A Q - B||_F with Q = R.T,
        # A = residuals, B = Yhat -> Q = U V^T of A^T B. R = Q.T is
        # invariant to the SVD's per-pair sign ambiguity (U D)(D V^T)
        U, _s, Vt = np.linalg.svd(residuals.T @ Yhat)
        R = (U @ Vt).T
    books = _residual_pq_books_np(
        fold_matvec(residuals, R), m=m, ksub=ksub, iters=iters, seed=seed
    )
    return cents, R, books


def zca_whitening_np(sample: np.ndarray, eps: float = 1e-5) -> np.ndarray:
    """Symmetric (ZCA) whitening matrix from the training sample's
    covariance: ``W = U diag(1/sqrt(lam + eps)) U^T``. Applied before
    the COARSE stage (``train_whitened_ivfpq`` / ``ivfpq_encode(
    whiten=)`` / ``ann_join_topk(whiten=)``) it equalizes the
    residual variance spectrum, so Lloyd's k-means stops collapsing
    onto the dominant variance directions — the r11 anisotropic mix
    left 11 live coarse cells of 64 (ROUND11_NOTES), capping nprobe
    headroom. ZCA (vs plain PCA whitening) keeps the transform as
    close to identity as a whitening can be (Bell & Sejnowski's
    symmetric form), so near-isotropic corpora are served almost
    unchanged. Deterministic for a given sample (eigh on the
    symmetric covariance)."""
    X = np.asarray(sample, dtype=np.float64)
    mu = X.mean(axis=0)
    C = (X - mu).T @ (X - mu) / max(1, len(X) - 1)
    lam, U = np.linalg.eigh(C)
    lam = np.maximum(lam, 0.0)
    return (U * (1.0 / np.sqrt(lam + eps))[None, :]) @ U.T


def train_whitened_ivfpq_np(
    sample: np.ndarray,
    n_centroids: int = 32,
    m: int = 8,
    ksub: int = 256,
    iters: int = 5,
    seed: int = 42,
    eps: float = 1e-5,
    opq: bool = False,
):
    """Numpy core of ``train_whitened_ivfpq`` (same sample -> same
    model, no Spark — the exact-oracle twin). The whitening is a
    VECTOR-SPACE transform: coarse centroids, residuals and codebooks
    all live in the whitened space, and serving (``ann_join_topk(
    whiten=W)``) whitens probes with the same left-fold matvec before
    assignment + ADC while the exact re-rank stays on the RAW vectors
    — candidate selection geometry changes, the final metric does not.
    Returns ``(W, cents, books)``, or ``(W, cents, rotation, books)``
    with ``opq=True`` (the OPQ rotation is trained on the WHITENED
    residuals — the composition the anisotropic axis measures)."""
    X = np.asarray(sample, dtype=np.float64)
    W = zca_whitening_np(X, eps=eps)
    Xw = fold_matvec(X, W)
    if opq:
        cents, R, books = train_opq_np(
            Xw, n_centroids=n_centroids, m=m, ksub=ksub, iters=iters,
            seed=seed,
        )
        return W, cents, R, books
    cents, books = train_ivfpq_np(
        Xw, n_centroids=n_centroids, m=m, ksub=ksub, iters=iters, seed=seed
    )
    return W, cents, books


def train_whitened_ivfpq(
    df: DataFrame,
    n_centroids: int = 32,
    m: int = 8,
    ksub: int = 256,
    vec_col: str = "embedding",
    iters: int = 5,
    sample_rows: int = 8192,
    seed: int = 42,
    sample_id_col: str | None = None,
    eps: float = 1e-5,
    opq: bool = False,
):
    """Whitened-coarse IVF-PQ training (see the np core above for the
    construction and serving contract). Sampling contract as
    ``train_ivfpq``: pass ``sample_id_col`` for the seeded-uniform
    rule."""
    sample = _training_sample(df, vec_col, sample_rows, sample_id_col)
    return train_whitened_ivfpq_np(
        sample, n_centroids=n_centroids, m=m, ksub=ksub, iters=iters,
        seed=seed, eps=eps, opq=opq,
    )


def spherical_kmeans_np(
    sample_unit: np.ndarray, n_centroids: int, iters: int, seed: int = 42
) -> np.ndarray:
    """Spherical k-means on UNIT-NORM rows: assignment by max dot
    product (== min squared euclidean once every centroid is unit
    norm, so the existing serve kernels need no change), centroid
    update = re-normalized member mean — the maximum-mean-cosine
    update (Dhillon & Modha, "Concept Decompositions for Large Sparse
    Text Data Using Clustering", Machine Learning 42, 2001). For the
    cosine serving contract this keeps the coarse centroids ON the
    sphere the data lives on, where plain Lloyd's unconstrained means
    drift inside the ball (mean of unit vectors has norm < 1, shrinking
    with cluster spread — wide cells get interior centroids and the
    Voronoi partition stops being metric-matched). Deterministic for a
    given (sample, seed): seeded row-choice init, empty or zero-mean
    cells keep their previous centroid."""
    X = np.asarray(sample_unit, dtype=np.float64)
    rng = np.random.RandomState(seed)
    idx = rng.choice(len(X), size=min(n_centroids, len(X)), replace=False)
    cents = X[idx].copy()
    for _ in range(iters):
        a = (X @ cents.T).argmax(axis=1)
        for c in range(len(cents)):
            members = X[a == c]
            if len(members):
                mu = members.sum(axis=0)
                n = float(np.sqrt((mu * mu).sum()))
                if n > 0.0:
                    cents[c] = mu / n
    return cents


def train_spherical_ivfpq_np(
    sample: np.ndarray,
    n_centroids: int = 32,
    m: int = 8,
    ksub: int = 256,
    iters: int = 5,
    seed: int = 42,
):
    """Numpy core of ``train_spherical_ivfpq`` (same sample -> same
    model, no Spark — the exact-oracle twin). Normalizes the RAW
    sample rows to unit norm (zero rows pass through unscaled), runs
    spherical k-means for the coarse stage, then trains the residual
    codebooks in the NORMALIZED space with the final assignment taken
    by the same squared-euclidean argmin the serve kernel uses. The
    returned model is a drop-in for the ``metric='cosine'`` serving
    path (``ann_join_topk(metric='cosine')`` / ``ivfpq_encode`` over
    the L2-normalized codes table): unit centroids make euclidean
    assignment identical to cosine assignment, so ONLY training
    changes — encode, serve, and oracle replay are untouched. The
    normalization accumulates the squared norm as a LEFT FOLD over
    dimensions (the plans/ann_join.fold_norms order), keeping the
    training space arithmetically identical to the serve/encode
    space."""
    X = np.asarray(sample, dtype=np.float64)
    acc = np.zeros(len(X))
    for t in range(X.shape[1]):
        acc = acc + X[:, t] * X[:, t]
    norms = np.sqrt(acc)
    Xn = X / np.where(norms > 0.0, norms, 1.0)[:, None]
    cents = spherical_kmeans_np(Xn, n_centroids, iters, seed)
    assign = (
        ((Xn[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2).argmin(axis=1)
    )
    residuals = Xn - cents[assign]
    books = _residual_pq_books_np(residuals, m=m, ksub=ksub, iters=iters, seed=seed)
    return cents, books


def train_spherical_ivfpq(
    df: DataFrame,
    n_centroids: int = 32,
    m: int = 8,
    ksub: int = 256,
    vec_col: str = "embedding",
    iters: int = 5,
    sample_rows: int = 8192,
    seed: int = 42,
    sample_id_col: str | None = None,
):
    """Spherical-coarse IVF-PQ training for the COSINE serving
    contract (see the np core above). Takes the RAW embeddings table —
    normalization happens inside the np core, so the Spark sampler and
    the DuckDB oracle builder fetch identical raw rows and reach
    byte-identical models. Sampling contract as ``train_ivfpq``: pass
    ``sample_id_col`` for the seeded-uniform rule."""
    sample = _training_sample(df, vec_col, sample_rows, sample_id_col)
    return train_spherical_ivfpq_np(
        sample, n_centroids=n_centroids, m=m, ksub=ksub, iters=iters,
        seed=seed,
    )


def pack_codes4(codes: np.ndarray) -> list[bytes]:
    """Pack (n, m) PQ codes with values < 16 into nibble-packed bytes
    — the 4-bit fast-scan layout (VERDICT r10 item 4): byte i holds
    code 2i in its LOW nibble and code 2i+1 in its HIGH nibble (odd m
    pads the final high nibble with 0). Halves the codes table vs
    byte-per-code at the same m, and a ksub=16 ADC LUT row fits a SIMD
    register on fast-scan kernels (André et al., "Cache locality is
    not enough", VLDB 2015)."""
    n, m = codes.shape
    if n and (codes.min() < 0 or codes.max() >= 16):
        raise ValueError(
            "pack_codes4 requires code values in [0, 16); got range "
            f"[{int(codes.min())}, {int(codes.max())}] — a value >= 16 "
            "would silently cross-contaminate the adjacent nibble. "
            "Train with ksub <= 16 for the 4-bit layout."
        )
    if m % 2:
        codes = np.concatenate(
            [codes, np.zeros((n, 1), dtype=codes.dtype)], axis=1
        )
    packed = (codes[:, 0::2] | (codes[:, 1::2] << 4)).astype(np.uint8)
    return [row.tobytes() for row in packed]


def unpack_codes4(raw: "Sequence[bytes]", m: int) -> np.ndarray:
    """Inverse of ``pack_codes4``: (n, m) int64 codes from the packed
    bytes. Vectorized — one frombuffer over the concatenated rows, two
    strided nibble extractions."""
    n = len(raw)
    B = np.frombuffer(b"".join(raw), dtype=np.uint8).reshape(n, -1)
    C = np.empty((n, m), dtype=np.int64)
    C[:, 0::2] = B[:, : (m + 1) // 2] & 0x0F
    if m > 1:
        C[:, 1::2] = B[:, : m // 2] >> 4
    return C


def ivfpq_encode(
    df: DataFrame,
    centroids: np.ndarray,
    codebooks: np.ndarray,
    vec_col: str = "embedding",
    rotation: np.ndarray | None = None,
    pack4: bool = False,
    whiten: np.ndarray | None = None,
) -> DataFrame:
    """Add ``cell`` (coarse assignment) and ``pq_code`` (residual
    codes) in ONE Arrow pass — the bulk index build. Write the result
    partitioned by ``cell`` with only (id, cell, pq_code) and the
    serving scan reads a few small code files per probe.

    ``rotation``: OPQ rotation from ``train_opq`` — residuals are
    rotated (left-fold matvec, the oracle's exact arithmetic) before
    code assignment; the codebooks must be the rotated-residual books
    trained alongside it.

    ``pack4``: emit ``pq_code`` as nibble-packed BINARY (two codes per
    byte) instead of array<int> — requires ksub <= 16. The argmin code
    values are identical either way; only the storage layout changes
    (the serving kernel unpacks losslessly), so the exact oracles hold
    unchanged.

    ``whiten``: ZCA matrix from ``train_whitened_ivfpq`` — every
    vector enters the whitened coarse space (left-fold matvec, the
    oracle's exact arithmetic) BEFORE cell assignment, and the
    residual/PQ pipeline runs on the whitened coordinates (the
    centroids and codebooks must be the whitened-space model trained
    alongside W). Composes with ``rotation`` (OPQ on whitened
    residuals) and ``pack4`` (storage-only)."""
    import pandas as pd
    from pyspark.sql.functions import PandasUDFType, pandas_udf

    cents = np.asarray(centroids, dtype=np.float64)
    books = np.asarray(codebooks, dtype=np.float64)
    rot = (
        np.asarray(rotation, dtype=np.float64)
        if rotation is not None
        else None
    )
    wmat = (
        np.asarray(whiten, dtype=np.float64) if whiten is not None else None
    )
    m, ksub, dsub = books.shape
    if wmat is not None and wmat.shape != (m * dsub, m * dsub):
        raise ValueError(
            f"whiten is {wmat.shape}, codebooks cover dim {m * dsub}"
        )
    if pack4 and ksub > 16:
        raise ValueError(
            f"pack4 stores one code per nibble; ksub {ksub} > 16 codes "
            "cannot round-trip — train with ksub <= 16 or store unpacked"
        )
    c_t = cents.T.copy()
    c_sq = (cents**2).sum(axis=1)
    flats = [books[j].T.copy() for j in range(m)]
    sqs = [(books[j] ** 2).sum(axis=1) for j in range(m)]
    code_type = "binary" if pack4 else "array<int>"

    @pandas_udf(
        f"struct<cell:int, pq_code:{code_type}>", PandasUDFType.SCALAR
    )
    def enc(vecs):
        mat = np.stack(vecs.to_numpy()).astype(np.float64)
        if wmat is not None:
            mat = fold_matvec(mat, wmat)
        d = (mat**2).sum(axis=1)[:, None] - 2.0 * (mat @ c_t) + c_sq[None, :]
        cell = d.argmin(axis=1)
        res = mat - cents[cell]
        if rot is not None:
            res = fold_matvec(res, rot)
        codes = np.empty((len(mat), m), dtype=np.int32)
        for j in range(m):
            sub = res[:, j * dsub : (j + 1) * dsub]
            dj = -2.0 * (sub @ flats[j]) + sqs[j][None, :]
            codes[:, j] = dj.argmin(axis=1)
        return pd.DataFrame(
            {
                "cell": cell.astype("int32"),
                "pq_code": pack_codes4(codes) if pack4 else list(codes),
            }
        )

    out = df.withColumn("__enc", enc(F.col(vec_col)))
    return out.withColumn("cell", F.col("__enc.cell")).withColumn(
        "pq_code", F.col("__enc.pq_code")
    ).drop("__enc")


def ivfpq_search(
    encoded: DataFrame,
    centroids: np.ndarray,
    codebooks: np.ndarray,
    probe: Sequence[float],
    k: int = 10,
    nprobe: int = 4,
    refine: int = 8,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    raw: DataFrame | None = None,
    rotation: np.ndarray | None = None,
) -> DataFrame:
    """ADC search over the ``nprobe`` nearest cells with PER-CELL
    lookup tables (each cell's LUT is built from the probe's residual
    against THAT cell's centroid — exact IVF-PQ semantics). The LUTs
    are literals in a chained CASE on ``cell``: nprobe * m * ksub
    doubles baked into the plan, zero Python at serving time. The cell
    IN-list prunes partitions/files when the codes table is written
    partitioned by cell. Optional exact re-rank via ``raw`` join-back.

    ``rotation``: OPQ rotation matching the snapshot's
    ``ivfpq_encode(rotation=)`` — the probe residual enters the
    rotated code space before the LUT build (driver-side, so a plain
    matvec would do numerically, but the left-fold form keeps the
    values identical to the batched kernel's).
    """
    from pyspark.sql.types import BinaryType

    if isinstance(encoded.schema["pq_code"].dataType, BinaryType):
        raise ValueError(
            "ivfpq_search cannot serve a pack4 (nibble-packed binary "
            "pq_code) snapshot — its element_at LUT probe needs the "
            "array<int> layout. Serve packed codes through "
            "ann_join_topk (which carries the 4-bit ADC kernel), or "
            "re-encode with pack4=False."
        )
    cents = np.asarray(centroids, dtype=np.float64)
    books = np.asarray(codebooks, dtype=np.float64)
    rot = (
        np.asarray(rotation, dtype=np.float64)
        if rotation is not None
        else None
    )
    m, ksub, dsub = books.shape
    p = np.asarray(list(probe), dtype=np.float64)
    order = np.argsort(((cents - p) ** 2).sum(axis=1))
    cells = [int(c) for c in order[:nprobe]]

    def adc_for_cell(cell: int):
        r = p - cents[cell]
        if rot is not None:
            r = fold_matvec(r[None, :], rot)[0]
        expr = F.lit(0.0)
        for j in range(m):
            lut_np = ((books[j] - r[j * dsub : (j + 1) * dsub][None, :]) ** 2).sum(axis=1)
            lut = _dbl_array_lit(lut_np)
            expr = expr + F.element_at(lut, F.element_at(F.col("pq_code"), j + 1) + 1)
        return expr

    # chained CASE on cell: each branch is that cell's own LUT sum
    # (exact residual semantics); measured faster to analyze+execute
    # than one flattened 8k-literal array with computed offsets
    adc = F.when(F.col("cell") == cells[0], adc_for_cell(cells[0]))
    for c in cells[1:]:
        adc = adc.when(F.col("cell") == c, adc_for_cell(c))

    cand_cols = [id_col, "cell", "pq_code"] if raw is not None else None
    base = encoded.filter(F.col("cell").isin(cells))
    if cand_cols is not None:
        base = base.select(*cand_cols)
    scored = base.withColumn("adc_dist", adc)
    if not refine:
        return scored.orderBy(F.col("adc_dist").asc(), F.col(id_col).asc()).limit(k)
    cand = scored.orderBy(F.col("adc_dist").asc(), F.col(id_col).asc()).limit(
        k * refine
    )
    if raw is not None:
        cand = F.broadcast(cand.select(id_col, "adc_dist")).join(raw, id_col)
    exact = cand.withColumn(
        "dist", metric_expr("euclidean_sq", vec_col, list(probe))
    )
    return exact.orderBy(F.col("dist").asc(), F.col(id_col).asc()).limit(k)


# --- IMI: two-level (product-decomposed) coarse quantizer --------------------
# The 100 TB form of the coarse model (VERDICT r9 design note): an
# IVF over C cells ships an O(C x dim) centroid matrix with every
# serving job — at 10^6 cells x 64 dims that is half a gigabyte of
# model state. The inverted multi-index (Babenko & Lempitsky, "The
# Inverted Multi-Index", CVPR 2012) decomposes the coarse space into
# the PRODUCT of two half-dimension codebooks: cell (c1, c2) has
# center concat(C1[c1], C2[c2]), so K1*K2 cells ship as
# O((K1 + K2) x dim/2) values — 65,536 cells from two 256-row
# codebooks (~1000x less model state at 10^6 cells), and assignment
# costs O(K1 + K2) half-folds per probe instead of O(C) full folds
# because squared euclidean distance to a product center decomposes:
# ||x - (u1 (+) u2)||^2 = ||x_lo - u1||^2 + ||x_hi - u2||^2.


def train_imi_np(
    sample: np.ndarray,
    k1: int = 32,
    k2: int = 32,
    m: int = 8,
    ksub: int = 256,
    iters: int = 5,
    seed: int = 42,
):
    """Numpy core of ``train_imi`` (same sample -> same model, no
    Spark — used by the exact SQL oracles). Returns (c1, c2, books):
    two half-dimension coarse codebooks plus residual PQ codebooks
    trained against the PRODUCT cell centers (the same residual
    construction as train_ivfpq_np, with the cell center assembled
    from the two halves)."""
    dim = sample.shape[1]
    dh = dim // 2
    c1 = train_centroids_np(sample[:, :dh], k1, iters, seed)
    c2 = train_centroids_np(sample[:, dh:], k2, iters, seed + 7)
    # product-cell assignment decomposes into per-half argmins
    a1 = ((sample[:, None, :dh] - c1[None, :, :]) ** 2).sum(axis=2).argmin(axis=1)
    a2 = ((sample[:, None, dh:] - c2[None, :, :]) ** 2).sum(axis=2).argmin(axis=1)
    residuals = sample - np.concatenate([c1[a1], c2[a2]], axis=1)
    dsub = dim // m
    rng = np.random.RandomState(seed + 1)
    books = np.empty((m, ksub, dsub), dtype=np.float64)
    for j in range(m):
        sub = residuals[:, j * dsub : (j + 1) * dsub]
        idx = rng.choice(len(sub), size=min(ksub, len(sub)), replace=False)
        cb = sub[idx].copy()
        for _ in range(iters):
            d = ((sub[:, None, :] - cb[None, :, :]) ** 2).sum(axis=2)
            a = d.argmin(axis=1)
            for c in range(len(cb)):
                members = sub[a == c]
                if len(members):
                    cb[c] = members.mean(axis=0)
        books[j, : len(cb)] = cb
        if len(cb) < ksub:
            books[j, len(cb) :] = cb[-1]
    return c1, c2, books


def train_imi(
    df: DataFrame,
    k1: int = 32,
    k2: int = 32,
    m: int = 8,
    ksub: int = 256,
    vec_col: str = "embedding",
    iters: int = 5,
    sample_rows: int = 8192,
    seed: int = 42,
    sample_id_col: str | None = None,
):
    """Train the two-level coarse quantizer + residual PQ codebooks.
    Sampling contract as train_ivfpq (pass ``sample_id_col`` for the
    seeded-uniform rule)."""
    sample = _training_sample(df, vec_col, sample_rows, sample_id_col)
    return train_imi_np(
        sample, k1=k1, k2=k2, m=m, ksub=ksub, iters=iters, seed=seed
    )


def imi_product_centroids(c1: np.ndarray, c2: np.ndarray) -> np.ndarray:
    """Materialize the (K1*K2 x dim) product-centroid matrix — the
    bridge to the single-level machinery (small-K parity tests, and
    executor-side materialization where K1*K2 is modest). Cell ids
    follow the canonical layout ``cell = c1 * K2 + c2``."""
    K1, dh = c1.shape
    K2 = len(c2)
    out = np.empty((K1 * K2, dh + c2.shape[1]), dtype=np.float64)
    out[:, :dh] = np.repeat(c1, K2, axis=0)
    out[:, dh:] = np.tile(c2, (K1, 1))
    return out


def imi_encode(
    df: DataFrame,
    c1: np.ndarray,
    c2: np.ndarray,
    codebooks: np.ndarray,
    vec_col: str = "embedding",
    rotation: np.ndarray | None = None,
) -> DataFrame:
    """Add ``cell`` (product-cell assignment, ``cell = a1 * K2 + a2``)
    and ``pq_code`` (residual codes) in one Arrow pass — the IMI index
    build. The assignment never materializes the K1*K2 centroid
    matrix: per-half matmul argmins compose into the exact product
    argmin (the distance decomposes across the halves), so the build
    cost per row is O((K1 + K2) * dim/2) instead of O(K1*K2 * dim).
    Output schema matches ivfpq_encode, so the partitioned-write /
    serving-scan contract is unchanged.

    ``rotation``: OPQ rotation applied to the PRODUCT-CELL residual
    before code assignment (same contract as ``ivfpq_encode`` — the
    rotation lives in the residual space, so it composes with the
    product-decomposed coarse stage unchanged; only the residual
    codes move)."""
    import pandas as pd
    from pyspark.sql.functions import PandasUDFType, pandas_udf

    c1m = np.asarray(c1, dtype=np.float64)
    c2m = np.asarray(c2, dtype=np.float64)
    books = np.asarray(codebooks, dtype=np.float64)
    rot = (
        np.asarray(rotation, dtype=np.float64)
        if rotation is not None
        else None
    )
    m, ksub, dsub = books.shape
    K2 = len(c2m)
    dh = c1m.shape[1]
    c1_t = c1m.T.copy()
    c2_t = c2m.T.copy()
    c1_sq = (c1m**2).sum(axis=1)
    c2_sq = (c2m**2).sum(axis=1)
    flats = [books[j].T.copy() for j in range(m)]
    sqs = [(books[j] ** 2).sum(axis=1) for j in range(m)]

    @pandas_udf(
        "struct<cell:int, pq_code:array<int>>", PandasUDFType.SCALAR
    )
    def enc(vecs):
        mat = np.stack(vecs.to_numpy()).astype(np.float64)
        lo, hi = mat[:, :dh], mat[:, dh:]
        d1 = (lo**2).sum(axis=1)[:, None] - 2.0 * (lo @ c1_t) + c1_sq[None, :]
        d2 = (hi**2).sum(axis=1)[:, None] - 2.0 * (hi @ c2_t) + c2_sq[None, :]
        a1 = d1.argmin(axis=1)
        a2 = d2.argmin(axis=1)
        cell = a1 * K2 + a2
        res = mat - np.concatenate([c1m[a1], c2m[a2]], axis=1)
        if rot is not None:
            res = fold_matvec(res, rot)
        codes = np.empty((len(mat), m), dtype=np.int32)
        for j in range(m):
            sub = res[:, j * dsub : (j + 1) * dsub]
            dj = -2.0 * (sub @ flats[j]) + sqs[j][None, :]
            codes[:, j] = dj.argmin(axis=1)
        return pd.DataFrame(
            {"cell": cell.astype("int32"), "pq_code": list(codes)}
        )

    out = df.withColumn("__enc", enc(F.col(vec_col)))
    return out.withColumn("cell", F.col("__enc.cell")).withColumn(
        "pq_code", F.col("__enc.pq_code")
    ).drop("__enc")
