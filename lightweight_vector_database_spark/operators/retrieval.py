"""Hybrid retrieval operators: BM25 scoring, reciprocal-rank fusion,
conjunctive boolean search, and binary (1-bit) vector quantization
with Hamming-distance candidate generation.

These are the serving-side composition layer over the engine's two
retrieval families — lexical (tokenize/BM25, functions/text.py) and
vector (kNN / ANN, operators/knn.py, operators/similarity.py). The
reference exposes only the vector leg (find_k_nearest_neighbors,
kd_tree_database.py:285-304); production vector stores pair it with a
lexical leg and fuse, which is what ``rrf_fuse`` provides.

Scale shapes:

- ``bm25_scores`` filters the exploded token stream to the |Q| query
  terms BEFORE the (doc, term) shuffle — at 100 TB only postings for
  the query terms move, never the corpus vocabulary. Corpus stats and
  document frequencies are broadcast back.
- ``rrf_fuse`` joins k-row ranked lists — driver-free but trivially
  small (top-k per leg), so every join side is broadcastable.
- ``binary_quantize`` packs sign bits into two 32-bit words per
  64-dim vector entirely in codegen (no UDF): 16x smaller than
  float32, and Hamming distance is two XOR+POPCNT ops — the standard
  first-stage filter in modern vector stores. ``hamming_rerank``
  composes it with an exact re-rank, mirroring the PQ/ADC re-rank
  pattern in operators/similarity.py.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions import text as T
from ..functions.distance import metric_expr

__all__ = [
    "bm25_scores",
    "rrf_fuse",
    "boolean_all_terms",
    "binary_quantize",
    "pack_sign_bits",
    "hamming_distance",
    "hamming_rerank",
    "maxsim_score",
    "sq8_train",
    "sq8_rerank",
    "mmr_select",
]


def bm25_scores(
    docs: DataFrame,
    terms: Sequence[str],
    k1: float = 1.2,
    b: float = 0.75,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Okapi BM25 scores for a fixed query-term set.

    Returns (id_col, n_terms, bm25) for every document matching at
    least one term. Per-term contributions are quantized to integer
    micro-units before the per-doc sum so the score is independent of
    float summation order (engine-portable, same convention as the
    TPC-H q6 oracle).
    """
    terms = list(terms)
    if not terms:
        raise ValueError("terms must be non-empty")
    dl = docs.select(id_col, T.token_count(text_col).alias("dl"))
    stats = dl.agg(
        F.count(F.lit(1)).alias("n_docs"), F.avg("dl").alias("avgdl")
    )
    tf = (
        docs.select(id_col, F.explode(T.tokens(text_col)).alias("term"))
        .filter(F.col("term").isin(*terms))
        .groupBy(id_col, "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    dfc = tf.groupBy("term").agg(F.countDistinct(id_col).alias("df"))
    idf = F.log(
        F.lit(1.0)
        + (F.col("n_docs") - F.col("df") + F.lit(0.5))
        / (F.col("df") + F.lit(0.5))
    )
    denom = F.col("tf") + F.lit(k1) * (
        F.lit(1.0 - b) + F.lit(b) * F.col("dl") / F.col("avgdl")
    )
    comp = (
        tf.join(F.broadcast(dfc), "term")
        .join(dl, id_col)
        .join(F.broadcast(stats))
        .withColumn(
            "cu",
            F.floor(
                idf * (F.col("tf") * F.lit(k1 + 1.0)) / denom * F.lit(1e6)
            ).cast("long"),
        )
    )
    return comp.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_terms"),
        (F.sum("cu") / F.lit(1e6)).alias("bm25"),
    )


def rrf_fuse(
    legs: dict[str, DataFrame],
    id_col: str = "id",
    rank_col: str = "rank",
    k_const: int = 60,
) -> DataFrame:
    """Reciprocal-rank fusion over named ranked lists.

    Each leg is a DataFrame with (id_col, rank_col) where rank is a
    1-based position; ids absent from a leg contribute 0. Returns one
    row per id seen in any leg with ``rank_<leg>`` columns (null where
    absent) and ``rrf = sum(1 / (k_const + rank))``.

    All legs are top-k lists (tiny by construction), so the full-outer
    chain never shuffles meaningful data; the fused relation is at
    most sum(len(leg)) rows.
    """
    if not legs:
        raise ValueError("legs must be non-empty")
    fused: DataFrame | None = None
    for name, leg in legs.items():
        one = leg.select(
            F.col(id_col), F.col(rank_col).cast("long").alias(f"rank_{name}")
        )
        fused = one if fused is None else fused.join(one, id_col, "full_outer")
    score: Column = F.lit(0.0)
    for name in legs:
        score = score + F.coalesce(
            F.lit(1.0) / (F.lit(float(k_const)) + F.col(f"rank_{name}")),
            F.lit(0.0),
        )
    return fused.withColumn("rrf", score)


def boolean_all_terms(
    docs: DataFrame,
    terms: Sequence[str],
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Conjunctive (AND) keyword search: ids of documents containing
    EVERY term in ``terms`` at least once.

    Plan: explode -> filter to |Q| terms -> groupBy(doc) countDistinct
    == |Q|. The filter runs before the shuffle, so only postings for
    the query terms move — the same inverted-list shape as
    ``bm25_scores``, and the degenerate (|Q|=1) case is a semi-join.
    """
    terms = list(dict.fromkeys(terms))
    if not terms:
        raise ValueError("terms must be non-empty")
    return (
        docs.select(id_col, F.explode(T.tokens(text_col)).alias("term"))
        .filter(F.col("term").isin(*terms))
        .groupBy(id_col)
        .agg(F.countDistinct("term").alias("n_matched"))
        .filter(F.col("n_matched") == len(terms))
        .select(id_col)
    )


def pack_sign_bits(vec: Column | str, lo: int, hi: int) -> Column:
    """Pack sign bits of vector components ``lo..hi`` (1-based,
    inclusive) into a non-negative long: bit (i - lo) is set iff
    vec[i] > 0. ``hi - lo`` must be < 63 so the word stays positive
    (ANSI-safe). Pure codegen — an aggregate over a literal sequence
    with exact power-of-two double arithmetic; no UDF."""
    if hi - lo >= 63:
        raise ValueError("at most 63 bits per word")
    v = F.col(vec) if isinstance(vec, str) else vec
    return F.aggregate(
        F.sequence(F.lit(lo), F.lit(hi)),
        F.lit(0).cast("long"),
        lambda acc, i: acc
        + F.when(
            F.element_at(v, i) > 0,
            F.pow(F.lit(2.0), (i - F.lit(lo)).cast("double")).cast("long"),
        ).otherwise(F.lit(0).cast("long")),
    )


def binary_quantize(
    df: DataFrame, vec_col: str = "embedding", dim: int = 64
) -> DataFrame:
    """Add packed sign-bit words ``w0`` (dims 1..dim/2) and ``w1``
    (dims dim/2+1..dim) — 1-bit-per-dimension quantization, 16x
    smaller than the float32 vector at dim 64. Split into two 32-bit
    halves so each word is far from the signed-long boundary and the
    packing replays exactly in ANSI SQL."""
    if dim % 2 != 0:
        raise ValueError("dim must be even")
    half = dim // 2
    return df.withColumn("w0", pack_sign_bits(vec_col, 1, half)).withColumn(
        "w1", pack_sign_bits(vec_col, half + 1, dim)
    )


def hamming_distance(
    w0: Column | str, w1: Column | str, p0: int, p1: int
) -> Column:
    """Hamming distance between a packed row (w0, w1) and packed probe
    literals (p0, p1): two XOR + POPCNT ops, whole-stage codegen."""
    w0 = F.col(w0) if isinstance(w0, str) else w0
    w1 = F.col(w1) if isinstance(w1, str) else w1
    return (
        F.bit_count(w0.bitwiseXOR(F.lit(p0)))
        + F.bit_count(w1.bitwiseXOR(F.lit(p1)))
    ).cast("long")


def mmr_select(
    df: DataFrame,
    probe: Sequence[float],
    k: int,
    pool: int,
    relevance_weight: float = 0.7,
    diversity_weight: float = 0.3,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Maximal Marginal Relevance diversified top-k: greedily pick the
    candidate maximizing

        diversity_weight * min_{s in selected} dist(d, s)
        - relevance_weight * dist(d, probe)

    (squared Euclidean; the first pick is the plain nearest neighbor;
    ties to the smallest id). The weights are taken as two independent
    literals rather than (lam, 1-lam) so no derived float constant has
    to replay across engines.

    Scale shape: the candidate pool is reduced distributed
    (TakeOrderedAndProject, any base size); the greedy scan then runs
    over the pool's O(pool x dim) vectors on the driver — pool is
    serving-path metadata like a codebook, bounded by the parameter,
    never the corpus. Returned scores (dq) are recomputed as engine
    expressions on the selected rows, so result values come from the
    cluster, not the driver.
    """
    probe = [float(x) for x in probe]
    if k < 1 or pool < k:
        raise ValueError("need pool >= k >= 1")
    dq_expr = metric_expr("euclidean_sq", vec_col, probe)
    pool_rows = (
        df.withColumn("dq", dq_expr)
        .orderBy(F.col("dq").asc(), F.col(id_col).asc())
        .limit(pool)
        .select(id_col, vec_col, "dq")
        .collect()
    )

    def d2(a: list[float], b: list[float]) -> float:
        acc = 0.0  # left fold — matches the SQL list_sum / Spark aggregate
        for x, y in zip(a, b):
            acc += (x - y) * (x - y)
        return acc

    cands = {
        int(r[id_col]): ([float(x) for x in r[vec_col]], float(r["dq"]))
        for r in pool_rows
    }
    selected: list[int] = []
    first = min(cands, key=lambda i: (cands[i][1], i))
    selected.append(first)
    while len(selected) < k:
        best_id, best_score = None, None
        for i in sorted(set(cands) - set(selected)):
            v, dq = cands[i]
            min_ds = min(d2(v, cands[s][0]) for s in selected)
            score = (diversity_weight * min_ds) - (relevance_weight * dq)
            if best_score is None or score > best_score:
                best_id, best_score = i, score
        selected.append(best_id)

    step_expr: Column = F.lit(None).cast("long")
    for step, i in enumerate(selected, start=1):
        step_expr = F.when(F.col(id_col) == i, F.lit(step)).otherwise(step_expr)
    return (
        df.filter(F.col(id_col).isin(selected))
        .withColumn("step", step_expr.cast("long"))
        .withColumn("dq", dq_expr)
        .select("step", id_col, "dq")
    )


def sq8_train(
    df: DataFrame, vec_col: str = "embedding", dim: int = 64
) -> tuple[list[float], list[float]]:
    """Train the SQ8 (per-dimension int8 scalar) quantizer: one
    distributed min/max pass, returning (lo, hi) lists of length dim.
    Only the 2 x dim quantizer parameters touch the driver — they are
    index METADATA, shipped into scoring expressions as literals
    (exactly how production SQ indexes store their trained ranges)."""
    # one posexplode + groupBy(dim) pass instead of 2 x dim separate
    # agg expressions: the wide-agg form cost ~2s of driver-side
    # expression construction (128 aliased columns) for the same exact
    # per-dimension min/max values
    rows = (
        df.select(
            F.posexplode(F.col(vec_col).cast("array<double>")).alias(
                "__i", "__x"
            )
        )
        .groupBy("__i")
        .agg(F.min("__x").alias("__lo"), F.max("__x").alias("__hi"))
        .collect()
    )
    if len(rows) != dim:
        raise ValueError(f"expected {dim} dimensions, found {len(rows)}")
    by_i = {int(r["__i"]): r for r in rows}
    lo = [float(by_i[i]["__lo"]) for i in range(dim)]
    hi = [float(by_i[i]["__hi"]) for i in range(dim)]
    return lo, hi


def sq8_rerank(
    df: DataFrame,
    probe: Sequence[float],
    k: int,
    candidates: int,
    lo: Sequence[float],
    hi: Sequence[float],
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Two-stage ANN over int8 scalar quantization: approximate
    distance against the DEQUANTIZED codes (the asymmetric-distance
    scoring SQ indexes serve with — 4x less data than float32), exact
    re-rank of the ``candidates`` survivors.

    The quantize -> dequantize -> distance chain is one codegen fold
    per row (no explode, no shuffle, no stored codes needed for the
    semantics — a real index would persist the code bytes; the
    arithmetic here is identical). Returns (id_col, adist, dist)
    top-k by exact distance, ties to id."""
    probe = [float(x) for x in probe]
    dim = len(probe)
    if not (len(lo) == len(hi) == dim):
        raise ValueError("lo/hi/probe dims differ")
    if any(h <= l for l, h in zip(lo, hi)):
        # a zero-width range would divide by zero in the code map;
        # constant dimensions must be dropped before quantization
        raise ValueError("every quantizer range must have hi > lo")
    from ..functions.distance import vec_lit

    # one F.expr literal per array instead of 3 x dim F.lit py4j round
    # trips (same values — see vec_lit's bit-exactness note)
    v = F.col(vec_col)
    lo_a = vec_lit(lo)
    hi_a = vec_lit(hi)
    p_a = vec_lit(probe)

    def recon(i: Column) -> Column:
        x = F.element_at(v, i).cast("double")
        l, h = F.element_at(lo_a, i), F.element_at(hi_a, i)
        code = F.least(
            F.greatest(F.floor((x - l) / (h - l) * F.lit(255.0)), F.lit(0)),
            F.lit(255),
        )
        return l + (code + F.lit(0.5)) * (h - l) / F.lit(256.0)

    adist = F.aggregate(
        F.sequence(F.lit(1), F.lit(dim)),
        F.lit(0.0),
        lambda acc, i: acc
        + (recon(i) - F.element_at(p_a, i)) * (recon(i) - F.element_at(p_a, i)),
    )
    cand = (
        df.withColumn("adist", adist)
        .orderBy(F.col("adist").asc(), F.col(id_col).asc())
        .limit(candidates)
    )
    dist = metric_expr("euclidean_sq", vec_col, probe)
    return (
        cand.withColumn("dist", dist)
        .orderBy(F.col("dist").asc(), F.col(id_col).asc())
        .limit(k)
    )


def maxsim_score(
    df: DataFrame,
    queries: Sequence[Sequence[float]],
    group_col: str,
    vec_col: str = "embedding",
) -> DataFrame:
    """Late-interaction (ColBERT-style) MaxSim scoring: each group of
    rows in ``df`` is one multi-vector document; the score against a
    multi-vector query is sum over query vectors of the max dot
    product with any document vector.

    Returns (group_col, maxsim) for every group. Per-query dot
    products are codegen'd literal folds; the group reduction is one
    partial-aggregating groupBy with |queries| max() columns — at
    100 TB the shuffle carries |groups| x |queries| doubles, never
    the vectors. Dot products are quantized to integer micro-units
    before the cross-query sum so the score is independent of float
    summation order (engine-portable).
    """
    queries = [[float(x) for x in q] for q in queries]
    if not queries:
        raise ValueError("queries must be non-empty")

    def dot(q: list[float]) -> Column:
        return F.aggregate(
            F.sequence(F.lit(1), F.lit(len(q))),
            F.lit(0.0),
            lambda acc, i: acc
            + F.element_at(F.col(vec_col), i).cast("double")
            * F.element_at(F.array(*[F.lit(x) for x in q]), i),
        )

    scored = df.select(
        group_col,
        *[
            F.floor(dot(q) * F.lit(1e6)).cast("long").alias(f"dot_{j}")
            for j, q in enumerate(queries)
        ],
    )
    agg = scored.groupBy(group_col).agg(
        *[F.max(f"dot_{j}").alias(f"m_{j}") for j in range(len(queries))]
    )
    total: Column = F.lit(0).cast("long")
    for j in range(len(queries)):
        total = total + F.col(f"m_{j}")
    return agg.select(group_col, (total / F.lit(1e6)).alias("maxsim"))


def hamming_rerank(
    df: DataFrame,
    probe: Sequence[float],
    k: int,
    candidates: int,
    metric: str = "euclidean_sq",
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    dim: int = 64,
) -> DataFrame:
    """Two-stage ANN: Hamming-distance candidate cut over 1-bit
    quantized vectors, exact-distance re-rank of the survivors.

    Stage 1 scans packed words only (TakeOrderedAndProject on the
    2-word relation — at 100 TB that is a 16x-smaller scan than the
    raw vectors, and the per-row cost is two XOR+POPCNT). Stage 2
    recomputes the exact metric for ``candidates`` rows. Ties at both
    stages break by id so the result is total-ordered.
    """
    probe = [float(x) for x in probe]
    if len(probe) != dim:
        raise ValueError(f"probe dim {len(probe)} != {dim}")
    half = dim // 2
    p0 = sum(1 << i for i in range(half) if probe[i] > 0)
    p1 = sum(1 << i for i in range(half) if probe[half + i] > 0)
    packed = binary_quantize(df, vec_col=vec_col, dim=dim)
    cand = (
        packed.withColumn("hamming", hamming_distance("w0", "w1", p0, p1))
        .orderBy(F.col("hamming").asc(), F.col(id_col).asc())
        .limit(candidates)
    )
    dist = metric_expr(metric, vec_col, probe)
    return (
        cand.withColumn("dist", dist)
        .orderBy(F.col("dist").asc(), F.col(id_col).asc())
        .limit(k)
    )
