"""Training-pipeline queries, second batch (round 7): declarative
data-quality auditing, incremental materialized-aggregate maintenance,
corpus-LM perplexity scoring, PCA projection, stratified sampling.

* ``quality_audit_events`` — a Deequ-style constraint report
  (completeness / uniqueness / bounds / accepted set / regex /
  referential integrity) compiled into ONE scan + one broadcast probe
  (operators/quality_audit.py); the oracle recomputes every count as
  plain SQL scalar subqueries;
* ``incremental_agg_orders`` — a per-customer count/sum matview
  maintained from the delta store's CDC feed across four commits
  (full → append → delete → mixed), each refresh ONE O(changed-groups)
  commit_mutation on the matview's own store — the base table is
  never rescanned (operators/incremental.py); the oracle recomputes
  the aggregate from the net final state by SQL set algebra;
* ``text_bigram_perplexity`` — add-k bigram LM trained on the corpus
  itself, per-doc cross-entropy (the CCNet/KenLM quality filter
  reshaped as pure dataflow; operators/lm.py), top-20 most-surprising
  docs, arithmetic replayed exactly in SQL;
* ``embedding_pca_top`` — 64-d embeddings projected onto 4 principal
  components trained on the seeded-uniform sample
  (operators/pca.py); projection is unrolled codegen multiply-adds;
  the oracle retrains the identical model in numpy and replays the
  projection with components embedded as SQL literals;
* ``curation_stratified_sample`` — exactly 10 docs per source via
  rank-over-salted-hash (operators/sampling.stratified_sample), the
  exact-size draw ``df.sampleBy`` can't give.
"""

from __future__ import annotations

import numpy as np

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators import quality_audit as qa
from ..operators.lm import bigram_lm_scores
from ..operators.pca import pca_project, train_pca, train_pca_np
from ..operators.sampling import stratified_sample
from ..sources import load_table
from . import register
from .index_suite import _ORACLE_SF_DIR, _dlst2
from .streaming_suite import _session_store_dir

# --- data-quality audit -----------------------------------------------------


def _quality_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Six-constraint audit over events (+ customer as the dimension):
    two designed to FAIL on the synthetic data (value bound, accepted
    set without 'error') so the report exercises both verdicts.  One
    scan for the five row-local/unique checks, one broadcast-probe
    count for referential integrity."""
    ev = load_table(spark, sf_dir, "events")
    cust = load_table(spark, sf_dir, "customer")
    report = qa.audit(
        ev,
        [
            qa.complete("user_id"),
            qa.unique("event_id"),
            qa.in_range("value", 0.0, 100.0),
            qa.accepted("event_type", ["click", "view", "purchase", "signup"]),
            qa.matches("event_type", "^[a-z]+$"),
            qa.references("user_id", cust, "c_custkey", "ref(user_id->customer)"),
        ],
    )
    return report.orderBy("constraint")


register(
    "quality_audit_events",
    _quality_audit,
    """
WITH t AS (SELECT count(*) AS total FROM events),
rep AS (
  SELECT 'accepted(event_type)' AS "constraint", t.total,
         (SELECT count(*) FROM events WHERE event_type IS NOT NULL
            AND event_type NOT IN ('click','view','purchase','signup'))
           AS violations
  FROM t
  UNION ALL
  SELECT 'complete(user_id)', t.total,
         (SELECT count(*) FROM events WHERE user_id IS NULL) FROM t
  UNION ALL
  SELECT 'in_range(value,0.0,100.0)', t.total,
         (SELECT count(*) FROM events WHERE value IS NOT NULL
            AND value NOT BETWEEN 0.0 AND 100.0) FROM t
  UNION ALL
  SELECT 'matches(event_type)', t.total,
         (SELECT count(*) FROM events WHERE event_type IS NOT NULL
            AND NOT regexp_matches(event_type, '^[a-z]+$')) FROM t
  UNION ALL
  SELECT 'ref(user_id->customer)',
         (SELECT count(*) FROM events WHERE user_id IS NOT NULL),
         (SELECT count(*) FROM events e WHERE e.user_id IS NOT NULL
            AND e.user_id NOT IN (SELECT c_custkey FROM customer)) FROM t
  UNION ALL
  SELECT 'unique(event_id)', t.total,
         (SELECT count(*) - count(DISTINCT event_id) FROM events) FROM t
)
SELECT "constraint", total, violations, violations = 0 AS passed
FROM rep ORDER BY "constraint"
""",
)


# --- incremental materialized aggregate -------------------------------------

_MAT_MEMO: dict[str, object] = {}


def _incremental_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-custkey (count, sum(price)) matview maintained incrementally
    across four base commits.  Every refresh after the first runs the
    INCREMENTAL path (asserted) — the base table's files are never
    rescanned; the refresh cost is O(changed rows) + O(touched
    groups).  Returns a live plan over the matview store."""
    from ..operators.incremental import MaterializedAggregate
    from ..sources.delta_snapshots import DeltaSnapshotStore

    d, fresh = _session_store_dir("matagg", sf_dir)
    if fresh:
        o = load_table(spark, sf_dir, "orders").select(
            "o_orderkey", "o_custkey", "o_totalprice"
        )
        k = F.col("o_orderkey")
        base = DeltaSnapshotStore(spark, f"{d}/base", id_col="o_orderkey")
        view = DeltaSnapshotStore(spark, f"{d}/view", id_col="o_custkey")
        mat = MaterializedAggregate(
            base, view, "o_custkey", ["o_totalprice"]
        )
        base.commit_full(o.filter((k % 7).isin(0, 1, 2)))           # v0
        mat.refresh()  # full (first build)
        base.commit_append(o.filter(k % 7 == 3))                    # v1
        mat.refresh()
        assert mat.last_refresh_mode == "incremental"
        base.commit_delete(                                         # v2
            o.filter((k % 7 == 0) & (k % 3 == 0)).select("o_orderkey")
        )
        mat.refresh()
        assert mat.last_refresh_mode == "incremental"
        base.commit_mutation(                                       # v3
            append_df=o.filter(k % 7 == 4),
            delete_ids=o.filter((k % 7 == 1) & (k % 2 == 0)).select(
                "o_orderkey"
            ),
        )
        mat.refresh()
        assert mat.last_refresh_mode == "incremental"
        _MAT_MEMO[sf_dir] = mat
    mat = _MAT_MEMO[sf_dir]
    return mat.read().select(
        "o_custkey",
        F.col("n").cast("long").alias("n"),
        F.round("sum_o_totalprice", 2).alias("sum_price"),
    )


register(
    "incremental_agg_orders",
    _incremental_agg,
    """
WITH final AS (
  SELECT o_custkey, o_totalprice FROM orders
  WHERE (o_orderkey % 7) IN (0, 1, 2, 3, 4)
    AND NOT (o_orderkey % 7 = 0 AND o_orderkey % 3 = 0)
    AND NOT (o_orderkey % 7 = 1 AND o_orderkey % 2 = 0)
)
SELECT o_custkey, count(*) AS n, round(sum(o_totalprice), 2) AS sum_price
FROM final GROUP BY o_custkey
""",
)


# --- bigram LM perplexity ---------------------------------------------------

_LM_K = 0.5
_LM_TOP = 20


def _bigram_perplexity(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    scored = bigram_lm_scores(docs, "text", "doc_id", k=_LM_K)
    return (
        scored.withColumn("ce", F.round("cross_entropy", 6))
        .orderBy(F.col("ce").desc(), F.col("doc_id").asc())
        .limit(_LM_TOP)
        .select("doc_id", "n_bigrams", F.col("ce").alias("cross_entropy"))
    )


register(
    "text_bigram_perplexity",
    _bigram_perplexity,
    f"""
WITH w AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
b AS (
  SELECT doc_id,
         unnest(list_transform(range(1, len(w)),
                i -> concat_ws(' ', w[i], w[i+1]))) AS bg
  FROM w
),
bw AS (SELECT doc_id, bg, string_split(bg, ' ')[1] AS w1 FROM b),
cbg AS (SELECT bg, count(*) AS c_bg FROM bw GROUP BY bg),
cw1 AS (SELECT w1, count(*) AS c_w1 FROM bw GROUP BY w1),
v AS (
  SELECT count(DISTINCT t) AS v
  FROM (SELECT unnest(w) AS t FROM w)
),
scored AS (
  SELECT doc_id, ln((c_bg + {_LM_K}) / (c_w1 + {_LM_K} * v)) AS logp
  FROM bw JOIN cbg USING (bg) JOIN cw1 USING (w1) CROSS JOIN v
),
agg AS (
  SELECT doc_id, count(*) AS n_bigrams, -avg(logp) AS ce
  FROM scored GROUP BY doc_id
)
SELECT doc_id, n_bigrams, round(ce, 6) AS cross_entropy
FROM agg ORDER BY round(ce, 6) DESC, doc_id ASC LIMIT {_LM_TOP}
""",
)


# --- PCA projection ---------------------------------------------------------

_PCA_COMPONENTS = 4
_PCA_SAMPLE = 2048
_PCA_DIM = 64
_PCA_TOP = 20
_PCA_MEMO: dict[str, tuple] = {}


def _pca_model(spark: SparkSession, sf_dir: str):
    if sf_dir not in _PCA_MEMO:
        emb = load_table(spark, sf_dir, "embeddings")
        _PCA_MEMO[sf_dir] = train_pca(
            emb,
            n_components=_PCA_COMPONENTS,
            vec_col="embedding",
            sample_rows=_PCA_SAMPLE,
            sample_id_col="vec_id",
        )
    return _PCA_MEMO[sf_dir]


def _pca_top(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 vectors by first-principal-component score.  The
    projection is d multiply-adds per component per row, all codegen;
    the plan is one TakeOrdered over the scan."""
    emb = load_table(spark, sf_dir, "embeddings")
    mean, comps, _ = _pca_model(spark, sf_dir)
    proj = pca_project(emb, mean, comps, vec_col="embedding")
    return (
        proj.orderBy(F.round("pc1", 6).desc(), F.col("vec_id").asc())
        .limit(_PCA_TOP)
        .select(
            "vec_id",
            "label",
            *[
                F.round(f"pc{j + 1}", 6).alias(f"pc{j + 1}")
                for j in range(_PCA_COMPONENTS)
            ],
        )
    )


def _build_pca_oracle() -> str | None:
    """Retrain the identical model from the identical seeded-uniform
    sample (ORDER BY md5(vec_id), top-2048) in numpy and replay the
    projection with the mean/components as SQL literals — the
    ann_pq_refined equivalence pattern."""
    try:
        import duckdb

        con = duckdb.connect()
        rows = con.execute(
            f"SELECT embedding FROM '{_ORACLE_SF_DIR}/embeddings.parquet' "
            f"ORDER BY md5(CAST(vec_id AS VARCHAR)) LIMIT {_PCA_SAMPLE}"
        ).fetchall()
        con.close()
    except Exception:
        return None
    if not rows:
        return None
    sample = np.array([r[0] for r in rows], dtype=np.float64)
    mean, comps, _ = train_pca_np(sample, _PCA_COMPONENTS)
    rng = f"range(1, {_PCA_DIM + 1})"
    pcs = []
    for j, comp in enumerate(comps):
        offset = float(-(mean * comp).sum())
        c_sql = _dlst2([comp.tolist()])  # [[...]] — take [1]
        pcs.append(
            f"({offset!r} + list_sum(list_transform({rng}, "
            f"i -> CAST(embedding[i] AS DOUBLE) * ({c_sql}[1])[i])))"
            f" AS pc{j + 1}"
        )
    proj = ",\n         ".join(pcs)
    cols = ", ".join(
        f"round(pc{j + 1}, 6) AS pc{j + 1}" for j in range(_PCA_COMPONENTS)
    )
    return f"""
WITH proj AS (
  SELECT vec_id, label,
         {proj}
  FROM embeddings
)
SELECT vec_id, label, {cols}
FROM proj ORDER BY round(pc1, 6) DESC, vec_id ASC LIMIT {_PCA_TOP}
"""


register("embedding_pca_top", _pca_top, _build_pca_oracle())


# --- stratified sampling ----------------------------------------------------

_STRAT_N = 10


def _stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    out = stratified_sample(docs, _STRAT_N, "source", "doc_id")
    return out.select(
        "source", "doc_id", "n_chars", F.round("skey", 6).alias("skey")
    )


register(
    "curation_stratified_sample",
    _stratified,
    f"""
WITH k AS (
  SELECT source, doc_id, n_chars,
         (('0x' || substr(md5('strat:' || CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT
          + 1) / 1152921504606846976.0 AS skey
  FROM documents
),
r AS (
  SELECT *, row_number() OVER (
    PARTITION BY source ORDER BY skey DESC, doc_id ASC
  ) AS rn
  FROM k
)
SELECT source, doc_id, n_chars, round(skey, 6) AS skey
FROM r WHERE rn <= {_STRAT_N}
""",
)
