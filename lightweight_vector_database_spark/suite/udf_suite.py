"""Grouped-map applyInPandas surface: per-group z-score normalization.

The UDF computes its mean from floor-quantized int64 sums, so results
are identical under any row order / partitioning — which is what lets
a pandas-side computation match a SQL oracle exactly."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources import load_table
from . import register


def _zscore_grouped(spark: SparkSession, sf_dir: str) -> DataFrame:
    import numpy as np
    import pandas as pd

    def zscore(pdf: pd.DataFrame) -> pd.DataFrame:
        q = np.floor(pdf["value"].to_numpy() * 1e6).astype("int64")
        n = len(q)
        mean = (q.sum() / n) / 1e6  # same division order as the oracle
        return pd.DataFrame(
            {
                "event_id": pdf["event_id"],
                "event_type": pdf["event_type"],
                "centered": np.round(pdf["value"].to_numpy() - mean, 6),
                "group_n": n,
            }
        )

    ev = load_table(spark, sf_dir, "events").filter(F.col("event_id") < 500)
    return ev.groupBy("event_type").applyInPandas(
        zscore, schema="event_id long, event_type string, centered double, group_n long"
    )


register(
    "grouped_map_zscore",
    _zscore_grouped,
    """
WITH g AS (
  SELECT event_type,
         CAST(SUM(CAST(floor(value * 1000000.0) AS BIGINT)) AS DOUBLE)
           / count(*) / 1000000.0 AS mean,
         count(*) AS group_n
  FROM events WHERE event_id < 500 GROUP BY event_type
)
SELECT e.event_id, e.event_type, round(e.value - g.mean, 6) AS centered,
       g.group_n
FROM events e JOIN g USING (event_type)
WHERE e.event_id < 500
""",
)


# --- Python UDTF (Spark 4 user-defined TABLE function) ----------------------

class _RepeatedTerms:
    """Shared UDTF body: per document, emit tokens appearing >= 3
    times. Per-row state in plain Python (a Counter) — the escape
    hatch for table-generating logic that doesn't decompose into
    explode+groupBy — while the oracle shows the relational
    equivalent for this particular function."""

    def eval(self, text: str):
        from collections import Counter

        for term, n in Counter((text or "").split(" ")).items():
            if n >= 3:
                yield term, n


def _repeated_terms_df(
    spark: SparkSession, sf_dir: str, use_arrow: bool
) -> DataFrame:
    from pyspark.sql.functions import udtf

    suffix = "arrow" if use_arrow else "row"
    fn = udtf(
        _RepeatedTerms, returnType="term: string, n: long",
        useArrow=use_arrow,
    )
    spark.udtf.register(f"repeated_terms_{suffix}", fn)
    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 200)
    docs.createOrReplaceTempView("_udtf_docs")
    return spark.sql(
        f"""SELECT d.doc_id, t.term, t.n
           FROM _udtf_docs d, LATERAL repeated_terms_{suffix}(d.text) t"""
    )


def _udtf_repeated_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """True Python UDTF in a LATERAL join, ARROW-OPTIMIZED
    (``useArrow=True`` — Spark 4 vectorizes the Python boundary with
    Arrow batch transfer instead of row-at-a-time pickling, the same
    10-100x transfer win as Pandas UDFs; VERDICT r7 item 3). The
    row-at-a-time form (``_repeated_terms_df(..., use_arrow=False)``)
    stays pytest-pinned equal as the legacy-API surface check.

    The production form of THIS particular function is still the
    codegen explode+groupBy twin (`udtf_bigram_explode` is the bench
    path); reach for a real UDTF only when the logic genuinely cannot
    decompose relationally.
    """
    return _repeated_terms_df(spark, sf_dir, use_arrow=True)


register(
    "udtf_repeated_terms",
    _udtf_repeated_terms,
    """
SELECT doc_id, term, count(*) AS n FROM (
  SELECT doc_id, unnest(string_split(text, ' ')) AS term
  FROM documents WHERE doc_id < 200
) GROUP BY doc_id, term HAVING count(*) >= 3
""",
)
