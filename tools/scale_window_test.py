"""Window-census scale stress: 1M synthetic docs through the round-7
substring-span ops — duplicate_window_stats (Lee-et-al repeated-span
census) and decontaminate_by_windows (13-gram benchmark
decontamination) — the two linear window-hash pipelines.

Reuses scale_text_test's generator (80-word docs, 5000-word vocab,
10% near-dups + 2% exact copies planted), so the census has real
signal to find: exact copies share EVERY window, near-dups share most.

Usage: python tools/scale_window_test.py [n_docs]
"""

from __future__ import annotations

import sys
import time

from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F

from lightweight_vector_database_spark.operators.substring_dedup import (
    decontaminate_by_windows,
    duplicate_window_stats,
)
from lightweight_vector_database_spark.session import get_spark
from tools.scale_text_test import generate


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    spark = get_spark("scale-window-test")
    spark.sparkContext.setLogLevel("ERROR")

    docs = generate(spark, n_docs)
    t = time.time()
    n = docs.count()
    print(f"generate+count {n} docs: {time.time() - t:.1f}s")

    t = time.time()
    stats = duplicate_window_stats(docs, 8)
    flagged, dup_windows = stats.agg(
        F.count(F.lit(1)), F.sum("n_dup_windows")
    ).collect()[0]
    print(
        f"duplicate_window_stats(w=8): {flagged} docs flagged, "
        f"{dup_windows} duplicated windows in {time.time() - t:.1f}s"
    )

    t = time.time()
    held = docs.filter(F.col("doc_id") % 101 == 0)
    corpus = docs.filter(F.col("doc_id") % 101 != 0)
    dec = decontaminate_by_windows(corpus, held, 13)
    n_contam = dec.count()
    print(
        f"decontaminate_by_windows(w=13, ~1% heldout): "
        f"{n_contam} corpus docs flagged in {time.time() - t:.1f}s"
    )


if __name__ == "__main__":
    main()
