"""Deterministic probe vectors shared by queries() and oracle_sql().

Values are rounded to 6 decimals so their textual form embeds exactly
into oracle SQL and parses to the identical IEEE double in both Spark
and DuckDB.
"""

from __future__ import annotations

import math

DIM = 64  # embeddings fixture dimensionality (TESTDATA.md)


def probe_vector(seed: int = 0, dim: int = DIM) -> list[float]:
    """Deterministic in-range (~[-0.45, 0.49]) probe vector."""
    return [round(0.35 * math.sin(seed * 7.0 + i + 1.0), 6) for i in range(dim)]


def sql_array(values: list[float]) -> str:
    """DuckDB DOUBLE[] literal with exact decimal text."""
    return "[" + ", ".join(repr(v) for v in values) + "]::DOUBLE[]"
