"""Vector column expressions for embedding similarity — UDF-free.

Dot products / norms / cosine over ``array<float|double>`` columns using
``zip_with`` + ``aggregate`` higher-order functions: evaluated JVM-side per
row, no Python boundary, so brute-force scoring scales linearly with the
cluster. The fold is sequential over the array, matching DuckDB's
``list_cosine_similarity`` accumulation order, which keeps double-precision
results oracle-comparable after rounding.

The reference has no vector operators; these extend its surface per
BASELINE.json's north star.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def to_double_array(col: Column) -> Column:
    return col.cast("array<double>")


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    """Cosine similarity of two double-array columns."""
    return dot(a, b) / (norm(a) * norm(b))
