"""Vector math over ``array<float>`` embedding columns — JVM-side.

``F.zip_with`` + ``F.aggregate`` keep the dot product inside codegen; no
Python worker round-trip per row.  For very wide vectors (>4k dims) a
vectorized Pandas UDF over Arrow batches can win — see
``operators/similarity.py`` for that alternate path.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    """Sequential left-fold dot product (deterministic summation order)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v * v)
    )


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))
