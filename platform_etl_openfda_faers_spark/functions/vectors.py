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


def quantize_int8(v: Column) -> tuple[Column, Column]:
    """Symmetric int8 quantization of a double vector: ``(scale, q)`` with
    ``scale = max(|v_i|) / 127`` and ``q_i = round(v_i / scale)`` in
    [-127, 127] — the standard storage/bandwidth reduction for embedding
    columns (4x smaller than float32, 8x than float64; dequantize as
    ``q_i * scale``).

    Row-local array exprs, map-only at any scale.  Quantized values are
    INTEGERS, so the cross-engine comparison is exact (no float-hash
    discipline needed beyond rounding the scale for display); zero vectors
    yield scale 0 and an all-zero q (NaN guarded).
    """
    absmax = F.aggregate(
        v, F.lit(0.0), lambda acc, x: F.greatest(acc, F.abs(x))
    )
    scale = absmax / F.lit(127.0)
    q = F.when(
        absmax > 0,
        F.transform(v, lambda x: F.round(x / scale).cast("int")),
    ).otherwise(F.transform(v, lambda x: F.lit(0)))
    return scale, q
