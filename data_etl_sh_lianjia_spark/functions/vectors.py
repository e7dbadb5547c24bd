"""Vector (embedding) column expressions — SURVEY.md §2.9 L3/L5.

All built on JVM-side higher-order functions (``transform``/``zip_with``/
``aggregate``) so the hot path stays inside whole-stage codegen; the
pandas-UDF/numpy path lives in ``operators.similarity`` for the blocked
matmul variant.

Precision contract: embeddings are ``ARRAY<FLOAT>``; every expression casts
elements to DOUBLE *before* multiplying, so products are exact (24-bit × 24-bit
mantissas fit in a double) and sums carry ~1e-14 relative error — far inside
the 1e-4 rounding the similarity oracles compare at.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def to_double_array(c: Column | str) -> Column:
    c = F.col(c) if isinstance(c, str) else c
    return F.transform(c, lambda x: x.cast("double"))


def dot(a: Column, b: Column) -> Column:
    """Σ aᵢ·bᵢ via zip_with + left-fold aggregate (codegen'd, no Python)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm2(a: Column) -> Column:
    """Σ aᵢ² (squared L2 norm)."""
    return F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x * x)


def cosine(a: Column, b: Column, norm2_a: Column, norm2_b: Column) -> Column:
    """dot(a,b) / sqrt(‖a‖²·‖b‖²) with precomputed squared norms."""
    return dot(a, b) / F.sqrt(norm2_a * norm2_b)
