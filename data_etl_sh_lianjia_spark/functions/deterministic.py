"""Cross-engine deterministic aggregate builders.

The driver's correctness gate hash-compares Spark results against a DuckDB
oracle (order-insensitive value hash). Floating-point SUM/AVG are
order-dependent, and Spark's shuffle order differs run-to-run — so any
declared query that summed raw doubles would be flaky against the oracle.

Strategy: **scaled-long sums.** Each input is scaled by 10^s and rounded to
a BIGINT; the integer SUM is exact and order-independent; the final
``CAST(sum AS DOUBLE) / 10^s`` is a correctly rounded conversion plus an
IEEE division — identical in both engines → bit-identical doubles.

Why the rounding is safe: ``s`` must be ≥ the number of *true* decimal
digits of the input expression (money-ish inputs with 2-decimal factors
multiply into 4- or 6-decimal true values). Then ``x * 10^s`` is within
~1e-6 of an exact integer, far from any .5 rounding boundary, so Spark's
BigDecimal HALF_UP and DuckDB's C round() agree on every row. Rounding
BELOW the true precision would land exactly on ties (x.xxxx50) that the
engines break differently — measured ~0.03% of TPC-H Q1 rows diverging at
scale 4 with an earlier DECIMAL(30,4) approach.

Why scaled-long instead of DECIMAL casts: Spark's decimal Sum with buffer
precision > 18 leaves the long-backed fast path and allocates per row —
2.4× slower on TPC-H Q1 at sf0.1 (1.10s → 0.46s measured). The long path
stays inside whole-stage codegen.

Validity bounds: |x|·10^s < 2^63 per row and Σ|x|·10^s < 2^53 for the
provably-identical double conversion — at s=4 that is |sum| < ~9e11,
orders of magnitude above the gate's sf0.01/sf0.1 magnitudes (revisit for
sf ≥ 100 fact tables: bump to DECIMAL or split the sum).

AVG derives as (exact-sum-as-double / 10^s) / COUNT(x) — both engines do
the same two IEEE divisions in the same order.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _col(c: Column | str) -> Column:
    return c if isinstance(c, Column) else F.col(c)


def _scaled_long(cc: Column, factor: int) -> Column:
    """``round(x * factor)`` as BIGINT, via ``floor(x*f + 0.5)``.

    floor stays in double arithmetic inside codegen, while Spark's ROUND on
    a double routes through BigDecimal per row — 1.5× slower on TPC-H Q1's
    8-agg group-by (0.123s → 0.082s at sf0.1). Equivalence: the scaled
    value is within ~1e-6 of an exact integer n (module precondition), so
    floor(n ± 1e-6 + 0.5) == n == round(n ± 1e-6) for either sign; the
    half-up-vs-half-away-from-zero difference only exists at exact .5
    fractions, which the precondition excludes.
    """
    return F.floor(cc * F.lit(factor) + F.lit(0.5)).cast("long")


def dsum(c: Column | str, alias: str, scale: int = 4, precision: int = 30) -> Column:
    """Order-independent SUM over a double column, returned as DOUBLE.

    DuckDB oracle equivalent (see :func:`oracle_dsum`):
    ``CAST(SUM(CAST(round(x * 10^s) AS BIGINT)) AS DOUBLE) / 10^s``.
    ``precision`` is retained for signature compatibility (unused).
    """
    cc = _col(c)
    factor = 10 ** scale
    scaled = _scaled_long(cc, factor)
    return (F.sum(scaled).cast("double") / F.lit(float(factor))).alias(alias)


def davg(c: Column | str, alias: str, scale: int = 4, precision: int = 30) -> Column:
    """Order-independent AVG as exact scaled-long SUM / COUNT, as DOUBLE."""
    cc = _col(c)
    factor = 10 ** scale
    scaled = _scaled_long(cc, factor)
    return (
        F.sum(scaled).cast("double") / F.lit(float(factor)) / F.count(cc)
    ).alias(alias)


def spark_dsum(expr: str, alias: str, scale: int = 4) -> str:
    """Spark-SQL text fragment identical to :func:`dsum`.

    Same floor-based scaled-long sum as the Column builder (``FLOOR`` on a
    DOUBLE stays in codegen; see :func:`_scaled_long` for the half-up
    equivalence argument), emitted as SQL text for the single-round-trip
    ``spark.sql`` query path.
    """
    factor = 10 ** scale
    return (
        f"CAST(SUM(CAST(FLOOR(({expr}) * {factor} + 0.5) AS BIGINT)) AS DOUBLE)"
        f" / {factor}.0D AS {alias}"
    )


def spark_davg(expr: str, alias: str, scale: int = 4) -> str:
    """Spark-SQL text fragment identical to :func:`davg`."""
    factor = 10 ** scale
    return (
        f"CAST(SUM(CAST(FLOOR(({expr}) * {factor} + 0.5) AS BIGINT)) AS DOUBLE)"
        f" / {factor}.0D / COUNT({expr}) AS {alias}"
    )


def oracle_dsum(expr: str, alias: str, scale: int = 4, precision: int = 30) -> str:
    """The DuckDB SQL fragment matching :func:`dsum`."""
    factor = 10 ** scale
    return (
        f"CAST(SUM(CAST(round(({expr}) * {factor}) AS BIGINT)) AS DOUBLE)"
        f" / {factor}.0 AS {alias}"
    )


def oracle_davg(expr: str, alias: str, scale: int = 4, precision: int = 30) -> str:
    """The DuckDB SQL fragment matching :func:`davg`."""
    factor = 10 ** scale
    return (
        f"CAST(SUM(CAST(round(({expr}) * {factor}) AS BIGINT)) AS DOUBLE)"
        f" / {factor}.0 / COUNT({expr}) AS {alias}"
    )
