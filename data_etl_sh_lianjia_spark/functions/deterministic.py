"""Cross-engine deterministic aggregate builders.

The driver's correctness gate hash-compares Spark results against a DuckDB
oracle (order-insensitive value hash). Floating-point SUM/AVG are
order-dependent, and Spark's shuffle order differs run-to-run — so any
declared query that summed raw doubles would be flaky against the oracle.

Fix: route double aggregates through DECIMAL. ``CAST(x AS DECIMAL(p,s))``
rounds each *input* identically in both engines (half-away-from-zero for the
magnitudes involved), the decimal SUM is exact integer arithmetic
(order-independent), and the final ``CAST(dec AS DOUBLE)`` is a correctly
rounded conversion in both engines → bit-identical doubles.

Validity bound: the final unscaled decimal must stay below 2^53 for the
double conversion to be provably identical; with the default scale=4 that is
|sum| < ~9e11 — far above the sf0.01/sf0.1 magnitudes the gate runs at.
AVG is derived as exact-decimal-sum (as double) divided by COUNT — both
engines do the same IEEE-754 double division.

Scale rule (learned the hard way): pick ``scale`` ≥ the number of *true*
decimal digits of the input expression. Money-ish inputs with 2-decimal
factors multiply into 4- or 6-decimal true values; rounding AT the true
precision is exact in both engines, while rounding BELOW it hits exact
halfway ties (x.xxxx50) that Java BigDecimal (HALF_UP on the shortest double
repr) and DuckDB (direction of the binary approximation) break differently —
~0.03% of rows diverged by 1e-4 in TPC-H Q1's charge column at scale 4.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _col(c: Column | str) -> Column:
    return c if isinstance(c, Column) else F.col(c)


def dsum(c: Column | str, alias: str, scale: int = 4, precision: int = 30) -> Column:
    """Order-independent SUM over a double column, returned as DOUBLE.

    DuckDB oracle equivalent:
    ``CAST(SUM(CAST(x AS DECIMAL(30,4))) AS DOUBLE) AS alias``.
    """
    return (
        F.sum(_col(c).cast(f"decimal({precision},{scale})"))
        .cast("double")
        .alias(alias)
    )


def davg(c: Column | str, alias: str, scale: int = 4, precision: int = 30) -> Column:
    """Order-independent AVG as exact-decimal SUM / COUNT, returned as DOUBLE.

    DuckDB oracle equivalent:
    ``CAST(SUM(CAST(x AS DECIMAL(30,4))) AS DOUBLE) / COUNT(x) AS alias``.
    """
    cc = _col(c)
    return (
        F.sum(cc.cast(f"decimal({precision},{scale})")).cast("double") / F.count(cc)
    ).alias(alias)


def oracle_dsum(expr: str, alias: str, scale: int = 4, precision: int = 30) -> str:
    """The DuckDB SQL fragment matching :func:`dsum`."""
    return f"CAST(SUM(CAST({expr} AS DECIMAL({precision},{scale}))) AS DOUBLE) AS {alias}"


def oracle_davg(expr: str, alias: str, scale: int = 4, precision: int = 30) -> str:
    """The DuckDB SQL fragment matching :func:`davg`."""
    return (
        f"CAST(SUM(CAST({expr} AS DECIMAL({precision},{scale}))) AS DOUBLE)"
        f" / COUNT({expr}) AS {alias}"
    )
