"""Result canonicalization + cross-engine comparison (SURVEY.md §5.1).

Mirrors the driver's order-insensitive value-hash check: columns sorted by
name, rows sorted by canonical key, values normalized to plain Python types.
Used by the pytest oracle harness; the engine's declared queries are designed
to pass this under *strict* (bit-exact) float comparison — a tolerance mode
exists only to diagnose drift, not to excuse it.
"""

from __future__ import annotations

import datetime as _dt
import math
from dataclasses import dataclass, field
from typing import Any


def canon_value(v: Any) -> Any:
    """Normalize a cell to hashable, engine-neutral Python."""
    if v is None:
        return None
    if isinstance(v, bool):
        return bool(v)
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        if v == 0.0:
            return 0.0  # normalize -0.0
        return v
    if isinstance(v, _dt.datetime):
        return v.isoformat(sep=" ")
    if isinstance(v, _dt.date):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return tuple(canon_value(x) for x in v)
    if isinstance(v, dict):
        return tuple(sorted((k, canon_value(x)) for k, x in v.items()))
    if isinstance(v, (bytes, bytearray)):
        return bytes(v).hex()
    import decimal

    if isinstance(v, decimal.Decimal):
        return float(v)
    return v


def canon_rows(rows: list[tuple], cols: list[str]) -> tuple[list[str], list[tuple]]:
    """Sort columns by name, normalize values, sort rows by canonical key."""
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(canon_value(r[i]) for i in order) for r in rows]
    out.sort(key=lambda t: tuple((x is None, str(x)) for x in t))
    return [cols[i] for i in order], out


# ---------------------------------------------------------------------------
# Driver-faithful column-TYPE families. The round driver canonicalizes both
# engines' results through pandas, where the column dtype decides the value
# repr: integer dtypes stringify as "123" while float dtypes stringify as
# "f:123.0" — so a DuckDB HUGEINT (SUM over integers) or DOUBLE column against
# a Spark BIGINT column is a hash MISMATCH even when every value is equal
# (the round-1 counting_suite and round-7 quality.py failures). Value-level
# comparison via fetchall() cannot see this (Python int == float), so the
# oracle sweep additionally requires the FAMILIES below to agree per column.
# ---------------------------------------------------------------------------

_DUCK_INT = {
    "TINYINT", "SMALLINT", "INTEGER", "BIGINT",
    "UTINYINT", "USMALLINT", "UINTEGER", "UBIGINT",
}
# pandas renders HUGEINT/UHUGEINT and DECIMAL as float64 -> driver float repr
_DUCK_FLOAT = {"FLOAT", "DOUBLE", "HUGEINT", "UHUGEINT"}


def duck_family(type_name: Any) -> str:
    """Family the driver's pandas canon sees for a DuckDB logical type."""
    s = str(type_name).upper()
    if s in _DUCK_INT:
        return "int"
    if s in _DUCK_FLOAT or s.startswith("DECIMAL"):
        return "float"
    if s == "BOOLEAN":
        return "bool"
    return "other"


def spark_family(dt: Any) -> str:
    """Family the driver's pandas canon sees for a Spark DataType. Spark
    decimals collect as decimal.Decimal (scale-padded str repr — never equal
    to a pandas float repr), so they get their own family: a query emitting
    decimal output is a driver-red risk and must cast to double/long."""
    from pyspark.sql import types as T

    if isinstance(dt, T.BooleanType):
        return "bool"
    if isinstance(dt, (T.ByteType, T.ShortType, T.IntegerType, T.LongType)):
        return "int"
    if isinstance(dt, (T.FloatType, T.DoubleType)):
        return "float"
    if isinstance(dt, T.DecimalType):
        return "dec"
    return "other"


def family_mismatches(spark_schema: Any, duck_cols: list, duck_types: list) -> list:
    """(column, spark_family, duck_family) triples where the driver's pandas
    canon would type the two engines' columns differently — each one is a
    guaranteed driver hash mismatch regardless of values. Spark 'dec' never
    matches anything (including duck DECIMAL: pandas floats it)."""
    duck = {c: duck_family(t) for c, t in zip(duck_cols, duck_types)}
    out = []
    for f in spark_schema.fields:
        sf, df = spark_family(f.dataType), duck.get(f.name)
        if df is None:
            continue  # column-set mismatch is the value gate's job
        if sf == "dec" or (sf != df and "other" not in (sf, df)):
            out.append((f.name, sf, df))
    return out


@dataclass
class CompareResult:
    ok: bool
    reason: str = ""
    n_left: int = 0
    n_right: int = 0
    sample_diff: list = field(default_factory=list)
    float_only_drift: bool = False  # True when only float jitter broke equality


def _approx_eq(a: Any, b: Any, rel: float = 1e-9, abs_tol: float = 1e-9) -> bool:
    if isinstance(a, float) and isinstance(b, float):
        return math.isclose(a, b, rel_tol=rel, abs_tol=abs_tol)
    if isinstance(a, tuple) and isinstance(b, tuple) and len(a) == len(b):
        return all(_approx_eq(x, y, rel, abs_tol) for x, y in zip(a, b))
    return a == b


def compare_results(
    left_rows: list[tuple],
    left_cols: list[str],
    right_rows: list[tuple],
    right_cols: list[str],
) -> CompareResult:
    """Strict order-insensitive comparison (the driver-gate proxy)."""
    lc, lr = canon_rows(left_rows, left_cols)
    rc, rr = canon_rows(right_rows, right_cols)
    if lc != rc:
        return CompareResult(False, f"column mismatch: {lc} vs {rc}", len(lr), len(rr))
    if len(lr) != len(rr):
        return CompareResult(False, f"row count {len(lr)} vs {len(rr)}", len(lr), len(rr))
    if lr == rr:
        return CompareResult(True, "exact", len(lr), len(rr))
    diffs = [(a, b) for a, b in zip(lr, rr) if a != b]
    jitter = all(_approx_eq(a, b) for a, b in diffs)
    return CompareResult(
        False,
        f"{len(diffs)} differing rows (float-jitter-only={jitter})",
        len(lr),
        len(rr),
        sample_diff=diffs[:5],
        float_only_drift=jitter,
    )
