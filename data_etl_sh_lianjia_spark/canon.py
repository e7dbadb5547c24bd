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
