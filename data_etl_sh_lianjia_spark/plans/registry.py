"""Declared-query registry — the engine's public query surface.

Every operator from SURVEY.md §2 lands here exactly once as a
:class:`DeclaredQuery`: a PySpark implementation plus (where SQL-expressible)
the equivalent DuckDB oracle SQL. The driver contract (``__spark_entry__``)
and the pytest oracle harness both iterate this registry, so an operator is
"done" if and only if it is registered here and green against its oracle.

Determinism contract (SURVEY.md §5): registered queries must be
value-deterministic across engines —

- double aggregates go through DECIMAL casts (exact, order-independent
  sums) and are cast back to DOUBLE at the end → bit-identical results;
- every window/limit ``ORDER BY`` carries a unique tiebreaker;
- no ``current_timestamp`` / ``monotonically_increasing_id``;
- ``collect_list`` is always wrapped in ``array_sort``;
- approximate operators (LSH, approx quantiles) register *without* an
  oracle string → the driver records the weaker rows-only check, and the
  pytest harness tolerance-checks them against an exact recompute.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

SparkQuery = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class DeclaredQuery:
    name: str
    spark_fn: SparkQuery
    oracle: str | None  # DuckDB SQL over the pre-registered views; None → rows-only
    survey_ref: str = ""  # SURVEY.md §2 operator ids this query exercises
    bench: bool = False  # include in bench.py headline set
    doc: str = ""
    tags: tuple[str, ...] = field(default_factory=tuple)


_REGISTRY: dict[str, DeclaredQuery] = {}


def register(
    name: str,
    oracle: str | None = None,
    survey_ref: str = "",
    bench: bool = False,
    doc: str = "",
    tags: tuple[str, ...] = (),
) -> Callable[[SparkQuery], SparkQuery]:
    """Decorator: register a (spark_fn, oracle_sql) declared query."""

    def deco(fn: SparkQuery) -> SparkQuery:
        if name in _REGISTRY:
            raise ValueError(f"duplicate declared query: {name}")
        _REGISTRY[name] = DeclaredQuery(
            name=name,
            spark_fn=fn,
            oracle=oracle,
            survey_ref=survey_ref,
            bench=bench,
            doc=doc or (fn.__doc__ or "").strip().splitlines()[0] if fn.__doc__ else doc,
            tags=tags,
        )
        return fn

    return deco


def _load_all() -> None:
    """Import every module that registers queries (idempotent)."""
    import data_etl_sh_lianjia_spark.operators  # noqa: F401
    import data_etl_sh_lianjia_spark.sources.frontier  # noqa: F401
    import data_etl_sh_lianjia_spark.sources.html_source  # noqa: F401
    import data_etl_sh_lianjia_spark.sources.lianjia  # noqa: F401
    import data_etl_sh_lianjia_spark.sources.pagefeed  # noqa: F401
    import data_etl_sh_lianjia_spark.sources.readers  # noqa: F401
    import data_etl_sh_lianjia_spark.streaming  # noqa: F401

    # imported last on purpose: registry order feeds the driver's
    # first-50 sampling window (__spark_entry__), so late additions must
    # append after the established never-sampled queue, not displace it
    import data_etl_sh_lianjia_spark.operators.mutations  # noqa: F401,E402


def all_queries() -> dict[str, DeclaredQuery]:
    _load_all()
    return dict(_REGISTRY)


def get_query(name: str) -> DeclaredQuery:
    _load_all()
    return _REGISTRY[name]
