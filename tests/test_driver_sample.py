"""Driver-sample rotation invariants (__spark_entry__._DRIVER_SAMPLED).

The round driver hash-verifies the FIRST 50 entries of queries(); the
entry module orders never-yet-sampled names first so each round converts
repo-verified queries into driver-verified ones. These guards make the
rotation un-breakable by registration drift: a renamed query must not
linger in the sampled set, and the unsampled backlog must always fit one
driver window (otherwise some query would never earn a driver row)."""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entry  # noqa: E402
from data_etl_sh_lianjia_spark.plans.registry import all_queries  # noqa: E402


def test_sampled_names_all_registered():
    qs = set(all_queries())
    stale = entry._DRIVER_SAMPLED - qs
    assert not stale, (
        f"_DRIVER_SAMPLED carries names absent from the registry "
        f"(renamed/removed queries): {sorted(stale)}"
    )


def test_unsampled_backlog_fits_one_driver_window():
    qs = list(all_queries())
    unsampled = [n for n in qs if n not in entry._DRIVER_SAMPLED]
    assert len(unsampled) <= 50, (
        f"{len(unsampled)} never-driver-sampled queries exceed the 50-name "
        f"window — some would never earn a driver correctness row; rotate "
        f"_DRIVER_SAMPLED or stage the new registrations across rounds"
    )


def test_queries_orders_unsampled_first():
    ordered = list(entry.queries())
    n_unsampled = sum(1 for n in ordered if n not in entry._DRIVER_SAMPLED)
    head = ordered[:n_unsampled]
    assert all(n not in entry._DRIVER_SAMPLED for n in head), (
        "never-sampled names must occupy the head of queries() — the "
        "driver only verifies the first 50 entries"
    )


def test_every_query_has_an_oracle():
    """r8 invariant: zero rows-only registrations — approximate operators
    hash-match via the exact-baseline-plus-flag pattern instead."""
    missing = [n for n, dq in all_queries().items() if dq.oracle is None]
    assert not missing, (
        f"rows-only registrations are a regression (use the exact-baseline"
        f"-plus-flag pattern): {missing}"
    )
