"""Regenerate COVERAGE.md's two registry-derived tables.

The "Non-query coverage" tail section is hand-maintained: everything from
its heading onward is preserved verbatim. Run from the repo root:

    python tools/gen_coverage.py
"""

from __future__ import annotations

import os
import sys
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from data_etl_sh_lianjia_spark.plans.registry import all_queries

COVERAGE = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "COVERAGE.md")
TAIL_HEADING = "## Non-query coverage (library + tests)"

HEADER = """# COVERAGE — SURVEY.md §2 operator inventory → implementation

Auto-generated from the declared-query registry (`data_etl_sh_lianjia_spark/plans/registry.py`). **oracle** = value-hash-matched vs DuckDB at sf0.01; **rows-only** = approximate/streaming/fixture op whose check lives in the named test module.

## By SURVEY §2 operator id

| survey id | implementing queries |
|---|---|
"""


def main() -> None:
    queries = all_queries()

    by_ref: dict[str, list[str]] = defaultdict(list)
    for name, dq in sorted(queries.items()):
        for ref in filter(None, (r.strip() for r in dq.survey_ref.split(","))):
            by_ref[ref].append(name)

    out = [HEADER]
    for ref in sorted(by_ref):
        qs = ", ".join(f"`{q}`" for q in by_ref[ref])
        out.append(f"| {ref} | {qs} |\n")

    out.append("\n## By declared query\n\n")
    out.append("| query | survey refs | check | description |\n|---|---|---|---|\n")
    for name, dq in sorted(queries.items()):
        check = "oracle" if dq.oracle else "rows-only"
        out.append(f"| `{name}` | {dq.survey_ref} | {check} | {dq.doc} |\n")

    with open(COVERAGE) as f:
        existing = f.read()
    tail = existing[existing.index(TAIL_HEADING):] if TAIL_HEADING in existing else ""
    out.append("\n" + tail)

    with open(COVERAGE, "w") as f:
        f.write("".join(out))
    print(f"COVERAGE.md regenerated: {len(queries)} queries, {len(by_ref)} survey ids")


if __name__ == "__main__":
    main()
