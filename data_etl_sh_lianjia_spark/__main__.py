"""CLI entry point — the ``scrapy crawl lianjia -o out.json`` analogue
(`/root/reference/README.md:7`, `scrapy.cfg:6-7`).

    python -m data_etl_sh_lianjia_spark list
    python -m data_etl_sh_lianjia_spark run <query> [-o out.json] [--sf-dir DIR]
    python -m data_etl_sh_lianjia_spark sql "SELECT ..." [-o out.json]
    python -m data_etl_sh_lianjia_spark explain <query>
    python -m data_etl_sh_lianjia_spark ingest [--sf-dir DIR]
    python -m data_etl_sh_lianjia_spark delete <table> "<col OP literal>"
    python -m data_etl_sh_lianjia_spark update <table> "<pred>" "col = lit" ...
    python -m data_etl_sh_lianjia_spark merge <table> batch.parquet --key <col>
    python -m data_etl_sh_lianjia_spark history <table>
    python -m data_etl_sh_lianjia_spark restore <table> <version>
    python -m data_etl_sh_lianjia_spark compact <table>
    python -m data_etl_sh_lianjia_spark vacuum <table> [--keep N]
    python -m data_etl_sh_lianjia_spark materialize <query>
    python -m data_etl_sh_lianjia_spark pin <query>
    python -m data_etl_sh_lianjia_spark pin-cut <name> --parent-kind K \
        --parent <table-or-rollup> --sql "SELECT ... FROM {src} ..."
    python -m data_etl_sh_lianjia_spark unpin <name>

``run`` executes any declared query from the registry over the catalog at
``--sf-dir`` and, like the reference's feed export, writes JSON-lines when
``-o`` is given (otherwise prints a bounded preview). The mutation /
lifecycle subcommands are the lakehouse maintenance surface (SURVEY.md
§2.11). Exit code 0 on success; unknown query names list the registry
and exit 2.
"""

from __future__ import annotations

import argparse
import sys


def _build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="python -m data_etl_sh_lianjia_spark",
        description="PySpark analytics engine CLI (reference: scrapy crawl lianjia -o out.json)",
    )
    sub = p.add_subparsers(dest="cmd", required=True)

    runp = sub.add_parser("run", help="run a declared query")
    runp.add_argument("query", help="declared query name (see `list`)")
    runp.add_argument("-o", "--output", help="write result as JSON-lines to this path")
    runp.add_argument("--sf-dir", default=None, help="testdata directory (default: $SPARK_GRAFT_SF_DIR)")
    runp.add_argument("--limit", type=int, default=20, help="preview rows when no -o (default 20)")

    sqlp = sub.add_parser("sql", help="run ANSI SQL over the registered tables")
    sqlp.add_argument("statement")
    sqlp.add_argument("-o", "--output")
    sqlp.add_argument("--sf-dir", default=None)
    sqlp.add_argument("--limit", type=int, default=20)

    exp = sub.add_parser("explain", help="print a declared query's physical plan")
    exp.add_argument("query")
    exp.add_argument("--sf-dir", default=None)
    exp.add_argument("--mode", default="formatted")

    ing = sub.add_parser(
        "ingest", help="re-layout the landed tables into managed storage"
    )
    ing.add_argument("--sf-dir", default=None)

    dele = sub.add_parser(
        "delete",
        help="row-level DELETE on a managed table (delete_where)",
        description=(
            "DELETE FROM <table> WHERE <col OP literal> on the managed "
            "copy. The CLI accepts the simple comparison subset "
            "(== != < <= > >=, int/float/'string' literals); the Python "
            "API (Engine.delete_where) accepts arbitrary pyarrow dataset "
            "expressions."
        ),
    )
    dele.add_argument("table")
    dele.add_argument("predicate", help="e.g. \"o_orderstatus == 'F'\"")
    dele.add_argument("--sf-dir", default=None)

    upd = sub.add_parser(
        "update",
        help="row-level UPDATE on a managed table (update_where)",
        description=(
            "UPDATE <table> SET <col = literal> [...] WHERE <col OP "
            "literal> on the managed copy. The CLI accepts constant "
            "assignments and the simple comparison predicate subset; the "
            "Python API (Engine.update_where) accepts arbitrary pyarrow "
            "expressions and per-row callables (SET x = x + 1)."
        ),
    )
    upd.add_argument("table")
    upd.add_argument("predicate", help="e.g. \"o_orderstatus == 'F'\"")
    upd.add_argument(
        "assignment", nargs="+", help="one or more \"col = literal\""
    )
    upd.add_argument("--sf-dir", default=None)

    mrg = sub.add_parser(
        "merge",
        help="storage-level MERGE INTO / upsert from a parquet batch",
        description=(
            "MERGE INTO <table> USING <batch.parquet> ON <--key col>: "
            "matched keys are replaced by the batch version, the rest "
            "insert (Engine.merge_into). Requires a directory-form "
            "landed table."
        ),
    )
    mrg.add_argument("table")
    mrg.add_argument("batch", help="parquet file holding the upsert batch")
    mrg.add_argument("--key", required=True, help="merge key column")
    mrg.add_argument("--sf-dir", default=None)

    hist = sub.add_parser(
        "history", help="list a managed table's retained snapshots"
    )
    hist.add_argument("table")
    hist.add_argument("--sf-dir", default=None)

    rest = sub.add_parser(
        "restore",
        help="roll a managed table back to a snapshot (time travel)",
    )
    rest.add_argument("table")
    rest.add_argument("version", type=int)
    rest.add_argument("--sf-dir", default=None)

    cmp_ = sub.add_parser(
        "compact",
        help="re-cluster a managed table's generations (OPTIMIZE)",
    )
    cmp_.add_argument("table")
    cmp_.add_argument(
        "--zorder",
        help="comma-separated columns for OPTIMIZE ZORDER BY clustering",
    )
    cmp_.add_argument("--sf-dir", default=None)

    mat = sub.add_parser(
        "materialize",
        help="pin a declared query's result as a managed artifact",
    )
    mat.add_argument("query")
    mat.add_argument("--sf-dir", default=None)

    pin = sub.add_parser(
        "pin",
        help="pin a declared query as a MAINTAINED artifact "
        "(auto-refreshed by every ingest/mutation)",
    )
    pin.add_argument("query")
    pin.add_argument("--sf-dir", default=None)

    pcut = sub.add_parser(
        "pin-cut",
        help="pin a parameterized rollup cut: derive_sql over a parent "
        "artifact ({src} bound), maintenance-refreshed",
    )
    pcut.add_argument("name")
    pcut.add_argument(
        "--parent-kind", required=True, choices=("aggproj", "joinproj", "table")
    )
    pcut.add_argument("--parent", required=True)
    pcut.add_argument("--sql", required=True, help="derive SQL with {src}")
    pcut.add_argument("--sf-dir", default=None)

    unp = sub.add_parser("unpin", help="remove a pin (artifact ages out)")
    unp.add_argument("name")
    unp.add_argument("--sf-dir", default=None)

    vac = sub.add_parser(
        "vacuum", help="drop retained snapshots beyond --keep (VACUUM)"
    )
    vac.add_argument("table")
    vac.add_argument("--keep", type=int, default=0)
    vac.add_argument("--sf-dir", default=None)

    sub.add_parser("list", help="list declared queries")
    return p


def _parse_predicate(text: str):
    """``col OP literal`` → a pyarrow dataset expression (CLI subset)."""
    import re

    import pyarrow.compute as pc

    m = re.fullmatch(
        r"\s*([A-Za-z_][A-Za-z0-9_]*)\s*(==|!=|<=|>=|<|>)\s*"
        r"('(?:[^'\\]|\\.)*'|-?\d+(?:\.\d+)?)\s*",
        text,
    )
    if not m:
        raise SystemExit(
            f"unsupported predicate {text!r}: expected <col> <op> <literal>"
        )
    col, op, lit = m.groups()
    value = (
        lit[1:-1].replace("\\'", "'")
        if lit.startswith("'")
        else (float(lit) if "." in lit else int(lit))
    )
    field = pc.field(col)
    return {
        "==": field == value,
        "!=": field != value,
        "<": field < value,
        "<=": field <= value,
        ">": field > value,
        ">=": field >= value,
    }[op]


def _parse_assignment(text: str) -> tuple[str, object]:
    """``col = literal`` → (col, value) for the CLI's constant-SET subset
    (int/float/'string'/null)."""
    import re

    m = re.fullmatch(
        r"\s*([A-Za-z_][A-Za-z0-9_]*)\s*=\s*"
        r"('(?:[^'\\]|\\.)*'|-?\d+(?:\.\d+)?|null)\s*",
        text,
        re.IGNORECASE,
    )
    if not m:
        raise SystemExit(
            f"unsupported assignment {text!r}: expected <col> = <literal>"
        )
    col, lit = m.groups()
    if lit.lower() == "null":
        return col, None
    if lit.startswith("'"):
        return col, lit[1:-1].replace("\\'", "'")
    return col, (float(lit) if "." in lit else int(lit))


def main(argv: list[str] | None = None) -> int:
    args = _build_parser().parse_args(argv)

    from data_etl_sh_lianjia_spark.plans.registry import all_queries

    if args.cmd == "list":
        for name, dq in sorted(all_queries().items()):
            print(f"{name}\t{dq.doc or ''}")
        return 0

    from data_etl_sh_lianjia_spark.api import Engine
    from data_etl_sh_lianjia_spark.session import DEFAULT_SF_DIR

    eng = Engine(sf_dir=args.sf_dir or DEFAULT_SF_DIR, app_name="lianjia-cli")

    if args.cmd == "explain":
        print(eng.explain(args.query, mode=args.mode))
        return 0

    if args.cmd == "ingest":
        out = eng.ingest()
        print(f"managed storage: {out}")
        return 0

    if args.cmd == "delete":
        n = eng.delete_where(args.table, _parse_predicate(args.predicate))
        print(f"deleted {n} rows from {args.table}")
        return 0

    if args.cmd == "update":
        assignments = dict(
            _parse_assignment(a) for a in args.assignment
        )
        n = eng.update_where(
            args.table, _parse_predicate(args.predicate), assignments
        )
        print(f"updated {n} rows in {args.table}")
        return 0

    if args.cmd == "merge":
        import pyarrow.parquet as pq

        replaced, landed = eng.merge_into(
            args.table, pq.read_table(args.batch), args.key
        )
        print(
            f"merged into {args.table}: {replaced} rows replaced, "
            f"{landed} batch rows landed"
        )
        return 0

    if args.cmd == "history":
        for h in eng.history(args.table):
            if h.get("current"):
                print(f"current\t{h['fingerprint']}")
            else:
                print(
                    f"v{h['version']}\tsuperseded_by={h['superseded_by']}"
                    f"\tfiles={h['n_files']}\t{h['fingerprint']}"
                )
        return 0

    if args.cmd == "restore":
        eng.restore(args.table, args.version)
        print(f"restored {args.table} to snapshot {args.version}")
        return 0

    if args.cmd == "compact":
        st = eng.compact(
            args.table,
            zorder=args.zorder.split(",") if args.zorder else None,
        )
        print(
            f"compacted {args.table}: {st['rows']} rows, "
            f"{st['files_before']} -> {st['files_after']} files"
        )
        return 0

    if args.cmd == "materialize":
        try:
            path = eng.materialize(args.query)
        except KeyError:
            print(f"unknown query {args.query!r}; available:", file=sys.stderr)
            for name in eng.queries():
                print(f"  {name}", file=sys.stderr)
            return 2
        print(f"materialized {args.query} at {path}")
        return 0

    if args.cmd == "pin":
        try:
            path = eng.pin(args.query)
        except KeyError:
            print(f"unknown query {args.query!r}", file=sys.stderr)
            return 2
        print(f"pinned {args.query} at {path}")
        return 0

    if args.cmd == "pin-cut":
        try:
            path = eng.pin_cut(
                args.name, args.parent_kind, args.parent, args.sql
            )
        except ValueError as e:
            print(str(e), file=sys.stderr)
            return 2
        print(f"pinned cut {args.name} at {path}")
        return 0

    if args.cmd == "unpin":
        existed = eng.unpin(args.name)
        print(f"unpinned {args.name}" if existed else f"no pin {args.name!r}")
        return 0 if existed else 1

    if args.cmd == "vacuum":
        n = eng.vacuum(args.table, keep=args.keep)
        print(f"vacuumed {args.table}: {n} snapshots removed")
        return 0

    if args.cmd == "run":
        try:
            df = eng.query(args.query)
        except KeyError:
            print(f"unknown query {args.query!r}; available:", file=sys.stderr)
            for name in eng.queries():
                print(f"  {name}", file=sys.stderr)
            return 2
    else:  # sql
        df = eng.sql(args.statement)

    if args.output:
        eng.write_json(df, args.output)
        print(f"wrote {args.output}")
    else:
        df.show(args.limit, truncate=False)
    return 0


if __name__ == "__main__":
    sys.exit(main())
