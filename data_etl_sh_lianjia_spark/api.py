"""Public engine facade — the thin API layer from SURVEY.md §3.4.

A user of the reference runs ``scrapy crawl lianjia -o out.json`` and then
works with the exported collections; a user of this engine gets the same
surface as four calls:

    eng = Engine(sf_dir="/root/testdata/sf0.1")
    eng.table("lineitem")              # catalog lookup -> DataFrame
    eng.sql("SELECT ... FROM lineitem")  # ANSI SQL over registered tables
    eng.query("q1_scan_agg")           # any declared operator from the registry
    eng.write_json(df, path)           # the reference's JSON-lines feed export

Everything returns plain PySpark DataFrames — the facade adds catalog
bootstrap and name routing, never its own plan representation, so Catalyst
optimizations apply unchanged (SURVEY.md §4.2).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from data_etl_sh_lianjia_spark.plans.registry import all_queries
from data_etl_sh_lianjia_spark.session import (
    DEFAULT_SF_DIR,
    TABLES,
    get_spark,
    load_tables,
)


class Engine:
    """Session + catalog + declared-query registry behind one handle.

    Tables are registered as *unprefixed* temp views (``lineitem``,
    ``orders``, …) so ``sql()`` reads like the reference's logical names
    (`items.py:18,35` routes to named collections the same way).
    """

    def __init__(
        self,
        sf_dir: str = DEFAULT_SF_DIR,
        spark: SparkSession | None = None,
        app_name: str = "lianjia-engine",
    ) -> None:
        self.spark = spark or get_spark(app_name=app_name)
        self.sf_dir = sf_dir
        self._tables = load_tables(self.spark, sf_dir)
        for name, df in self._tables.items():
            df.createOrReplaceTempView(name)

    # -- catalog ------------------------------------------------------------

    def table(self, name: str) -> DataFrame:
        if name not in self._tables:
            raise KeyError(
                f"unknown table {name!r}; available: {sorted(self._tables)}"
            )
        return self._tables[name]

    def tables(self) -> list[str]:
        return sorted(self._tables)

    def ingest(self, parts: int | None = None) -> str:
        """Rewrite the raw landed tables into engine-managed storage.

        Facts become scan-parallel range-clustered multi-file parquet;
        dimensions stay single-file (see ``session.ingest_tables``). The
        catalog (``table()``/``sql()`` views) re-points at the managed
        copy — values are identical, only the physical layout changes.
        Returns the managed-storage directory."""
        from data_etl_sh_lianjia_spark.session import ingest_tables

        out = ingest_tables(self.spark, self.sf_dir, parts=parts)
        self._tables = load_tables(self.spark, self.sf_dir)
        for name, df in self._tables.items():
            df.createOrReplaceTempView(name)
        return out

    def delete_where(self, name: str, predicate) -> int:
        """Row-level DELETE on the managed copy of ``name`` (ingests first
        if needed). ``predicate`` is a pyarrow dataset expression, e.g.
        ``pc.field("o_orderstatus") == "F"``; SQL semantics (NULL-predicate
        rows survive). O(affected files/buckets + projection sizes):
        untouched part files hardlink, SUM-mergeable projections negative-
        merge, ordered/vector artifacts rebuild — see
        ``session.delete_where``. Returns the number of rows deleted."""
        from data_etl_sh_lianjia_spark.session import delete_where

        n = delete_where(self.spark, self.sf_dir, name, predicate)
        self._rebind_catalog()
        return n

    def update_where(self, name: str, predicate, assignments) -> int:
        """Row-level UPDATE on the managed copy of ``name`` (ingests first
        if needed). ``predicate`` is a pyarrow dataset expression;
        ``assignments`` maps column -> constant (None = SET NULL) or
        callable(pa.Table) -> Array over the OLD row values (so
        ``SET x = x + 1`` works). SQL semantics (NULL-predicate rows
        untouched). Copy-on-write O(affected files/buckets + projection
        sizes): untouched part files hardlink, SUM-mergeable projections
        negative+positive-merge, ordered/vector artifacts rebuild — see
        ``session.update_where``. Returns the number of rows updated."""
        from data_etl_sh_lianjia_spark.session import update_where

        n = update_where(self.spark, self.sf_dir, name, predicate, assignments)
        self._rebind_catalog()
        return n

    def merge_into(self, name: str, batch, key: str) -> tuple[int, int]:
        """Storage-level MERGE (upsert): batch rows whose ``key`` matches an
        existing row replace it, the rest insert. ``batch`` is a pyarrow
        Table with the landed table's schema; requires a directory-form
        landed table. Returns (rows replaced, batch rows landed) — see
        ``session.merge_into``."""
        from data_etl_sh_lianjia_spark.session import merge_into

        out = merge_into(self.spark, self.sf_dir, name, batch, key)
        self._rebind_catalog()
        return out

    def _rebind_catalog(self) -> None:
        """Re-point the unprefixed temp views at the post-mutation state."""
        self._tables = load_tables(self.spark, self.sf_dir)
        for tname, df in self._tables.items():
            df.createOrReplaceTempView(tname)

    # -- time travel ----------------------------------------------------------

    def history(self, name: str) -> list[dict]:
        """Snapshot history of a managed table (one entry per retained
        pre-mutation generation + the current state) — see
        ``session.table_history``."""
        from data_etl_sh_lianjia_spark.session import table_history

        return table_history(self.spark, self.sf_dir, name)

    def table_asof(self, name: str, version: int) -> DataFrame:
        """``SELECT * FROM <name> VERSION AS OF <version>`` — read a
        retained pre-mutation generation (``history()`` lists versions)."""
        from data_etl_sh_lianjia_spark.session import read_table_version

        return read_table_version(self.spark, self.sf_dir, name, version)

    def restore(self, name: str, version: int) -> None:
        """Roll the managed table back to a snapshot; projections rebuild
        to the restored generation and the catalog re-points. The
        pre-restore state is itself snapshotted (undoable)."""
        from data_etl_sh_lianjia_spark.session import restore_table_version

        restore_table_version(self.spark, self.sf_dir, name, version)
        self._rebind_catalog()

    def table_changes(
        self, name: str, from_version: int, to_version: int | None = None
    ) -> DataFrame:
        """Change data feed between two retained generations (multiset
        diff tagged with _change_type delete/insert; an update is its
        delete/insert pair) — see ``session.table_changes``."""
        from data_etl_sh_lianjia_spark.session import table_changes

        return table_changes(
            self.spark, self.sf_dir, name, from_version, to_version
        )

    def transaction(self, *tables: str):
        """Multi-table mutation transaction: a ``with`` block whose
        mutations on the listed tables roll back all-or-nothing on an
        exception (snapshot-based — see ``session.transaction``). The
        catalog views re-point when the block exits either way, so a
        rollback never leaves them on a rolled-back-away generation."""
        from contextlib import contextmanager

        from data_etl_sh_lianjia_spark.session import transaction

        @contextmanager
        def _txn():
            try:
                with transaction(self.spark, self.sf_dir, *tables):
                    yield
            finally:
                self._rebind_catalog()

        return _txn()

    def commits(self, name: str) -> list:
        """The table's DML commit log (the multi-writer CAS ledger),
        oldest first — see ``session.commit_history``."""
        from data_etl_sh_lianjia_spark.session import commit_history

        return commit_history(self.spark, self.sf_dir, name)

    def vacuum(self, name: str, keep: int = 0) -> int:
        """Drop retained snapshots beyond the newest ``keep`` (reclaims the
        disk the hardlinked generations hold, at the cost of
        restorability). Returns how many snapshots were removed."""
        from data_etl_sh_lianjia_spark.session import vacuum_table

        return vacuum_table(self.spark, self.sf_dir, name, keep=keep)

    def compact(self, name: str, zorder: list[str] | None = None) -> dict:
        """Merge a managed table's accumulated append / copy-on-write
        generations back into globally range-clustered files (the
        lakehouse OPTIMIZE) — or, with ``zorder=[c1, c2, ...]``, into a
        Morton-interleaved multi-dimensional clustering (OPTIMIZE ZORDER
        BY: per-file stats then prune on EVERY listed column). Values
        unchanged; projections restamp onto the new fingerprint instead
        of rebuilding — see ``session.compact_table``. Returns {rows,
        files_before, files_after}."""
        from data_etl_sh_lianjia_spark.session import compact_table

        out = compact_table(self.spark, self.sf_dir, name, zorder=zorder)
        self._rebind_catalog()
        return out

    # -- query surfaces -----------------------------------------------------

    def sql(self, query: str) -> DataFrame:
        """ANSI SQL over the registered tables (one py4j round trip)."""
        return self.spark.sql(query)

    def query(self, name: str) -> DataFrame:
        """Run a declared operator from the registry against this catalog."""
        queries = all_queries()
        if name not in queries:
            raise KeyError(
                f"unknown query {name!r}; available: {sorted(queries)}"
            )
        return queries[name].spark_fn(self.spark, self.sf_dir)

    def materialize(self, name: str) -> str:
        """CREATE-MATERIALIZED-VIEW for any declared query: pin its result
        as a managed artifact, served by ``query_cached`` while the whole
        catalog is unchanged (see ``session.materialize_query``)."""
        from data_etl_sh_lianjia_spark.session import materialize_query

        return materialize_query(self.spark, self.sf_dir, name)

    def query_cached(self, name: str) -> DataFrame:
        """``query(name)``, served from its materialized artifact when one
        is fresh (any table change invalidates); falls back to running the
        query — same values either way."""
        from data_etl_sh_lianjia_spark.session import query_materialized

        mat = query_materialized(self.spark, self.sf_dir, name)
        return mat if mat is not None else self.query(name)

    def pin(self, name: str) -> str:
        """``materialize(name)`` plus maintenance: the pin persists, and
        every subsequent ingest/mutation refreshes the artifact (the
        unified pin mechanism — see ``session.pin_query``)."""
        from data_etl_sh_lianjia_spark.session import pin_query

        return pin_query(self.spark, self.sf_dir, name)

    def pin_cut(
        self, name: str, parent_kind: str, parent: str, derive_sql: str
    ) -> str:
        """Pin a parameterized rollup cut (``derive_sql`` over the parent
        artifact, ``{src}`` bound) as a maintenance-refreshed artifact —
        the user-facing form of the engine's built-in coarse cuts (see
        ``session.pin_rollup_cut``)."""
        from data_etl_sh_lianjia_spark.session import pin_rollup_cut

        return pin_rollup_cut(
            self.spark, self.sf_dir, name, parent_kind, parent, derive_sql
        )

    def unpin(self, name: str) -> bool:
        from data_etl_sh_lianjia_spark.session import unpin

        return unpin(self.spark, self.sf_dir, name)

    def pinned(self, name: str) -> DataFrame | None:
        """The pinned artifact as a DataFrame, or None when missing/stale
        (a pin is an optimization, never a correctness dependency)."""
        from data_etl_sh_lianjia_spark.session import pinned_view

        view = pinned_view(self.spark, self.sf_dir, name)
        return self.spark.table(view) if view else None

    def queries(self) -> list[str]:
        return sorted(all_queries())

    def explain(self, name: str, mode: str = "formatted") -> str:
        """Formatted physical plan of a declared query (plan inspection is
        part of the engine surface — see PLANS.md for the headline set)."""
        df = self.query(name)
        return df._jdf.queryExecution().explainString(
            self.spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                mode
            )
        )

    # -- sinks (SURVEY.md §2.1 S8/S9) ---------------------------------------

    def write_json(self, df: DataFrame, path: str, mode: str = "overwrite") -> None:
        """JSON-lines feed export — the reference's ``-o out.json`` analog."""
        df.write.mode(mode).json(path)

    def write_table(
        self, df: DataFrame, name: str, mode: str = "overwrite"
    ) -> None:
        """Named-collection routing (``lianjia_village`` / ``lianjia_House``)."""
        df.write.mode(mode).saveAsTable(name)


__all__ = ["Engine", "TABLES"]
