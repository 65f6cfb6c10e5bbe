"""Table lifecycle utilities (SURVEY.md §2.1 S7-S9).

The reference manages its Postgres tables imperatively: DDL
create-if-not-exists (spark_ingestion.py:23-44, kafka_producer.py:19-25
— S8), dimension upsert via ``INSERT ... ON CONFLICT (driver_number)
DO UPDATE`` (kafka_producer.py:42-48 — S7), and a reset script that
walks ``information_schema`` and cascade-drops everything non-system
(reset_postgres.py:22-45 — S9). Spark-first equivalents:

- S7 → :func:`upsert_last_wins`: a pure-DataFrame MERGE (union +
  row_number over an explicit precedence order). On a lakehouse this
  is Delta ``MERGE INTO``; the DataFrame form is the engine-portable
  semantics and the oracle-checkable one.
- S8 → :func:`create_table_if_not_exists`: catalog DDL via spark.sql.
- S9 → :func:`list_user_tables` / :func:`drop_all_user_tables` /
  :func:`drop_cascade`: ``spark.catalog`` introspection instead of
  information_schema; CASCADE dependency semantics (Postgres's
  pg_depend walk) recovered from ANALYZED Catalyst plans — the
  resolver itself names every relation a view reads.

Scale posture: upsert shuffles once on the key; the updates side of a
dimension upsert is usually tiny → broadcastable, and the window
within each key group sees only that key's rows (no global window).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def upsert_last_wins(
    base: DataFrame,
    updates: DataFrame,
    keys: Sequence[str],
    order: Sequence[Column] | None = None,
) -> DataFrame:
    """MERGE semantics as a DataFrame op: rows from ``updates`` replace
    same-key rows in ``base``; unmatched rows pass through (the
    reference's ON CONFLICT DO UPDATE, kafka_producer.py:42-48).

    ``order`` extends the precedence beyond source rank for duplicate
    keys *within* a source; default is source precedence only, which
    requires each input to be key-unique (the dimension contract).
    """
    tagged = base.withColumn("__src", F.lit(0)).unionByName(
        updates.withColumn("__src", F.lit(1))
    )
    w = Window.partitionBy(*keys).orderBy(
        F.col("__src").desc(), *(order or [])
    )
    return (
        tagged.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn", "__src")
    )


def create_table_if_not_exists(
    spark: SparkSession, name: str, schema_ddl: str, using: str = "parquet"
) -> None:
    """S8: idempotent catalog DDL (spark_ingestion.py:23-44)."""
    spark.sql(f"CREATE TABLE IF NOT EXISTS {name} ({schema_ddl}) USING {using}")


def list_user_tables(spark: SparkSession, database: str | None = None) -> list[str]:
    """S9a: enumerate non-temporary tables in a database
    (reset_postgres.py:22-33's information_schema walk)."""
    return [
        t.name
        for t in spark.catalog.listTables(database)
        if not t.isTemporary
    ]


def drop_all_user_tables(spark: SparkSession, database: str | None = None) -> list[str]:
    """S9b: cascade-drop every user table (reset_postgres.py:35-45).
    Views drop first (a view is the only catalog object that can
    depend on a table here), then tables — so no intermediate state
    has a dangling view. Returns the dropped names in drop order.

    For a whole-database reset Spark has the native statement —
    ``DROP DATABASE db CASCADE`` — which this mirrors for the default
    database (not droppable itself).

    The DROP statements are ALWAYS database-qualified (r7 review,
    confirmed live): an unqualified ``DROP VIEW v`` resolves a temp
    view named ``v`` first, so with a temp/persistent name collision
    the reset would destroy the unrelated temp view and silently leave
    the listed persistent object in place while reporting it dropped.
    """
    prefix = f"{database or spark.catalog.currentDatabase()}."
    tables = [
        t
        for t in spark.catalog.listTables(database)
        if not t.isTemporary
    ]
    views = [t.name for t in tables if t.tableType == "VIEW"]
    plain = [t.name for t in tables if t.tableType != "VIEW"]
    for name in views:
        spark.sql(f"DROP VIEW IF EXISTS {prefix}{name}")
    for name in plain:
        spark.sql(f"DROP TABLE IF EXISTS {prefix}{name}")
    return views + plain


def _walk_plan(node):
    """Depth-first walk of a Catalyst TreeNode via py4j — INCLUDING
    plans embedded in subquery EXPRESSIONS (scalar subqueries,
    IN/EXISTS): those live in the expression tree, not ``children()``,
    and a walk that skips them misses e.g. the ``t`` in
    ``SELECT (SELECT COUNT(*) FROM t)`` (r6 review fix — drop_cascade
    left such views dangling, the failure it exists to prevent)."""
    yield node
    children = node.children()
    for i in range(children.size()):
        yield from _walk_plan(children.apply(i))
    subs = node.subqueries()
    for i in range(subs.size()):
        yield from _walk_plan(subs.apply(i))


def _norm_ident(ident: str) -> str:
    """``spark_catalog``.``default``.``t`` → spark_catalog.default.t"""
    return ident.replace("`", "")


def relation_dependencies(spark: SparkSession, name: str) -> set[str]:
    """Every catalog relation (table or view, qualified) the ANALYZED
    plan of ``name`` reads. Resolution-accurate by construction — the
    same resolver that would run the view runs here, so quoting,
    current-database, CTE shadowing etc. are all handled; no SQL-text
    regexes (the reference's information_schema walk gets this from
    Postgres's pg_depend, reset_postgres.py:22-45). Analyzed plans
    inline views, so TRANSITIVE dependencies appear directly.
    """
    # the view's own View node is in its plan, so `name` itself
    # appears in the result — harmless for the cascade check, which
    # excludes the target from the candidate list
    plan = spark.table(name)._jdf.queryExecution().analyzed()
    deps: set[str] = set()
    for n in _walk_plan(plan):
        cls = n.getClass().getSimpleName()
        if cls == "View":
            deps.add(_norm_ident(n.desc().identifier().toString()))
        elif cls == "LogicalRelation":
            ct = n.catalogTable()
            if ct.isDefined():
                deps.add(_norm_ident(ct.get().identifier().toString()))
        elif cls == "HiveTableRelation":
            deps.add(_norm_ident(n.tableMeta().identifier().toString()))
        elif cls in ("DataSourceV2Relation", "DataSourceV2ScanRelation"):
            # v2 catalog tables (Delta/Iceberg/any TableCatalog) — the
            # getSimpleName dispatch previously fell through here, so
            # views over v2 tables contributed no dependencies and
            # drop_cascade left them dangling (r7 review). The scan
            # wrapper only appears post-optimization, but handle both.
            rel = n.relation() if cls == "DataSourceV2ScanRelation" else n
            try:
                ident = rel.identifier()
                if ident.isDefined():
                    deps.add(_norm_ident(ident.get().toString()))
                else:
                    deps.add(_norm_ident(rel.table().name()))
            except Exception:  # noqa: BLE001 — connector-specific shapes
                deps.add(_norm_ident(rel.table().name()))
    return deps


def drop_cascade(spark: SparkSession, name: str) -> list[str]:
    """``DROP ... CASCADE``: drop every view (temp or persistent, any
    database) whose plan reads ``name`` — directly or transitively —
    then ``name`` itself. Returns qualified names in drop order.

    Spark's own ``DROP TABLE`` leaves dependent views dangling (they
    fail at next resolution); Postgres CASCADE removes them — this
    restores that contract on the Spark catalog. Views that ALREADY
    fail analysis (dangling from an earlier non-cascade drop) cannot
    be attributed to ``name`` and are left alone. Catalog-only
    operation: cost is one analysis per view, no job runs.
    """
    cur_db = spark.catalog.currentDatabase()
    # a bare name may be a TEMP view (no database) — resolve that
    # first; temp views shadow tables in SQL resolution, so the
    # cascade follows the same precedence
    target_is_temp = "." not in name and any(
        t.name == name and t.isTemporary for t in spark.catalog.listTables()
    )
    if target_is_temp:
        target = target_q = name
    else:
        target = name if "." in name else f"{cur_db}.{name}"
        target_q = f"spark_catalog.{target}"
    candidates: list[tuple[str, str, bool]] = []  # (qualified, ref, temp)
    for db in [d.name for d in spark.catalog.listDatabases()]:
        for t in spark.catalog.listTables(db):
            if t.isTemporary and t.database is None:
                continue  # global temp listing dups per-db; handled below
            if t.tableType == "VIEW":
                q = f"{t.database}.{t.name}"
                candidates.append((q, q, False))
    for t in spark.catalog.listTables():  # temp views, database=None
        if t.isTemporary:
            candidates.append((t.name, t.name, True))
    # global temp views live in the reserved global_temp database,
    # which listDatabases() does NOT enumerate (ADVICE r5) — without
    # this they would survive the cascade and dangle, the exact
    # failure mode this function exists to prevent
    try:
        for t in spark.catalog.listTables("global_temp"):
            if t.isTemporary and t.database is not None:
                q = f"global_temp.{t.name}"
                candidates.append((q, q, False))
    except Exception:  # noqa: BLE001 — no global temp db materialized yet
        pass
    # resolve EVERY candidate's dependency set BEFORE the first drop:
    # dropping pv1 mid-walk would make pv2 (a view over pv1) fail
    # analysis and silently dodge the cascade
    to_drop: list[tuple[str, str]] = []
    for qualified, ref, temp in candidates:
        if qualified in (target, target_q):
            continue
        try:
            deps = relation_dependencies(spark, ref)
        except Exception:  # noqa: BLE001 — dangling view, not ours
            continue
        if target_q in deps or target in deps or (temp and name in deps):
            to_drop.append((qualified, ref))
    dropped: list[str] = []
    for qualified, ref in to_drop:
        spark.sql(f"DROP VIEW IF EXISTS {ref}")
        dropped.append(qualified)
    if target_is_temp:
        is_view = True
    else:
        is_view = any(
            t.name == target.split(".")[-1] and t.tableType == "VIEW"
            for t in spark.catalog.listTables(target.rsplit(".", 1)[0])
        )
    spark.sql(
        f"DROP {'VIEW' if is_view else 'TABLE'} IF EXISTS {target}"
    )
    dropped.append(target)
    return dropped


def write_partitioned(
    df: DataFrame, path: str, partition_cols: Sequence[str], mode: str = "overwrite"
) -> None:
    """Hive-style partitioned parquet layout — the 100 TB fact-table
    shape (SCALE.md): scans with a predicate on a partition column
    read only matching directories (partition pruning, visible as
    PartitionFilters in the scan node)."""
    df.write.partitionBy(*partition_cols).mode(mode).parquet(path)


def compact(df: DataFrame, target_rows_per_file: int = 1_000_000) -> DataFrame:
    """Small-files compaction: coalesce to ceil(rows/target) output
    partitions before a write. Uses a cheap count (metadata-only on
    parquet sources); at 100 TB drive this from table statistics
    instead. `coalesce` (not repartition) — no shuffle, just merges
    read splits."""
    n = df.count()
    n_files = max(1, -(-n // target_rows_per_file))
    return df.coalesce(n_files)
