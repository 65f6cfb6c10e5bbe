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
- S9 → :func:`list_user_tables` / :func:`drop_all_user_tables`:
  ``spark.catalog`` introspection instead of information_schema.

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
    Returns the dropped names, newest-created last-dropped order not
    guaranteed (matches the reference, which iterates a catalog query).
    """
    names = list_user_tables(spark, database)
    prefix = f"{database}." if database else ""
    for name in names:
        spark.sql(f"DROP TABLE IF EXISTS {prefix}{name}")
    return names


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
