"""Parquet readers for the driver's test tables.

``events.parquet`` is written with nanosecond timestamps
(TIMESTAMP(NANOS)), which Spark's vectorized parquet reader rejects
outright. We read nanos as raw int64 (``spark.sql.legacy.parquet.
nanosAsLong`` — a session conf, safe to set at read time) and rebuild a
microsecond TimestampType column with integer division, so downstream
event-time logic (windows, watermarks) sees a normal timestamp. The
division is JVM-side integer arithmetic (``DIV``), not a double cast,
because nanosecond epochs exceed 2^53 and would lose precision through
a double.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def read_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Plain parquet scan; special-cases ``events`` (nanos timestamps)."""
    if name == "events":
        return read_events(spark, sf_dir)
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def read_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``events`` with ``ts`` as a proper microsecond TimestampType.

    Normalizes whatever physical type the generator wrote:

    - TIMESTAMP(NANOS): read as raw int64 (the conf above) and rebuilt
      via integer division;
    - TIMESTAMP(MICROS, isAdjustedToUTC=false): Spark 4 infers
      TIMESTAMP_NTZ — cast to TimestampType, value-preserving because
      the session timezone is pinned to UTC (session.py) and the
      DuckDB oracle reads the same column as a naive timestamp;
    - TIMESTAMP(MICROS, adjusted): already TimestampType, no-op.
    """
    # set the legacy-nanos conf ONLY when the footer really carries
    # TIMESTAMP(NANOS) (r7 review): the conf is session-wide, and
    # setting it unconditionally changed how every LATER parquet read
    # in the session handles nanos columns (silently bigint instead
    # of Spark's loud unsupported-type error) — with behavior
    # depending on whether read_events happened to run first. The
    # footer probe is one driver-side pyarrow metadata read. When the
    # file IS nanos the conf must stay set for this DataFrame's
    # execution lifetime (Spark re-consults it at scan time), so that
    # one case still leaves it set session-wide — now documented and
    # confined to sessions that genuinely read nanos events.
    import pyarrow.parquet as _pq

    needs_nanos = False
    try:
        field = _pq.read_schema(f"{sf_dir}/events.parquet").field("ts")
        needs_nanos = getattr(field.type, "unit", None) == "ns"
    except Exception:  # noqa: BLE001 — non-local path etc.: keep legacy behavior
        needs_nanos = True
    if needs_nanos:
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(f"{sf_dir}/events.parquet")
    ts_type = dict(df.dtypes).get("ts")
    if ts_type == "bigint":
        # FLOOR division ns→µs (r7 review): DIV truncates toward zero,
        # which rounds pre-1970 nanos to the wrong (later) microsecond;
        # subtracting the negative-remainder carry gives exact floor.
        # Post-epoch data (all current fixtures) is unchanged.
        df = df.withColumn(
            "ts",
            F.timestamp_micros(
                F.expr(
                    "(ts DIV 1000) - (CASE WHEN ts % 1000 < 0 THEN 1 ELSE 0 END)"
                )
            ),
        )
    elif ts_type == "timestamp_ntz":
        df = df.withColumn("ts", F.col("ts").cast("timestamp"))
    return df
