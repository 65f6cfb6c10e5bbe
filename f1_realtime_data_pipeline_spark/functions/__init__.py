"""Column-expression builders (the engine's scalar function surface).

Each builder returns a ``pyspark.sql.Column`` (JVM-side, codegen'd —
never a Python UDF) and, where an operator participates in the DuckDB
oracle, a twin ``*_sql`` helper that renders the exact ANSI-SQL
equivalent so the Spark plan and the oracle cannot drift apart.
"""

from f1_realtime_data_pipeline_spark.functions.points import (
    POINTS_LADDER,
    points_case_sql,
    points_for_position,
)

__all__ = ["POINTS_LADDER", "points_for_position", "points_case_sql"]
