"""Streaming sinks (SURVEY.md §2.1 S5/S10, §2.8 T5).

The reference appends every micro-batch to Postgres with no key
(spark_ingestion.py:116-125) — at-least-once, so a checkpoint loss or
producer replay double-counts championship points (§3.4). The upgrade
here: a keyed, idempotent ``foreachBatch`` sink — new rows are
anti-joined against the already-written key set before appending, so
replays and overlapping batches are no-ops.

Scale posture: on a real deployment this is Delta ``MERGE INTO`` keyed
on (session_key, driver_number) — transactional, concurrent-writer
safe, and the anti-join is a metadata-pruned merge instead of a full
key scan. Delta isn't on this container's classpath, so the parquet
variant implements the same contract for a single streaming writer
(which is exactly Structured Streaming's execution model — one query,
serial epochs). A JDBC mirror (S5) stays available via
``jdbc_append_writer`` for reference parity.
"""

from __future__ import annotations

import os
from collections.abc import Callable, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from f1_realtime_data_pipeline_spark.operators.aggregations import dedup_first_wins


def idempotent_parquet_sink(
    sink_path: str, keys: Sequence[str], order_cols: Sequence[str] | None = None
) -> Callable[[DataFrame, int], None]:
    """Build a ``foreachBatch`` callback: exactly one row per key ever
    reaches ``sink_path``.

    Within a batch, first-wins under an explicit order (defaults to the
    keys themselves) — the deterministic form of the reference's
    'seen'-set dedup. Across batches/replays, existing keys are
    anti-joined away before the append.
    """
    keys = list(keys)

    def write(batch_df: DataFrame, epoch_id: int) -> None:
        order = [F.col(c).asc() for c in (order_cols or keys)]
        batch = dedup_first_wins(batch_df, keys, order)
        if os.path.exists(sink_path):
            existing = batch_df.sparkSession.read.parquet(sink_path).select(*keys)
            batch = batch.join(existing, keys, "left_anti")
        batch.write.mode("append").parquet(sink_path)

    return write


def jdbc_append_writer(
    url: str, table: str, properties: dict[str, str]
) -> Callable[[DataFrame, int], None]:
    """The reference's JDBC append sink shape (spark_ingestion.py:116-125)
    — at-least-once by construction; pair with :func:`idempotent_
    parquet_sink` semantics (MERGE on key) on databases that support it.
    Requires a JDBC driver jar on the classpath.
    """

    def write(batch_df: DataFrame, epoch_id: int) -> None:
        batch_df.write.jdbc(url=url, table=table, mode="append", properties=properties)

    return write
