"""Watermarked event-time windows + streaming dedup (T6/T7/T8-lite).

Same expressions as the oracle-checked batch plans in
``plans.windows_star``; the streaming additions are the watermark
(bounds state: windows older than max_event_time - delay are finalized
and their state dropped) and ``dropDuplicatesWithinWatermark`` (§2.8
T8 — the streaming form of the idempotency repair, state bounded by
the same watermark instead of growing forever).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from f1_realtime_data_pipeline_spark.operators.aggregations import decimal_sum


def tumbling_counts(
    events: DataFrame,
    window: str = "1 hour",
    watermark: str = "2 hours",
    ts_col: str = "ts",
) -> DataFrame:
    """Streaming tumbling-window agg per event_type."""
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(F.window(ts_col, window).alias("w"), "event_type")
        .agg(
            F.count("*").cast("bigint").alias("n_events"),
            decimal_sum("value", "sum_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


def session_counts(
    events: DataFrame,
    gap: str = "30 minutes",
    watermark: str = "2 hours",
    ts_col: str = "ts",
) -> DataFrame:
    """Streaming session windows per user (gap-based merge state)."""
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy("user_id", F.session_window(ts_col, gap).alias("w"))
        .agg(F.count("*").cast("bigint").alias("n_events"))
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
        )
    )


def dedup_within_watermark(
    stream: DataFrame,
    keys: Sequence[str],
    watermark: str = "1 hour",
    ts_col: str = "date",
) -> DataFrame:
    """Streaming exact dedup with bounded state: duplicates arriving
    within the watermark horizon are dropped; state for keys older than
    the horizon is reclaimed. The unbounded-state batch equivalent is
    ``operators.aggregations.dedup_first_wins``."""
    return stream.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(
        list(keys)
    )


def interval_self_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    ts_col: str = "ts",
    watermark: str = "2 hours",
    max_gap: str = "1 hour",
) -> DataFrame:
    """Stream-stream inner join with an event-time interval bound —
    pair each left event with right events for the same key within
    ``max_gap`` AFTER it (e.g. click→conversion attribution).

    Both sides carry watermarks and the join has a time-range
    condition, so the state store can discard rows older than
    watermark + gap — the requirement for an unbounded stream-stream
    join to run with bounded state. Output columns: key, l_ts, r_ts,
    gap_seconds.
    """
    lt = left.withWatermark(ts_col, watermark).select(
        F.col(key).alias("k"), F.col(ts_col).alias("l_ts")
    )
    rt = right.withWatermark(ts_col, watermark).select(
        F.col(key).alias("k2"), F.col(ts_col).alias("r_ts")
    )
    cond = (
        (F.col("k") == F.col("k2"))
        & (F.col("r_ts") >= F.col("l_ts"))
        & (F.col("r_ts") <= F.col("l_ts") + F.expr(f"INTERVAL {max_gap}"))
    )
    return (
        lt.join(rt, cond)
        .select(
            F.col("k").alias(key),
            "l_ts",
            "r_ts",
            # true floored gap: endpoint truncation (unix_timestamp)
            # over-/under-counts when fractions straddle a second
            F.expr("(unix_micros(r_ts) - unix_micros(l_ts)) DIV 1000000").alias(
                "gap_seconds"
            ),
        )
    )
