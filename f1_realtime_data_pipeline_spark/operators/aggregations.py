"""Aggregation operators (SURVEY.md §2.4, A1-A5).

Scale posture: every builder here is a partial+final hash aggregation —
Spark's map-side combine halves the shuffle before it happens. The two
deliberate semantics:

- **Deterministic FP sums.** ``sum(double)`` is order-dependent and a
  1000-partition shuffle will not add in the oracle's order, so any
  money-typed sum/avg goes through an exact DECIMAL accumulator and is
  cast back to double on output (:func:`decimal_sum` /
  :func:`decimal_avg`). Integer sums don't need this.
- **Deterministic winners.** first-wins dedup (A4,
  kafka_producer.py:34-41) and arg-max (A5, streamlit-app.py:66) are
  expressed as ``row_number`` over an *explicit total order* instead of
  ``dropDuplicates``/``max_by``, whose tie choice is
  partitioning-dependent — the §3.4 tie-break hazard.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

#: exact intermediate type for double-summing; 4 frac digits covers the
#: test tables' 2-digit money columns with room for averaged remainders
DECIMAL_ACC = "decimal(30,4)"


def decimal_sum(col: Column | str, alias: str) -> Column:
    """Order-insensitive double sum: exact decimal accumulate, double out."""
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(c.cast(DECIMAL_ACC)).cast("double").alias(alias)


def decimal_avg(col: Column | str, alias: str) -> Column:
    """Order-insensitive double average via exact decimal accumulation."""
    c = F.col(col) if isinstance(col, str) else col
    # cast the exact sum to double BEFORE dividing: decimal division
    # truncates at the result scale (Spark) / promotes differently
    # (DuckDB); double÷bigint is the same IEEE op in both engines.
    return (F.sum(c.cast(DECIMAL_ACC)).cast("double") / F.count(c)).alias(alias)


def decimal_sum_sql(expr: str, alias: str) -> str:
    """DuckDB twin of :func:`decimal_sum`."""
    return f"CAST(SUM(CAST({expr} AS DECIMAL(30,4))) AS DOUBLE) AS {alias}"


def decimal_avg_sql(expr: str, alias: str) -> str:
    """DuckDB twin of :func:`decimal_avg`."""
    return (
        f"CAST(SUM(CAST({expr} AS DECIMAL(30,4))) AS DOUBLE) / COUNT({expr}) AS {alias}"
    )


def cents(col: Column | str, digits: int = 2) -> Column:
    """Scale a fixed-point-valued double column to an exact integer.

    Money/rate columns in the test tables carry ``digits`` decimal
    places; ``x * 10^digits`` lands within 1e-10 of an integer, so the
    round is unambiguous in any engine. Products of *cents* integers
    are then exact — the only way to keep multi-factor expressions like
    TPC-H Q1's ``price*(1-disc)*(1+tax)`` bit-identical to the oracle
    (rounding each double product into a decimal is engine-dependent in
    the last ulp).
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.round(c * (10**digits), 0).cast("bigint")


def cents_sql(expr: str, digits: int = 2) -> str:
    """DuckDB twin of :func:`cents`."""
    return f"CAST(ROUND({expr} * {10 ** digits}, 0) AS BIGINT)"


def scaled_sum(expr: Column, alias: str, scale: int) -> Column:
    """Exact integer sum of a cents-product, descaled to double output.

    BIGINT accumulation is exact to 2^63 — fine for the test scale
    factors; a 100 TB run swaps the accumulator for DECIMAL(38,0)
    (same semantics, no overflow) by casting ``expr`` up front.
    """
    return (F.sum(expr).cast("double") / F.lit(float(10**scale))).alias(alias)


def scaled_sum_sql(expr: str, alias: str, scale: int) -> str:
    """DuckDB twin of :func:`scaled_sum`."""
    return f"CAST(SUM({expr}) AS DOUBLE) / {float(10 ** scale)} AS {alias}"


def dedup_first_wins(
    df: DataFrame, keys: Sequence[str], order: Sequence[Column]
) -> DataFrame:
    """Keep exactly one row per key — the first under ``order`` (A4).

    ``order`` must be a total order within each key group or the result
    is partitioning-dependent. Shuffles once on ``keys``; at 100 TB
    prefer keys that are already the table's partition/bucket keys so
    AQE can skip the exchange.

    NULL-ordering contract (r8 NULL sweep): Spark sorts NULLS FIRST
    ascending / NULLS LAST descending — the OPPOSITE of DuckDB/
    Postgres defaults — so a NULLABLE order column silently picks a
    different winner than the equivalent ANSI-SQL ROW_NUMBER form.
    Every registered caller orders by schema-non-null columns; pass
    ``F.asc_nulls_last(...)`` / ``F.desc_nulls_first(...)`` (or add
    ``NULLS FIRST/LAST`` to the SQL twin) when a nullable column must
    participate in the order.
    """
    w = Window.partitionBy(*keys).orderBy(*order)
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def argmax_per_group(
    df: DataFrame, keys: Sequence[str], order: Sequence[Column]
) -> DataFrame:
    """Arg-max row per group with an explicit tie-break (A5).

    Same mechanics as :func:`dedup_first_wins`; named separately because
    the intent differs (pick the extremal row, e.g. champion = first of
    points-desc standings, streamlit-app.py:66). For a global arg-max
    pass ``keys=[]`` — Spark plans an exchange to a single partition for
    the final pick, which is fine because the input to a global arg-max
    should already be an aggregate, not the raw fact.
    """
    if keys:
        w = Window.partitionBy(*keys).orderBy(*order)
    else:
        w = Window.orderBy(*order)
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def chunked_running_max(
    df: DataFrame,
    order_col: str,
    val_col: str,
    alias: str = "run_max",
    chunk: int | None = None,
) -> DataFrame:
    """Distributed prefix max: ``MAX(val) OVER (ORDER BY order_col
    ROWS UNBOUNDED PRECEDING)`` without the single-task global-order
    window (r7, VERDICT r6 #7 — the decomposition w_watermark_curve
    proved by measurement, now the shared operator).

    Decomposition: bucket rows by ``order_col DIV chunk``; the running
    max is max(within-chunk prefix max, max over all PRIOR chunks).
    The within-chunk window partitions by chunk; the prior-chunk max
    is a prefix max over the chunk-level aggregate broadcast back.
    Values are IDENTICAL to the global form (max is associative /
    commutative), which is how the DuckDB oracles check it: they
    deliberately keep the plain global window, so a hash match proves
    the decomposition.

    ``chunk`` defaults to the BALANCED width ceil(√(max(order)+1)) —
    derived from the data at plan-build time (one scalar aggregate,
    the same class as the corpus-derived LSH plane count): a FIXED
    chunk makes the chunk-level prefix window a single task over
    domain/chunk rows, which is fine at audit scale but at 10¹²
    events would put ~10⁹ rows in one task; √-sizing bounds BOTH
    levels at ~√domain (10⁶ at 10¹² — the classic two-level
    scan-decomposition balance). Pass an explicit ``chunk`` to pin
    the plan (no derivation scan) when the domain is known.

    Requires ``order_col`` to be a non-negative integral column
    (arrival sequence, epoch, offset). Tie semantics (r7 review): the
    within-chunk window uses a RANGE frame, so every row of an
    ``order_col`` tie group sees the max over the WHOLE group plus
    all prior rows — deterministic regardless of intra-tie physical
    order. (A ROWS frame would give tie rows different answers
    depending on which happened to sort first — nondeterministic AND
    oracle-divergent; oracles must use RANGE / the default frame
    too.) The cross-chunk prefix operates on unique chunk ids, where
    ROWS ≡ RANGE.
    """
    if chunk is None:
        import math

        hi = df.agg(F.max(order_col).alias("m")).collect()[0]["m"]
        chunk = max(1, math.isqrt(int(hi)) + 1) if hi is not None else 1
    out = df.withColumn("__chunk", F.expr(f"{order_col} DIV {chunk}"))
    w_in = (
        Window.partitionBy("__chunk")
        .orderBy(order_col)
        .rangeBetween(Window.unboundedPreceding, Window.currentRow)
    )
    within = out.withColumn("__within_max", F.max(val_col).over(w_in))
    chunk_max = out.groupBy("__chunk").agg(F.max(val_col).alias("__cmax"))
    w_pref = Window.orderBy("__chunk").rowsBetween(Window.unboundedPreceding, -1)
    prev = chunk_max.select(
        "__chunk", F.max("__cmax").over(w_pref).alias("__prev_max")
    )
    return (
        within.join(F.broadcast(prev), "__chunk")
        .withColumn(
            alias,
            F.when(
                F.col("__prev_max").isNull()
                | (F.col("__within_max") >= F.col("__prev_max")),
                F.col("__within_max"),
            ).otherwise(F.col("__prev_max")),
        )
        .drop("__chunk", "__within_max", "__prev_max")
    )
