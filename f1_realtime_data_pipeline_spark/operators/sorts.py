"""Sort / limit / top-k / rank operators (SURVEY.md §2.5, O1-O5).

Determinism note (§3.4): pandas sorts are stable, Spark's distributed
sort is not — every builder here therefore demands a *total* order
(caller supplies tie-break columns). Scale posture: ``orderBy(...).
limit(k)`` compiles to TakeOrderedAndProject — each partition keeps its
local top-k and only k·partitions rows reach the driver-side merge, so
global top-k never materializes a full sort; per-group top-k is a
single shuffle on the group key + an in-partition window, and AQE
handles skewed groups.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def topk_global(df: DataFrame, order: Sequence[Column], k: int) -> DataFrame:
    """O3: global top-k (podium = top-3 of standings)."""
    return df.orderBy(*order).limit(k)


def topk_per_group(
    df: DataFrame,
    keys: Sequence[str],
    order: Sequence[Column],
    k: int,
    rank_col: str = "rnk",
) -> DataFrame:
    """Top-k rows per group with the rank exposed (O5's row_number)."""
    w = Window.partitionBy(*keys).orderBy(*order)
    return (
        df.withColumn(rank_col, F.row_number().over(w).cast("int"))
        .filter(F.col(rank_col) <= k)
    )


def ranked(
    df: DataFrame,
    order: Sequence[Column],
    keys: Sequence[str] = (),
    col: str = "rnk",
    method: str = "row_number",
) -> DataFrame:
    """Attach row_number/rank/dense_rank over an explicit order (O5).

    Scale caveat (r6 review): with ``keys=()`` this is a GLOBAL
    window — Spark moves every row to one partition, a single
    sequential task. Correct and intended for domain-sized inputs
    (the contract queries rank |drivers|-scale relations); for a
    global top-k over a large fact use :func:`topk_global`
    (TakeOrderedAndProject) instead, and for a full global rank use
    the bucketed offset+local-rank composition (t_shuffle_order)."""
    fn = {"row_number": F.row_number, "rank": F.rank, "dense_rank": F.dense_rank}[method]
    w = Window.partitionBy(*keys).orderBy(*order) if keys else Window.orderBy(*order)
    return df.withColumn(col, fn().over(w).cast("int"))
