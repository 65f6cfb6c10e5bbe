"""The F1 championship points ladder (operator P4 in SURVEY.md §2.2).

Reference semantics (spark_ingestion.py:95-107): a literal CASE WHEN
ladder mapping finishing position 1..10 to 25/18/15/12/10/8/6/4/2/1
points, anything else (including position > 10) to 0. The reference
applies its not-null filter *after* this projection, so a NULL position
must also yield 0 here rather than NULL — Catalyst pushes the filter
below the projection either way (SURVEY.md §4).

Two Spark formulations are provided:

- :func:`points_for_position` — the chained ``when`` ladder. Catalyst
  constant-folds it and whole-stage codegen compiles it to a single
  branch tree; at 100 TB this is a pure map-side expression with no
  shuffle, so there is nothing to optimize beyond staying JVM-side.
- :func:`points_by_lookup` — an ``element_at`` over a literal array,
  semantically identical; kept as the composition example for
  dictionary-style ladders that are too long to inline as CASE.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: position -> points, positions outside the ladder score 0
POINTS_LADDER: dict[int, int] = {
    1: 25,
    2: 18,
    3: 15,
    4: 12,
    5: 10,
    6: 8,
    7: 6,
    8: 4,
    9: 2,
    10: 1,
}


def points_for_position(position: Column | str) -> Column:
    """Chained ``when`` ladder: position -> championship points."""
    col = F.col(position) if isinstance(position, str) else position
    expr: Column | None = None
    for pos, pts in POINTS_LADDER.items():
        expr = F.when(col == pos, pts) if expr is None else expr.when(col == pos, pts)
    assert expr is not None
    return expr.otherwise(F.lit(0))


def points_by_lookup(position: Column | str) -> Column:
    """Equivalent array-lookup formulation (``element_at`` is 1-based).
    The integrality check keeps it truly equivalent for NON-integer
    inputs (r6 review fix): the when-ladder's equality never matches
    2.5 → 0 points, but a bare range check would pass 2.5 and
    cast-truncate it to position 2's 18 points."""
    col = F.col(position) if isinstance(position, str) else position
    ladder = F.array(*[F.lit(POINTS_LADDER[i]) for i in range(1, 11)])
    in_range = (
        col.isNotNull()
        & (col >= 1)
        & (col <= 10)
        & (col == col.cast("int"))
    )
    return F.when(in_range, F.element_at(ladder, col.cast("int"))).otherwise(F.lit(0))


def points_case_sql(position_expr: str) -> str:
    """Render the identical ladder as ANSI SQL (for the DuckDB oracle)."""
    whens = "\n      ".join(
        f"WHEN {position_expr} = {pos} THEN {pts}" for pos, pts in POINTS_LADDER.items()
    )
    return f"CASE\n      {whens}\n      ELSE 0\n    END"
