"""Join operators (SURVEY.md §2.3, J1-J3 + the free semi/anti surface).

The reference only ever joins a big fact against small dimensions
(streamlit-app.py:41; kafka_producer.py:125), so the default strategy
here is broadcast-hash: ship the dim to every executor, zero shuffle of
the fact. At 100 TB that is the difference between a map-side join and
a full shuffle of the fact table. Joins between two large inputs should
go through plain ``df.join`` and let AQE pick sort-merge/shuffled-hash
(plus skew mitigation) — don't force broadcast on something that won't
fit.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def broadcast_enrich(
    fact: DataFrame,
    dim: DataFrame,
    on: str | Sequence[str],
    how: str = "left",
) -> DataFrame:
    """Fact ⋈ broadcast(dim) — J1, the serving layer's enrichment join.

    Left-outer by default: fact rows with no dim match survive with
    nulls (FIXTURES.md requires unknown driver_numbers to be kept).
    """
    return fact.join(F.broadcast(dim), on, how)


def lookup_with_default(
    fact: DataFrame,
    lookup: DataFrame,
    on: str | Sequence[str],
    defaults: dict[str, Column],
) -> DataFrame:
    """J2/J3: left join a small lookup and coalesce misses to defaults.

    Re-expresses the reference's ``dict.get(key, default)`` patterns
    (meeting name -> "Inconnu", kafka_producer.py:125; victory count ->
    0, streamlit-app.py:56) as a broadcast left join + per-column
    ``coalesce``.
    """
    out = fact.join(F.broadcast(lookup), on, "left")
    for name, default in defaults.items():
        out = out.withColumn(name, F.coalesce(F.col(name), default))
    return out


def semi(left: DataFrame, right: DataFrame, on: str | Sequence[str]) -> DataFrame:
    """EXISTS — rows of ``left`` with at least one match in ``right``."""
    return left.join(right, on, "left_semi")


def anti(left: DataFrame, right: DataFrame, on: str | Sequence[str]) -> DataFrame:
    """NOT EXISTS — rows of ``left`` with no match in ``right``."""
    return left.join(right, on, "left_anti")
