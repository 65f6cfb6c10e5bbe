"""Custom stateful streaming operators via ``applyInPandasWithState``
(SURVEY.md §2.8 T8 — absent from the reference, part of the engine's
streaming surface).

``running_user_totals`` maintains a per-user (count, sum) accumulator
across micro-batches and emits the updated totals for users seen in
each batch — the standing-aggregate pattern (e.g. a live championship
points tally without re-scanning history every page load, which is
what the reference's serving layer does instead).

Scale posture: state lives in the state store partitioned by the group
key — the shuffle is on user_id only, each executor holds its own
key range's state, and nothing ever collects to the driver. Pandas
batches arrive Arrow-encoded (vectorized), not row-at-a-time.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = "user_id bigint, n_events bigint, sum_value double"
STATE_SCHEMA = "n bigint, total double"


def _update_user_totals(
    key: tuple[Any, ...],
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    n, total = state.get if state.exists else (0, 0.0)
    for pdf in pdfs:
        n += len(pdf)
        total += float(pdf["value"].sum())
    state.update((n, total))
    yield pd.DataFrame(
        {"user_id": [key[0]], "n_events": [n], "sum_value": [round(total, 4)]}
    )


def running_user_totals(events: DataFrame) -> DataFrame:
    """Per-user running totals, updated each micro-batch (update mode)."""
    return events.groupBy("user_id").applyInPandasWithState(
        _update_user_totals,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
