"""Relational operator library (SURVEY.md §2 inventory).

Thin, named, tested builders over the DataFrame API. Everything here is
stock Catalyst — the point of the module is to pin *semantics* (null
handling, tie-breaks, default values, determinism vs. the oracle) and
*scale posture* (what broadcasts, what shuffles, on which key), not to
reimplement execution.
"""

from f1_realtime_data_pipeline_spark.operators.aggregations import (
    argmax_per_group,
    decimal_avg,
    decimal_sum,
    dedup_first_wins,
)
from f1_realtime_data_pipeline_spark.operators.joins import (
    broadcast_enrich,
    lookup_with_default,
)
from f1_realtime_data_pipeline_spark.operators.sorts import topk_global, topk_per_group

__all__ = [
    "argmax_per_group",
    "decimal_avg",
    "decimal_sum",
    "dedup_first_wins",
    "broadcast_enrich",
    "lookup_with_default",
    "topk_global",
    "topk_per_group",
]
