"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

Queries and their oracle SQL live side by side in
``f1_realtime_data_pipeline_spark.plans.*`` (each module exposes
``QUERIES`` and ``ORACLE``); this file only aggregates them.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from f1_realtime_data_pipeline_spark.plans import (
    contract_star,
    inventory_star,
    layout_ext,
    llm_ext,
    llm_star,
    tpch,
    tpch_ext,
    windows_star,
)

# Registration order is part of the verification contract: the driver
# checks the FIRST 50 registered queries each round. Rounds 1-4
# covered all 139 previously-registered queries at least once.
# Round 5 leads with _WINDOW_HEAD: every query whose plan or oracle
# changed this round — the distributed-rank rewrite
# (t_shuffle_order), the SDC-prefiltered batch kNN join (e_knn_join,
# new plan AND new oracle), the seven NEW round-5 queries
# (m_jpeg_meta, m_video_meta, m_video_frame_plan, t_pii_redact,
# t_bigram_quality, t_interleave_sources, t_length_buckets), every
# similarity query rerouted through the durable materialize() helper
# (e_knn_lsh, e_cosine_neardup, e_neardup_clusters, e_semdedup,
# e_kmeans, e_knn_ivf_trained), the hardened media decoders
# (m_decoded_meta, m_frame_sample, m_audio_meta), and the one
# permanently-approximate rows-only entry (a_approx_distinct) so its
# rows row stays fresh. The remaining ~31 window slots backfill from
# the families whose last driver check is oldest (round 1:
# inventory_star → tpch head).
_QUERY_MODULES = [
    inventory_star,
    tpch,
    tpch_ext,
    contract_star,
    windows_star,
    llm_ext,
    layout_ext,
    llm_star,
]

#: queries pulled to the head of the driver's 50-query window this
#: round (KeyError at import if a name disappears — the rotation list
#: cannot silently go stale).
_WINDOW_HEAD = [
    "t_shuffle_order",
    "e_knn_join",
    "m_jpeg_meta",
    "m_video_meta",
    "t_pii_redact",
    "m_video_frame_plan",
    "t_bigram_quality",
    "t_interleave_sources",
    "t_length_buckets",
    "p_dataset_card",
    "e_knn_lsh",
    "e_cosine_neardup",
    "e_neardup_clusters",
    "e_semdedup",
    "e_kmeans",
    "e_knn_ivf_trained",
    "m_decoded_meta",
    "m_frame_sample",
    "m_audio_meta",
    "a_approx_distinct",
]


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (Q1 championship standings) on sf0.001."""
    return contract_star.q1_standings(spark, "/root/testdata/sf0.001")


def _ordered(field: str) -> dict:
    merged: dict = {}
    for mod in _QUERY_MODULES:
        merged.update(getattr(mod, field))
    out = {name: merged.pop(name) for name in _WINDOW_HEAD if name in merged}
    missing = [n for n in _WINDOW_HEAD if n not in out and field == "QUERIES"]
    if missing:
        raise KeyError(f"_WINDOW_HEAD names not registered: {missing}")
    out.update(merged)
    return out


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return _ordered("QUERIES")


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL twin for each oracle-checkable query."""
    return _ordered("ORACLE")
