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
# checks the FIRST 50 registered queries each round. Rounds 1-3
# covered all 132 registered queries at least once (r1: contract/
# inventory/tpch head; r2: llm_star + windows_star; r3: llm_ext +
# tpch_ext tail). Round 4 leads with _WINDOW_HEAD: every query whose
# plan or oracle changed this round — the round-3 stale trio
# (j_anti, e_cosine_neardup, e_neardup_clusters — edited after their
# last driver row), the single-scan LSH/standings rewrites, the
# localCheckpoint'd k-means family, the real-codec multimodal queries
# (now fully oracle-checked instead of rows-only), the new
# forced-iterative CC variant, and the one permanently-approximate
# rows-only entry (a_approx_distinct) so its rows row stays fresh.
# The remaining window slots fill from the families whose last driver
# check is oldest (round 1: inventory_star → tpch → tpch_ext).
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
    "j_anti",
    "e_cosine_neardup",
    "e_neardup_clusters",
    "e_cosine_neardup_exact",
    "e_knn_lsh",
    "e_semdedup",
    "e_kmeans",
    "e_knn_ivf_trained",
    "q1_standings",
    "q2_champion",
    "q4_podium",
    "m_byte_stats",
    "m_decoded_meta",
    "m_resize_plan",
    "m_frame_sample",
    "d_dup_clusters_iter",
    "a_approx_distinct",
    "p_skew_profile",
    "d_containment",
    "e_knn_join",
    "m_audio_meta",
    "o_compaction_plan",
    "e_pq_codes",
    "e_knn_pq",
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
