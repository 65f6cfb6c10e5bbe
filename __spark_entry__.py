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
# checks the FIRST 50 registered queries each round. Round 1 verified
# contract_star + inventory_star + tpch + the head of tpch_ext
# (CORRECTNESS_r01.json: 49/50); round 2 verified llm_star +
# windows_star + d_substring_dedup (CORRECTNESS_r02.json: 48/50, the
# 2 non-green are rows-only multimodal stubs by design). Round 3 leads
# with the 18 queries that had never had a driver row — the rest of
# the round-2 llm_ext ops (e_semdedup, e_kmeans, t_quality_gopher) and
# the 15 tpch_ext queries outside round 1's window — closing the full
# registered surface to driver-verified, plus every round-3 addition
# (TF-IDF/rare-token scoring, bloom decontamination, trained-IVF kNN,
# chunking, incremental dedup, span splice, pipeline v2, Z-order
# layout audit, skew profile), all registered inside the window so no
# new operator ships without a driver row. Families already
# driver-green in a prior round rotate to the back.
_QUERY_MODULES = [
    llm_ext,
    layout_ext,
    tpch_ext,
    tpch,
    contract_star,
    inventory_star,
    windows_star,
    llm_star,
]


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (Q1 championship standings) on sf0.001."""
    return contract_star.q1_standings(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    out: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    for mod in _QUERY_MODULES:
        out.update(mod.QUERIES)
    return out


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL twin for each oracle-checkable query."""
    out: dict[str, str] = {}
    for mod in _QUERY_MODULES:
        out.update(mod.ORACLE)
    return out
