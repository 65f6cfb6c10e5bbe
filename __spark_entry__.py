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
    selection_ext,
    tpch,
    tpch_ext,
    windows_star,
)

# Registration order is part of the verification contract: the driver
# checks the FIRST 50 registered queries each round. Rounds 1-6
# covered 162/168 then-registered queries at least once (cumulatively;
# CORRECTNESS_r01..r06 — r6 was 50/50 green).
# Round 7 leads with every query whose plan or oracle changed this
# round: the decorrelated-hyperplane LSH family (per-plane stride +
# independent phase — all 8 plane-dependent oracles: the 5
# literal-plane ones and the 3 closed-form-generator ones, incl. the
# newly corpus-derived e_cosine_neardup/e_neardup_clusters),
# w_asof_attribution (struct-carry NULL-correct asof_join + a
# NULL-planting fixture), t_quality_gopher + pipeline_corpus_v2
# (zero-token docs emit keep=false; v2 embeds the gopher SQL),
# q1/q1_mv (shared serving assembly), q2/q4 (rank-after-limit),
# w_lateness_audit/w_watermark_curve (shared chunked_running_max),
# m_binary_ingest (atomic fixture staging). Then the 6 late-r6
# registrations that have never had a driver row
# (d_lsh_tuning_curve, d_cluster_stats, e_ivf_probe_curve,
# m_dedup_by_ahash, t_length_profile; w_watermark_curve is already in
# the changed set). That is 18 changed + 6 new (e_semantic_decontam,
# t_domain_weights, t_quality_gopher_edges, t_quality_threshold_curve,
# d_dup_rate_by_source, t_contamination_report) + 5 late-r6 = 29 head
# slots; the remaining 21 backfill the oldest driver checks: the full
# r1 residue (7: a_cube … s7_upsert_dim) and the oldest 14 of the r2
# dedup/text head (d_dup_clusters … t_redact). Rotating into round 8
# (all r2-green, unchanged): t_repetition, t_source_mix,
# t_token_stats, t_top_terms, w_funnel, w_interval_join, and the
# seven remaining r2-checked windows_star queries (w_json_props,
# w_retention, w_session, w_sessionize_lag, w_sliding, w_tumbling,
# w_type_transitions). NOT in the window and
# unchanged-since-last-green: everything r4+-checked. The demoted
# pinned-plane e_knn_join left the registry this round (its derived
# twin is registered; the pinned form stays pytest-covered).
_QUERY_MODULES = [
    inventory_star,
    tpch,
    tpch_ext,
    contract_star,
    windows_star,
    llm_ext,
    layout_ext,
    llm_star,
    selection_ext,
]

#: queries pulled to the head of the driver's 50-query window this
#: round (KeyError at import if a name disappears — the rotation list
#: cannot silently go stale).
_WINDOW_HEAD = [
    # --- changed this round (r7) ---
    "e_cosine_neardup",
    "e_neardup_clusters",
    "e_knn_join_derived",
    "e_lsh_buckets",
    "e_knn_lsh",
    "e_knn_classify",
    "e_knn_recall_audit",
    "e_diverse_topk",
    "w_asof_attribution",
    "t_quality_gopher",
    "pipeline_corpus_v2",
    "q1_standings",
    "q1_standings_mv",
    "q2_champion",
    "q4_podium",
    "w_lateness_audit",
    "w_watermark_curve",
    "m_binary_ingest",
    # --- NEW r7 registrations ---
    "e_semantic_decontam",
    "t_domain_weights",
    "t_quality_gopher_edges",
    "t_quality_threshold_curve",
    "d_dup_rate_by_source",
    "t_contamination_report",
    # --- late-r6 registrations, never driver-checked ---
    "d_lsh_tuning_curve",
    "d_cluster_stats",
    "e_ivf_probe_curve",
    "m_dedup_by_ahash",
    "t_length_profile",
    # --- backfill: oldest driver rows (r1) ---
    "a_cube",
    "a_percentiles",
    "j_salted",
    "p_array_funcs",
    "p_key_skew",
    "p_profile",
    "s7_upsert_dim",
    # --- backfill: oldest driver rows (r2) ---
    "d_dup_clusters",
    "d_exact",
    "d_minhash_lsh",
    "d_minhash_signatures",
    "d_ngram_jaccard",
    "d_simhash",
    "d_simhash_pairs",
    "e_quantize",
    "t_fingerprint",
    "t_lang_id",
    "t_normalize",
    "t_pack_sequences",
    "t_quality",
    "t_redact",
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
