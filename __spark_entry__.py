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
# Round 7's window holds, in order: the 18 queries changed by the
# verdict/advice fixes (decorrelated LSH planes incl. the
# corpus-derived near-dups, NULL-correct asof, zero-token gopher,
# contract rewrites, chunked prefix-max, atomic binary-ingest
# staging); the 6 NEW registrations (embedding decontamination,
# DoReMi domain weights, the gopher edge probe, quality threshold
# curve, cross-source dup matrix, contamination report); the 5
# late-r6 registrations that never had a driver row; and the 20
# queries whose PLANS the late-r7 review batches edited
# (contamination persists, detector broadcast-hint drop, minhash
# helper extraction, semdedup materialization, shared
# normalize/quality builders, multimodal adapter/codec fixes incl.
# m_video_frame_plan's int32→BIGINT byte offsets — the one edited
# ORACLE, changed on both sides) — every edited query selfchecked
# green after its edit, so nothing rides on an unverified change.
# That fills all 50 slots with changed/new/never-checked entries;
# the oldest-green backfill (r1's a_cube … s7_upsert_dim and the
# r2 windows_star head) rotates to round 8, as does the
# plan-identical d_minhash_signatures refactor (same signature
# aggregate expressions re-emitted through _minhash_sigs — displaced
# by the batch-7 oracle/plan edits tpch_q21 and o_zorder_layout) — all unchanged since
# their last green row, and the split-hash/normalize refactors that
# touched their MODULES were verified plan- and oracle-byte-identical
# (hash of all 172 oracle strings compared pre/post). The demoted
# pinned-plane e_knn_join stays out of the registry (pytest parity
# baseline only).
# DEFERRED to round 8 (efficiency refactors on audit queries, found
# by the final r7 review batch, no wrong values): (a) d_lsh_tuning_curve
# re-implements the band-explode/self-join scaffold that
# dedup._band_candidates single-sourced — generalize the helper with
# (bands, rows) parameters and re-verify the curve; (b)
# e_ivf_probe_curve duplicates similarity's cell-assignment/probe
# internals — factor a ranked-cells helper; (c) t_interleave_sources
# derives its distinct-sources relation twice and fires an
# undocumented count() job at plan build — collect the tens-of-rows
# relation once.
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
    # --- changed early r7 (verdict/advice fixes) ---
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
    # --- plans edited by the late-r7 review batches (persist/
    # materialize/adapter/codec changes) — every one selfchecked
    # green after the edit, re-verified by the driver here ---
    "t_contamination",
    "t_contamination_bloom",
    "d_containment",
    "d_minhash_est_audit",
    "e_semdedup",
    "pipeline_corpus",
    "m_video_frame_plan",
    "m_decoded_meta",
    "m_frame_sample",
    "m_audio_meta",
    "m_jpeg_meta",
    "m_video_meta",
    "m_image_ahash",
    "d_dup_clusters",
    "d_minhash_lsh",
    "d_ngram_jaccard",
    "t_lang_id",
    "t_normalize",
    "t_quality",
    # --- batch-7 review edits: q21's oracle now groups by
    # (s_suppkey, s_name) like the Spark side (structural alignment,
    # values identical while names are unique), and the z-order
    # scaler moved to 64-bit integer DIV (exact past 2^53) ---
    "tpch_q21",
    "o_zorder_layout",
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
