"""Relational operator library (SURVEY.md §2 inventory).

Thin, named, tested builders over the DataFrame API. Everything here is
stock Catalyst — the point of the module is to pin *semantics* (null
handling, tie-breaks, default values, determinism vs. the oracle) and
*scale posture* (what broadcasts, what shuffles, on which key), not to
reimplement execution.
"""

from f1_realtime_data_pipeline_spark.operators.aggregations import (
    argmax_per_group,
    chunked_running_max,
    decimal_avg,
    decimal_sum,
    dedup_first_wins,
)
from f1_realtime_data_pipeline_spark.operators.dedup import (
    dup_clusters,
    exact_dedup,
    minhash_lsh_pairs,
    minhash_signatures,
    ngram_jaccard_pairs,
    simhash_pairs,
    simhash_signatures,
)
from f1_realtime_data_pipeline_spark.operators.joins import (
    anti,
    asof_join,
    broadcast_enrich,
    lookup_with_default,
    salted_join,
    semi,
)
from f1_realtime_data_pipeline_spark.operators.multimodal import (
    decode_media,
    frame_sample,
    media_byte_stats,
    resize_plan,
)
from f1_realtime_data_pipeline_spark.operators.similarity import (
    cosine_neardup_pairs,
    ivf_cells,
    knn_bruteforce,
    knn_ivf,
    knn_lsh,
    lsh_buckets,
)
from f1_realtime_data_pipeline_spark.operators.sorts import topk_global, topk_per_group

__all__ = [
    "anti",
    "argmax_per_group",
    "chunked_running_max",
    "asof_join",
    "broadcast_enrich",
    "cosine_neardup_pairs",
    "decimal_avg",
    "decimal_sum",
    "decode_media",
    "dedup_first_wins",
    "dup_clusters",
    "exact_dedup",
    "frame_sample",
    "ivf_cells",
    "knn_bruteforce",
    "knn_ivf",
    "knn_lsh",
    "lookup_with_default",
    "lsh_buckets",
    "media_byte_stats",
    "minhash_lsh_pairs",
    "minhash_signatures",
    "ngram_jaccard_pairs",
    "resize_plan",
    "salted_join",
    "semi",
    "simhash_pairs",
    "simhash_signatures",
    "topk_global",
    "topk_per_group",
]
