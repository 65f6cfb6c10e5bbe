"""Star-vs-clique candidate sweep: duplicate-mass growth decades.

The r11 skew fixture proved the LSH pair contract quadratic in bucket
occupancy (its own semantics); `dup_clusters_star` exists so the
CLUSTERING path stays linear. This harness measures both forms on a
synthetic corpus with a planted exact-duplicate clique of size k — the
boilerplate pathology — across decades of k, printing one JSON line
per (form, k): candidate count and wall seconds. The numbers behind
SCALE.md's star-reduction rows.

Corpus: k identical boilerplate docs + k filler docs with pairwise
disjoint vocabularies (every filler token carries its doc id, so no
filler shingle collides across docs and the filler adds corpus mass
without adding pairs).

Usage: python tools/star_sweep.py [--ks 100 1000 10000]
           [--clique-max-k 1000]
`--clique-max-k` bounds the quadratic form (its verify stage touches
C(k,2)·shingles rows — at k=10000 that is ~1.5e9, minutes of work by
design; the star runs every k).
"""

from __future__ import annotations

import argparse
import json
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402

from f1_realtime_data_pipeline_spark.operators import dedup as dd  # noqa: E402
from f1_realtime_data_pipeline_spark.session import get_spark  # noqa: E402

BOILER = (
    "subscribe to our newsletter terms of service apply "
    "all rights reserved click here to unsubscribe now today "
) * 2


def clique_corpus(spark, k: int):
    """k identical docs (ids 0..k-1) + k pairwise-disjoint fillers."""
    dup = spark.range(k).select(
        F.col("id").alias("doc_id"), F.lit(BOILER).alias("text")
    )
    filler_words = F.concat_ws(
        " ",
        *[
            F.concat(F.lit(f"w{j}tok"), F.col("id").cast("string"))
            for j in range(12)
        ],
    )
    filler = spark.range(k, 2 * k).select(
        F.col("id").alias("doc_id"), filler_words.alias("text")
    )
    return dup.unionByName(filler)


#: embedding-mass dimension; fillers are the DIM one-hot axes (fixed
#: count, pairwise orthogonal — corpus mass grows only via the clique)
EMB_DIM = 64


def vector_corpus(spark, k: int):
    """k identical unit vectors (ids 0..k-1, the re-encoded-boilerplate
    mass) + EMB_DIM pairwise-orthogonal one-hot fillers."""
    hot = [0.0] * EMB_DIM
    hot[0], hot[1] = 0.6, 0.8
    mass = spark.range(k).select(
        F.col("id").alias("vec_id"),
        F.array(*[F.lit(float(x)) for x in hot]).cast("array<float>").alias(
            "embedding"
        ),
    )
    fillers = spark.createDataFrame(
        [
            (k + j, [1.0 if i == j else 0.0 for i in range(EMB_DIM)])
            for j in range(2, EMB_DIM)
        ],
        "vec_id long, embedding array<float>",
    )
    return mass.unionByName(fillers)


def run_vectors(spark, k: int, clique_max_k: int) -> dict:
    from f1_realtime_data_pipeline_spark.operators import similarity as sim

    embs = vector_corpus(spark, k).localCheckpoint(eager=True)
    t0 = time.time()
    n_star = sim.cosine_neardup_star_edges(embs, threshold=0.9).count()
    star_s = round(time.time() - t0, 3)
    t0 = time.time()
    n_hybrid = sim.cosine_neardup_hybrid_edges(embs, threshold=0.9).count()
    row = {
        "k": k,
        "family": "embedding",
        "star_edges": n_star,
        "star_edges_s": star_s,
        "hybrid_edges": n_hybrid,
        "hybrid_edges_s": round(time.time() - t0, 3),
    }
    if k <= clique_max_k:
        t0 = time.time()
        row["clique_pairs"] = sim.cosine_neardup_lsh_pairs(
            embs, threshold=0.9
        ).count()
        row["clique_pairs_s"] = round(time.time() - t0, 3)
    return row


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--ks", nargs="+", type=int, default=[100, 1000, 10000])
    ap.add_argument("--clique-max-k", type=int, default=1000)
    ap.add_argument(
        "--family", choices=["text", "embedding"], default="text",
        help="text = minhash shingle detector; embedding = cosine LSH",
    )
    args = ap.parse_args()

    spark = get_spark("star_sweep", cpus=8, shuffle_partitions=8)
    if args.family == "embedding":
        for k in args.ks:
            print(json.dumps(run_vectors(spark, k, args.clique_max_k)), flush=True)
        return 0
    for k in args.ks:
        docs = clique_corpus(spark, k).localCheckpoint(eager=True)
        t0 = time.time()
        n_star = dd.minhash_lsh_star_edges(docs, threshold=0.5).count()
        star_edges_s = round(time.time() - t0, 3)
        t0 = time.time()
        star_rows = dd.dup_clusters_star(docs, threshold=0.5).count()
        star_cc_s = round(time.time() - t0, 3)
        # r12 hybrid (VERDICT r11 #2): at the planted mass k >> cap the
        # mass bucket goes star, fillers are singleton buckets — edge
        # count should match the pure star form, wall within its band.
        t0 = time.time()
        n_hybrid = dd.minhash_lsh_hybrid_edges(docs, threshold=0.5).count()
        hybrid_edges_s = round(time.time() - t0, 3)
        t0 = time.time()
        hybrid_rows = dd.dup_clusters_hybrid(docs, threshold=0.5).count()
        hybrid_cc_s = round(time.time() - t0, 3)
        # end-to-end star→CC on the ITERATIVE path (VERDICT r11 #5):
        # force the distributed loop (small_graph_edges=0) and record
        # its round count — one hub per bucket makes the verified edge
        # graph a forest of stars, which min-label + pointer jumping
        # should close in ~2 rounds regardless of k.
        cc_stats: dict = {}
        edges = dd.minhash_lsh_star_edges(docs, threshold=0.5).select(
            "doc_a", "doc_b"
        )
        t0 = time.time()
        iter_rows = dd.connected_components(
            edges, small_graph_edges=0, stats=cc_stats
        ).count()
        star_cc_iter_s = round(time.time() - t0, 3)
        assert iter_rows == star_rows
        row = {
            "k": k,
            "star_edges": n_star,
            "star_edges_s": star_edges_s,
            "star_cluster_rows": star_rows,
            "star_cc_s": star_cc_s,
            "hybrid_edges": n_hybrid,
            "hybrid_edges_s": hybrid_edges_s,
            "hybrid_cluster_rows": hybrid_rows,
            "hybrid_cc_s": hybrid_cc_s,
            "star_cc_iter_s": star_cc_iter_s,
            "star_cc_rounds": cc_stats.get("rounds"),
            "star_cc_loop_parts": cc_stats.get("loop_parts"),
            "star_cc_converged": cc_stats.get("converged"),
        }
        if k <= args.clique_max_k:
            t0 = time.time()
            n_pairs = dd.minhash_lsh_pairs(docs, threshold=0.5).count()
            row["clique_pairs"] = n_pairs
            row["clique_pairs_s"] = round(time.time() - t0, 3)
            t0 = time.time()
            clique_rows = dd.dup_clusters(docs, threshold=0.5).count()
            row["clique_cluster_rows"] = clique_rows
            row["clique_cc_s"] = round(time.time() - t0, 3)
        print(json.dumps(row), flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
