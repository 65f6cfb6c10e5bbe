"""Decade probe for the graph_ext / scoring_ext / cdf_ext queries.

Same protocol as tools/scale_sweep.py (tiled fixtures, noop sink,
best-of-N, fresh process per K via the runner below) applied to ALL
ELEVEN queries of the three modules staged in r14 and registered in
r15 (g_pagerank, g_degree_stats, t_classifier_scores,
t_classifier_dist, t_bm25_topk, w_decay_popularity, w_decay_curve,
t_soft_dedup_weights, cdc_row_images, cdc_incremental_agg,
p_table_checksum) — their SCALE.md rows carry measured numbers, and
the probe also records WORK counters so the wall ratio is
attributable (the scale_attrib lesson): co-purchase edges for the
graph pair, token instances for the classifier pair.

The cdf lifecycle queries create a fresh uuid-keyed scratch table on
every timed run; the probe deletes each run's scratch dir right after
the run (via ``inventory_star._LAST_SCRATCH``) so a runs×K sweep does
not leak unreclaimed directories into tmpfs.

Usage:
    python tools/staged_decade.py --copies 1 10 [--runs 2]
Prints one JSON line per K; run under `taskset`-free idle box like
every other sweep.
"""

from __future__ import annotations

import argparse
import json
import subprocess
import sys
import time

sys.path.insert(0, "/root/repo")


def _reap_scratch() -> None:
    """Delete the scratch table dirs the just-finished run created.

    The cdf lifecycle plans build a fresh uuid-keyed table per
    invocation; within one sweep process the same-app dirs are never
    swept by the builder itself (a concurrent build might read them),
    so the sweep reaps them between timed runs when nothing can."""
    import shutil

    from f1_realtime_data_pipeline_spark.plans.inventory_star import (
        _LAST_SCRATCH,
    )

    for prefix in list(_LAST_SCRATCH):
        shutil.rmtree(_LAST_SCRATCH.pop(prefix), ignore_errors=True)


def _measure(k: int, out: str, runs: int, only: list[str] | None = None) -> None:
    from f1_realtime_data_pipeline_spark.plans import cdf_ext as cfx
    from f1_realtime_data_pipeline_spark.plans import graph_ext as gx
    from f1_realtime_data_pipeline_spark.plans import scoring_ext as sx
    from f1_realtime_data_pipeline_spark.session import get_spark

    sf_dir = f"{out}/k{k}"
    spark = get_spark("staged_decade")
    # work counters (one pass each, not timed)
    edges = gx._copurchase_edges(spark, sf_dir).count()
    inst = (
        sx._doc_scores(spark, sf_dir)
        .agg({"n_toks": "sum"})
        .collect()[0][0]
    )
    # BM25 probe-side work: the rows that leave the postings index —
    # t_bm25_postings' claimed cost unit (VERDICT r14 #5: measure
    # |postings|-proportional work). The tiled corpus suffixes every
    # token with its copy index (scale_sweep builder), so the FIXED
    # fixture query matches nothing here; the decade rows query the
    # copy-0 vocabulary instead (tile-suffixed terms) — which also
    # makes the claim vivid: |postings(q)| stays CONSTANT as the
    # corpus grows 10x, so the warm-index probe wall should stay flat
    # while the index-free one-pass form grows with the corpus.
    from pyspark.sql import functions as F

    from f1_realtime_data_pipeline_spark.functions.text import tokens
    from f1_realtime_data_pipeline_spark.sources.parquet import read_table

    bm25_terms = [f"{t}c0" for t in sx.BM25_QUERY]
    probe_rows = (
        read_table(spark, sf_dir, "documents")
        .select("doc_id", F.explode(tokens("text")).alias("term"))
        .filter(F.col("term").isin(bm25_terms))
        .groupBy("term", "doc_id")
        .count()
        .count()
    )
    timings = {}
    for name, fn in (
        list(gx.QUERIES.items())
        + list(sx.QUERIES.items())
        + list(cfx.QUERIES.items())
    ):
        if only and name not in only:
            continue
        if name in ("t_bm25_topk", "t_bm25_postings"):
            # tile-suffixed terms so retrieval actually retrieves
            fn = (lambda f: lambda sp, d: f(sp, d, terms=bm25_terms))(fn)
        best = float("inf")
        runtimes = []
        for _ in range(runs):
            t0 = time.time()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            runtimes.append(time.time() - t0)
            best = min(best, runtimes[-1])
            _reap_scratch()
        timings[name] = round(best, 2)
        if name == "t_bm25_postings" and len(runtimes) > 1:
            # Spark's CacheManager reuses the persisted index across
            # identical plans, so run 1 = build+probe and run 2+ =
            # probe on the warm index — record both faces: the amortized
            # production shape is the warm one.
            timings["t_bm25_postings_build"] = round(runtimes[0], 2)
            timings["t_bm25_postings_warm"] = round(min(runtimes[1:]), 2)
    print(
        json.dumps(
            {
                "k": k,
                "copurchase_edges": edges,
                "token_instances": int(inst or 0),
                "bm25_probe_postings": probe_rows,
                "queries": timings,
            }
        ),
        flush=True,
    )


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--copies", nargs="*", type=int, default=[1, 10])
    ap.add_argument("--runs", type=int, default=2)
    ap.add_argument("--base", default="/root/testdata/sf0.1")
    ap.add_argument("--out", default="/tmp/spark_graft_sweep")
    ap.add_argument("--child-k", type=int, default=None)
    ap.add_argument("--only", nargs="*", default=None,
                    help="restrict the timed loop to these query names")
    args = ap.parse_args()

    if args.child_k is not None:
        _measure(args.child_k, args.out, args.runs, args.only)
        return 0

    # tile via the checked-in builder (idempotent: _OK markers)
    from f1_realtime_data_pipeline_spark.session import get_spark
    from tools.scale_sweep import build_scaled, build_scaled_relational

    spark = get_spark("staged_decade_tile")
    for k in args.copies:
        build_scaled(spark, args.base, args.out, k)
        build_scaled_relational(spark, args.base, args.out, k)
    spark.stop()
    for k in args.copies:
        # fresh process per K — the protocol every SCALE.md table uses
        cmd = [
            sys.executable,
            __file__,
            "--child-k",
            str(k),
            "--out",
            args.out,
            "--runs",
            str(args.runs),
        ]
        if args.only:
            cmd += ["--only", *args.only]
        subprocess.run(cmd, check=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
