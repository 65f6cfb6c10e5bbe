"""PageRank production-depth probe (VERDICT r15 #5).

The registered ``g_pagerank`` runs iters=3 (the oracle's unrolled SQL
twin stays at 3 — a 10-round unrolled twin would be a wall of SQL for
no extra evidence); production crawl rankings run 10-20 rounds. This
probe measures the SAME fixed-point loop at iters=3 and iters=10 over
the k=1 and k=10 tiled co-purchase graphs (the staged_decade protocol:
fresh process per K, noop sink, best-of-N) so SCALE.md carries a
measured answer to "what does depth cost": per-round cost is the
|V|-row rank shuffle + the persisted edges⋈rank join, so wall should
grow ~linearly in iters with a constant per-round increment per K.

Usage:
    python tools/pagerank_depth_probe.py [--runs 2]
    (expects the /tmp/spark_graft_sweep tiles from tools/staged_decade)
"""

from __future__ import annotations

import argparse
import json
import subprocess
import sys
import time

sys.path.insert(0, "/root/repo")


def _measure(k: int, out: str, runs: int) -> None:
    from f1_realtime_data_pipeline_spark.operators.graph import pagerank
    from f1_realtime_data_pipeline_spark.plans import graph_ext as gx
    from f1_realtime_data_pipeline_spark.session import get_spark

    sf_dir = f"{out}/k{k}"
    spark = get_spark("pagerank_depth")
    edges = gx._copurchase_edges(spark, sf_dir)
    n_edges = edges.count()
    timings = {}
    for iters in (3, 10):
        best = float("inf")
        for _ in range(runs):
            t0 = time.time()
            pagerank(
                gx._copurchase_edges(spark, sf_dir), iters=iters
            ).write.format("noop").mode("overwrite").save()
            best = min(best, time.time() - t0)
        timings[f"iters_{iters}"] = round(best, 2)
    timings["per_round_increment_sec"] = round(
        (timings["iters_10"] - timings["iters_3"]) / 7, 3
    )
    print(
        json.dumps({"k": k, "copurchase_edges": n_edges, **timings}),
        flush=True,
    )


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--copies", nargs="*", type=int, default=[1, 10])
    ap.add_argument("--runs", type=int, default=2)
    ap.add_argument("--out", default="/tmp/spark_graft_sweep")
    ap.add_argument("--child-k", type=int, default=None)
    args = ap.parse_args()
    if args.child_k is not None:
        _measure(args.child_k, args.out, args.runs)
        return 0
    for k in args.copies:
        subprocess.run(
            [sys.executable, __file__, "--child-k", str(k),
             "--out", args.out, "--runs", str(args.runs)],
            check=True,
        )
    return 0


if __name__ == "__main__":
    sys.exit(main())
