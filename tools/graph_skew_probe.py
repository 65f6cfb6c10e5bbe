"""Hub-skew hazard probe for the PageRank loop (VERDICT r14 #6).

r16: ``--op hits`` runs the SAME fixtures through operators.graph.hits
— the analogous hazard is the auth half-round's ``groupBy(dst)``
where the hub concentrates; the same map-side-combine absorption
argument should hold and this measures it.

SCALE.md's PageRank posture says "salt the inflow join only if
needed" — this probe MEASURES whether it is needed. Two synthetic
edge fixtures at each decade, built in-plan from ``spark.range`` (no
files):

- **skewed**: half of all edges point at ONE hub dst (the power-law
  shape g_degree_stats pre-flights for), the rest uniform over K dsts;
- **uniform**: the same |E| spread evenly over K+1 dsts.

Both run ``pagerank(iters=3)`` and the probe reports the per-decade
wall plus ``skew_ratio = wall_skew / wall_uniform``. The loop's two
shuffles are (a) the rank join keyed on ``src`` — uniform by
construction in both fixtures — and (b) the inflow ``groupBy(dst)``,
where the hub concentrates: if map-side partial aggregation absorbs
it (one hub row per map partition reaches the reduce side), the ratio
stays ~1 across decades and no salt is needed; a ratio growing with
the decade is the signature that would justify salting the inflow
aggregation.

Usage: python tools/graph_skew_probe.py [--edges 2000000] [--runs 2]
Prints one JSON line per (decade, shape).
"""

from __future__ import annotations

import argparse
import json
import sys
import time

sys.path.insert(0, "/root/repo")


def _edges(spark, m: int, skewed: bool, k: int = 1000):
    """2m edges over m src nodes: half to the hub (dst 0) when skewed,
    all uniform otherwise. Node ids disjoint from dst ids via offset."""
    from pyspark.sql import functions as F

    base = spark.range(m).select(
        (F.col("id") + k + 1).alias("src"),
        (F.col("id") % k + 1).alias("dst"),
    )
    if skewed:
        second = spark.range(m).select(
            (F.col("id") + k + 1).alias("src"), F.lit(0).alias("dst")
        )
    else:
        second = spark.range(m).select(
            (F.col("id") + k + 1).alias("src"),
            ((F.col("id") * 7 + 3) % k + 1).alias("dst"),
        )
    return base.unionAll(second)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--edges", type=int, default=2_000_000,
                    help="|E| at decade 1 (decade 2 is 10x)")
    ap.add_argument("--runs", type=int, default=2)
    ap.add_argument("--iters", type=int, default=3)
    ap.add_argument("--op", choices=["pagerank", "hits"],
                    default="pagerank")
    args = ap.parse_args()

    from f1_realtime_data_pipeline_spark.operators.graph import (
        hits,
        pagerank,
    )
    from f1_realtime_data_pipeline_spark.session import get_spark

    op = pagerank if args.op == "pagerank" else hits

    spark = get_spark("graph_skew_probe")
    walls: dict[tuple[int, str], float] = {}
    for mult in (1, 10):
        m = args.edges * mult // 2
        for shape in ("uniform", "skewed"):
            e = _edges(spark, m, skewed=(shape == "skewed"))
            best = float("inf")
            for _ in range(args.runs):
                t0 = time.time()
                op(e, iters=args.iters).write.format("noop").mode(
                    "overwrite"
                ).save()
                best = min(best, time.time() - t0)
            walls[(mult, shape)] = best
            print(
                json.dumps(
                    {
                        "decade": mult,
                        "op": args.op,
                        "shape": shape,
                        "n_edges": 2 * m,
                        "iters": args.iters,
                        "wall_sec": round(best, 2),
                    }
                ),
                flush=True,
            )
    for mult in (1, 10):
        print(
            json.dumps(
                {
                    "decade": mult,
                    "skew_ratio": round(
                        walls[(mult, "skewed")] / walls[(mult, "uniform")], 3
                    ),
                }
            ),
            flush=True,
        )
    return 0


if __name__ == "__main__":
    sys.exit(main())
