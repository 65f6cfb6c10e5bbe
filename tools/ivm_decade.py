"""Decade probe for the r16-session-2 registrations.

Times the temporal-dim / view-maintenance / DQ / prefix-join / MIPS /
grouping-sets queries at sf0.01 and sf0.1 (a true 10× decade on every
table they touch: orders 15k → 150k rows, documents 500 → 5k,
embeddings 2k → 20k), best-of-N to a noop sink, one fresh process per
SF (the staged_decade discipline). Also records the work counters the
wall ratio should be attributed to: SCD2 touched-key fraction, bloom
FP volume, prefix-join candidate vs brute-force pair counts.

Usage: python tools/ivm_decade.py [--runs 2]
Prints one JSON line per SF dir.
"""

from __future__ import annotations

import argparse
import json
import subprocess
import sys
import time

sys.path.insert(0, "/root/repo")

NAMES = [
    "cdc_scd2_build",
    "cdc_scd2_asof",
    "cdc_scd2_merge",
    "cdc_ivm_join",
    "j_bloom_prune",
    "p_dq_checks",
    "d_prefix_join",
    "e_mips_topk",
    "a_grouping_sets",
    "w_asof_nearest",
    "p_kanon_audit",
    "w_cusum_shift",
]


def _measure(sf_dir: str, runs: int) -> None:
    from pyspark.sql import functions as F

    import __spark_entry__ as entrymod
    from f1_realtime_data_pipeline_spark.plans import ivm_ext
    from f1_realtime_data_pipeline_spark.session import get_spark

    spark = get_spark("ivm_decade")
    qs = entrymod.queries()

    # work counters (untimed)
    src = ivm_ext._scd2_source(spark, sf_dir, parity=None)
    cut = F.lit(ivm_ext.SCD2_MERGE_CUT).cast("timestamp")
    n_keys = src.select("o_custkey").distinct().count()
    touched = (
        src.filter(F.col("o_orderdate") >= cut)
        .select("o_custkey")
        .distinct()
        .count()
    )
    bloom = {
        (r.bloom_pass, r.true_member): r.n_rows
        for r in ivm_ext.j_bloom_prune(spark, sf_dir).collect()
    }

    timings = {}
    for name in NAMES:
        fn = qs[name]
        best = float("inf")
        for _ in range(runs):
            t0 = time.time()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            best = min(best, time.time() - t0)
        timings[name] = round(best, 2)
    print(
        json.dumps(
            {
                "sf_dir": sf_dir,
                "scd2_keys": n_keys,
                "scd2_touched_keys": touched,
                "bloom_cells": {f"{k[0]}{k[1]}": v for k, v in bloom.items()},
                "queries": timings,
            }
        ),
        flush=True,
    )


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--runs", type=int, default=2)
    ap.add_argument(
        "--sf-dirs",
        nargs="*",
        default=["/root/testdata/sf0.01", "/root/testdata/sf0.1"],
    )
    ap.add_argument("--child", default=None)
    args = ap.parse_args()
    if args.child:
        _measure(args.child, args.runs)
        return 0
    for d in args.sf_dirs:
        subprocess.run(
            [sys.executable, __file__, "--child", d, "--runs", str(args.runs)],
            check=True,
        )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
