"""Micro-bench named registered queries: best-of-N noop-sink wall time.

Usage: python tools/microbench.py [--sf-dir D] [--runs 3] name...

Same timing methodology as bench.py (noop sink, min of N, one untimed
warm-up of the first query), restricted to the named queries so an
optimization's before/after can be measured back-to-back on similar
box conditions without paying for the full suite. Prints one JSON
line: {"queries": {name: min_sec}, "spreads": {name: [min, med, max]}}.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod  # noqa: E402
from bench import run_to_completion, spread, timed_runs  # noqa: E402
from f1_realtime_data_pipeline_spark.session import get_spark  # noqa: E402


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("names", nargs="+")
    args = ap.parse_args()

    qs = entrymod.queries()
    names = [n for n in args.names if n in qs]
    for unknown in (n for n in args.names if n not in qs):
        print(f"[skip] {unknown}: not a registered query", file=sys.stderr)
    if not names:
        print("error: no registered query names given", file=sys.stderr)
        return 2
    spark = get_spark("microbench")
    for t in ("lineitem", "orders", "customer", "documents", "embeddings"):
        spark.read.parquet(f"{args.sf_dir}/{t}.parquet").agg(
            {"*": "count"}
        ).collect()
    run_to_completion(qs[names[0]](spark, args.sf_dir))

    timings, spreads = {}, {}
    for name in names:
        spark.sparkContext.setJobDescription(f"microbench:{name}")
        ts = timed_runs(
            lambda: run_to_completion(qs[name](spark, args.sf_dir)),
            args.runs,
        )
        timings[name] = ts[0]
        spreads[name] = spread(ts)
        spark.sparkContext.setJobDescription(None)
    print(json.dumps({"queries": timings, "spreads": spreads}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
