"""Dump ``explain("formatted")`` for named registered queries.

Usage: python tools/explain_dump.py --out plans/r16 --suffix _before name...

Writes ``<out>/<name><suffix>.txt`` per query. For queries whose
returned DataFrame is post-materialization (ExistingRDD), the stage
plans recorded via ``capturing_stage_plans`` are appended so the
pre-checkpoint detector stages stay auditable (the plan_audit.py
blind-spot fix, reused here for the optimization round's evidence
files).
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod  # noqa: E402
from f1_realtime_data_pipeline_spark.operators.materialize import (  # noqa: E402
    capturing_stage_plans,
)
from f1_realtime_data_pipeline_spark.session import get_spark  # noqa: E402


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--out", default="plans/r16")
    ap.add_argument("--suffix", default="_before")
    ap.add_argument("names", nargs="+")
    args = ap.parse_args()

    spark = get_spark("explain_dump")
    qs = entrymod.queries()
    os.makedirs(args.out, exist_ok=True)
    for name in args.names:
        if name not in qs:
            print(f"[skip] {name}: not registered")
            continue
        with capturing_stage_plans() as stages:
            df = qs[name](spark, args.sf_dir)
            top = spark.sparkContext._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
        path = os.path.join(args.out, f"{name}{args.suffix}.txt")
        with open(path, "w") as fh:
            fh.write(f"== {name} ==\n\n{top}\n")
            for label, plan in stages:
                fh.write(f"\n== stage: {label} ==\n\n{plan}\n")
        print(f"[ok] {name} -> {path}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
