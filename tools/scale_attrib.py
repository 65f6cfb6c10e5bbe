"""Per-query scale ATTRIBUTION probe (r14, VERDICT r13 #3/#7).

The k=100 decade sweep (SCALE.md) ranks queries by wall ratio; this
probe answers "is that ratio the data or the plan?" for the top tier
by measuring the WORK VOLUME each plan processes at every K, on the
same tiled fixtures `tools/scale_sweep.py` builds:

- ``d_minhash_lsh``: shingle instance rows (the explode volume both
  count-table aggs and the verify join consume) and band-bucket
  candidate pairs (the only step that could go quadratic). Constant
  dup density must keep candidates ∝ corpus.
- ``t_dsir_select``: token instance rows and distinct vocabulary —
  the two count tables and the scoring join are all ∝ instances (the
  per-copy vocabulary relabeling grows vocab ~K×, so neither table
  saturates).
- ``pipeline_corpus``: input docs (= the norm_text window-shuffle
  volume; the plan is one scan + one window shuffle + one rollup) and
  post-dedup survivors.
- ``e_semdedup`` (r14): within-cell candidate pairs Σ C(|cell|,2) and
  assignment dots N×C under the operator's own trained clustering
  (C = ceil(√N), 1 Lloyd round) — BOTH dominant stages are ~N^1.5 by
  design, so the honest work ratio at k=100 is ~1000×, not 100×; the
  wall ratio must be read against that.

A wall ratio at or under the work ratio means the query scales with
its data — linear work, sub-linear wall is the healthy shape; a wall
ratio ABOVE the work ratio is a plan defect (the q21 signature that
motivated the r13 rewrites).

It also records, per K, the join strategies AQE actually picked in
``tpch_q21``'s executed plan (VERDICT r13 #7): the r13 rewrite dropped
the forced broadcast of filtered orders, trusting the planner to
broadcast while the one-column side is small and to shuffle when
broadcasting half of orders would be the real bug — this prints the
observed crossover instead of asserting it.

Usage:
    python tools/scale_sweep.py --copies 1 10 100 <any-name>  # build tiles
    python tools/scale_attrib.py [--copies 1 10 100]
One JSON line per K.
"""

from __future__ import annotations

import argparse
import json
import os
import re
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402

from f1_realtime_data_pipeline_spark.functions.text import (  # noqa: E402
    normalize_text,
    tokens,
)
from f1_realtime_data_pipeline_spark.operators import dedup as dd  # noqa: E402
from f1_realtime_data_pipeline_spark.operators import similarity as sim  # noqa: E402
from f1_realtime_data_pipeline_spark.operators.materialize import (  # noqa: E402
    materialize,
)
from f1_realtime_data_pipeline_spark.session import get_spark  # noqa: E402

#: join-node physical operators worth reporting from an executed plan
_JOIN_RE = re.compile(
    r"(BroadcastHashJoin|SortMergeJoin|ShuffledHashJoin|"
    r"BroadcastNestedLoopJoin|CartesianProduct)"
)


def q21_join_strategies(df) -> list[str]:
    """Run ``df`` to completion and list the join operators in the
    AQE-FINAL executed plan (collect() keeps the same QueryExecution
    the adaptive re-plan finalizes; a noop write would start a fresh
    one whose plan string is the pre-execution guess)."""
    df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString()
    out = []
    for ln in plan.splitlines():
        m = _JOIN_RE.search(ln)
        if m:
            # operator + join keys, trimmed — enough to identify which
            # join each strategy belongs to
            out.append(ln.strip().lstrip("+-: ")[:110])
    return out


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--copies", nargs="*", type=int, default=[1, 10, 100])
    ap.add_argument("--out", default="/tmp/spark_graft_sweep")
    args = ap.parse_args()

    import __spark_entry__ as entrymod

    qs = entrymod.queries()
    spark = get_spark("scale_attrib")
    for k in args.copies:
        sf = f"{args.out}/k{k}"
        if not os.path.exists(f"{sf}/_OK_REL"):
            print(
                json.dumps({"k": k, "error": f"{sf} not tiled — run scale_sweep"}),
                flush=True,
            )
            continue
        rec: dict = {"k": k}

        t0 = time.time()
        rec["tpch_q21_joins"] = q21_join_strategies(qs["tpch_q21"](spark, sf))
        rec["tpch_q21_sec"] = round(time.time() - t0, 2)

        for name in ("t_dsir_select", "pipeline_corpus", "d_minhash_lsh"):
            t0 = time.time()
            qs[name](spark, sf).write.format("noop").mode("overwrite").save()
            rec[f"{name}_sec"] = round(time.time() - t0, 2)

        docs = spark.read.parquet(f"{sf}/documents.parquet")
        rec["docs"] = docs.count()

        sh = dd.doc_shingles(docs, dd.MINHASH_SHINGLE_N)
        rec["minhash_shingle_rows"] = sh.count()
        rec["minhash_candidates"] = dd._band_candidates(
            dd._minhash_sigs(sh, "md5")
        ).count()

        inst = docs.select(F.explode(tokens("text")).alias("w"))
        rec["dsir_token_instances"] = inst.count()
        rec["dsir_vocab"] = inst.select("w").distinct().count()

        rec["pipeline_canon"] = (
            docs.select(normalize_text("text").alias("n")).distinct().count()
        )

        t0 = time.time()
        qs["e_semdedup"](spark, sf).write.format("noop").mode(
            "overwrite"
        ).save()
        rec["e_semdedup_sec"] = round(time.time() - t0, 2)
        embs = spark.read.parquet(f"{sf}/embeddings.parquet")
        u = materialize(
            sim._unit_vectors(embs, "vec_id", "embedding"), durable=True
        )
        n_vecs = u.count()
        cents = sim._kmeans_centroids(u, None, 1)
        n_cells = cents.count()
        occ = sim._assign_cells(u, cents).groupBy("cell").agg(
            F.count(F.lit(1)).alias("n")
        )
        rec["semdedup_vecs"] = n_vecs
        rec["semdedup_cells"] = n_cells
        rec["semdedup_assign_dots"] = n_vecs * n_cells
        rec["semdedup_cell_pairs"] = (
            occ.agg(
                F.sum(F.expr("n * (n - 1) DIV 2")).cast("bigint").alias("p")
            ).collect()[0]["p"]
            or 0
        )
        print(json.dumps(rec), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
