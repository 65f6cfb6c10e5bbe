"""Throughput benchmark — the driver runs this per round (BENCH_r{N}.json).

Runs the engine's headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints the
compact summary as the FINAL stdout line: {"metric": ..., "value":
total_sec, "unit": "sec", "queries": {name: sec}, "sf": ...} — the
per-query [min, median, max] spreads ride a separate PRECEDING line
({"spread": ...}) so the summary line stays inside the driver's
fixed-size stdout tail (VERDICT r12 #2).

Each query is executed to completion with the noop sink (full plan
runs, nothing is collected to the driver — same I/O shape a real job
has). One untimed warm-up query amortizes JVM/codegen startup so the
numbers measure the plans, not session boot.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import __spark_entry__ as entrymod  # noqa: E402
from f1_realtime_data_pipeline_spark.session import get_spark  # noqa: E402

#: the queries whose throughput we track round-over-round: the
#: reference contract (q0/q1/q4), the TPC-H relational stress set, and
#: the LLM-pipeline extension ops (dedup / similarity / text quality)
HEADLINE = [
    "q0_stream_transform",
    "q1_standings",
    "q4_podium",
    "tpch_q1",
    "tpch_q3",
    "tpch_q5",
    "tpch_q6",
    "tpch_q10",
    "tpch_q18",
    "tpch_q2",
    "tpch_q9",
    "tpch_q13",
    "tpch_q21",
    "t_quality",
    # r5: the corpus-trained bigram-LM scorer — the heaviest text
    # pipeline shape (explode + two count aggs + join-back)
    "t_bigram_quality",
    "d_ngram_jaccard",
    "d_containment",
    "d_minhash_lsh",
    "d_simhash_pairs",
    "e_knn_lsh",
    "e_knn_join_derived",
    "e_cosine_neardup",
    "pipeline_corpus",
    # the iterative connected-components canonicalizers (VERDICT r1
    # #10): regressions in the CC loop must be visible round-over-round
    "d_dup_clusters",
    "e_neardup_clusters",
    # r12: the occupancy-capped hybrid — the production-default
    # canonicalizer (clique recall in honest buckets, star linearity
    # on masses); tracked beside the clique form it should stay at or
    # under (measured 1.45 s vs 1.74 s edges at sf0.1 with the tagged
    # persist)
    "d_dup_clusters_hybrid",
    # round-2 perf-weak finding, fixed in round 3 (corpus-derived cell
    # count + k-means centroids): tracked so the N^1.5 claim has a
    # round-over-round number behind it
    "e_semdedup",
    # r6 probes: the two heaviest selection/audit additions — DSIR's
    # corpus-wide count tables and the MinHash calibration audit
    "t_dsir_select",
    "d_minhash_est_audit",
    # r13 (VERDICT r12 #4): the embedding-family hybrid canonicalizer
    # and the four mergeable-sketch audits — previously the only new-
    # r12 operators with no round-over-round perf series
    "e_neardup_clusters_hybrid",
    "a_approx_percentile_tail",
    "t_cms_merge_audit",
    "a_kll_merge_audit",
    "a_theta_set_audit",
    # r14 (VERDICT r13 #4): the CDF read path — the sink_epoch_* probes
    # cover writes only; these time the full lifecycle + incremental
    # diff (cdc) and OPTIMIZE/expire/VACUUM + post-vacuum read
    # (compaction). Both build their table at plan-construction time,
    # so the timing covers write + maintenance + read, deliberately.
    "cdc_row_diff",
    "o_compaction_exec",
    # r15: the eleven queries registered this round (staged in r14) —
    # their first driver-recorded perf series (tools/staged_decade.py
    # holds the measured k=1/k=10 decade rows that preceded
    # registration). The cdf pair build their table at
    # plan-construction time like cdc_row_diff above (lifecycle
    # timing, deliberately).
    "g_pagerank",
    "g_pagerank_dangling",
    "g_ppr_seeded",
    "g_common_neighbors",
    "g_degree_stats",
    "t_classifier_scores",
    "t_classifier_dist",
    "t_bm25_topk",
    "t_bm25_postings",
    "w_decay_popularity",
    "w_decay_curve",
    "t_soft_dedup_weights",
    "cdc_row_images",
    "cdc_incremental_agg",
    "cdc_incremental_minmax",
    "t_curriculum_bins",
    "p_table_checksum",
]


def run_to_completion(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def control_plan(spark, sf_dir):
    """FROZEN zero-code-change control (VERDICT r9 #1): defined here,
    not in the registry, and never edited round-over-round — so any
    delta in its timing between rounds measures BOX LOAD, not code.
    Timed best-of-N before and after the suite; a round whose control
    moves >10% vs the prior round's control is a loaded-box run and
    its per-query deltas are not evidence of regressions."""
    from pyspark.sql import functions as F

    return (
        spark.read.parquet(f"{sf_dir}/lineitem.parquet")
        .filter(F.col("l_shipdate") <= "1998-09-02")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum("l_quantity").alias("sum_qty"),
            F.avg("l_extendedprice").alias("avg_price"),
            F.count(F.lit(1)).alias("n"),
        )
    )


def timed_runs(fn, runs: int) -> list[float]:
    """All N wall-clock timings, sorted ascending. The headline number
    stays the min (steady-state throughput); the full spread is emitted
    alongside it (VERDICT r11 #6) so a spiked min self-exonerates — a
    wide min/median gap on one query with a quiet control means box
    contention hit that query's runs, not a code regression."""
    times = []
    for _ in range(runs):
        t0 = time.time()
        fn()
        times.append(time.time() - t0)
    return sorted(round(t, 3) for t in times)


def spread(times: list[float]) -> list[float]:
    """[min, median, max] of a sorted timing list — standard median
    (two-middle average on even N: with runs=2 the old upper-middle
    pick reported the MAX as the median, which would mis-trigger the
    verify skill's wide-min/median-gap exoneration rule)."""
    n = len(times)
    med = (
        times[n // 2]
        if n % 2
        else round((times[n // 2 - 1] + times[n // 2]) / 2, 3)
    )
    return [times[0], med, times[-1]]


def best_of(fn, runs: int) -> float:
    return timed_runs(fn, runs)[0]


def vs_prev_round(timings: dict, control_post: float, sf) -> dict | None:
    """Control-normalized round-over-round delta (VERDICT r14 #7).

    r14's driver bench recorded a +29% sum that was ~16% box drift;
    the exoneration lived in README prose. This folds it into the
    bench artifact itself: find the newest BENCH_r{N}.json the driver
    left in the repo root, compare the sum over the queries COMMON to
    both rounds, and scale the delta by the frozen control's ratio
    (this round's post_sec / that round's post_sec — box speed, not
    code). ``normalized_delta_pct`` is the code-attributable movement;
    ``raw_delta_pct`` is what the wall clock said before exoneration.
    Returns None when no prior artifact (or no usable control) exists.
    """
    import glob

    here = os.path.dirname(os.path.abspath(__file__))
    prevs = sorted(glob.glob(os.path.join(here, "BENCH_r*.json")))
    if not prevs:
        return None
    try:
        with open(prevs[-1]) as fh:
            prev = json.load(fh)
        parsed = prev.get("parsed") or {}
        prev_q = parsed.get("queries") or {}
        prev_ctl = (parsed.get("control") or {}).get("post_sec")
        prev_n = prev.get("n")
    except (OSError, json.JSONDecodeError):
        return None
    common = sorted(set(timings) & set(prev_q))
    if not common or not prev_ctl or not control_post:
        return None
    if parsed.get("sf") != sf:
        # a cross-scale-factor comparison measures the data, not the
        # code — refuse rather than emit a misleading delta
        return None
    cur_sum = sum(timings[q] for q in common)
    prev_sum = sum(prev_q[q] for q in common)
    ratio = control_post / prev_ctl
    raw = 100.0 * (cur_sum - prev_sum) / prev_sum
    norm = 100.0 * (cur_sum / ratio - prev_sum) / prev_sum
    return {
        "round": prev_n,
        "n_common": len(common),
        "common_sum_sec": round(cur_sum, 3),
        "prev_common_sum_sec": round(prev_sum, 3),
        "control_ratio": round(ratio, 3),
        "raw_delta_pct": round(raw, 1),
        "normalized_delta_pct": round(norm, 1),
    }


def main() -> int:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else None

    load_start = list(os.getloadavg())

    spark = get_spark("bench")
    qs = entrymod.queries()
    names = [n for n in HEADLINE if n in qs]

    # warm-up, untimed: touch every input table (file listing + parquet
    # footers + the vectorized reader path) and run the cheapest
    # headline once (JVM/codegen warm-up) so timings measure the plans,
    # not session boot or cold I/O.
    for t in ("lineitem", "orders", "customer", "part", "supplier",
              "nation", "region", "documents", "embeddings"):
        spark.read.parquet(f"{sf_dir}/{t}.parquet").agg({"*": "count"}).collect()
    run_to_completion(qs[names[0]](spark, sf_dir))

    # best-of-N (default 3) per query: the first execution of a plan
    # pays one-time whole-stage-codegen compilation; the min reflects
    # steady-state throughput, which is what scales, and n>=3 damps
    # the box-contention noise that made round-over-round deltas on
    # this 32-way box untrustworthy at best-of-2.
    runs = int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "3"))
    # de-warm the control (VERDICT r10 #5): one untimed execution of
    # the control plan itself, so control_pre measures box load — not
    # this plan's one-time codegen. Measured limit of that fix (r11,
    # isolated-session experiment): the control keeps speeding up for
    # tens of executions (0.66 → 0.40 s over 11 runs; 0.23 s only
    # after the full suite) — suite-wide JVM/C2 warmup, not this
    # plan's codegen — so pre≈post is NOT reachable by warmup alone.
    # Protocol: compare POST_SEC across rounds (steady-state, fully
    # warmed); pre_sec is the qualitative load snapshot at suite start.
    run_to_completion(control_plan(spark, sf_dir))
    control_pre = best_of(
        lambda: run_to_completion(control_plan(spark, sf_dir)), runs
    )
    timings: dict[str, float] = {}
    spreads: dict[str, list[float]] = {}
    for name in names:
        ts = timed_runs(
            lambda: run_to_completion(qs[name](spark, sf_dir)), runs
        )
        timings[name] = ts[0]
        spreads[name] = spread(ts)

    # idempotent-sink epoch probes (BASELINE.md's only latency figure is
    # the reference's ~0.6-0.7 s micro-batch): one foreachBatch epoch of
    # the keyed sink — within-batch dedup + bucket-pruned anti-join +
    # partitioned parquet append — over the full q0 transform output
    # (~1000x the reference's batch rows at sf0.1). "first" = empty
    # sink; "replay" = the SAME batch again (every key already written:
    # the anti-join drops all rows — the exactly-once replay cost).
    import shutil
    import tempfile

    from pyspark.sql import functions as F

    from f1_realtime_data_pipeline_spark.streaming.sinks import (
        idempotent_parquet_sink,
        transactional_delete,
        transactional_merge,
        transactional_parquet_sink,
    )

    batch = qs["q0_stream_transform"](spark, sf_dir)
    probe_times: dict[str, list[float]] = {
        "sink_epoch_first": [],
        "sink_epoch_replay": [],
        "sink_epoch_txn": [],
        "sink_epoch_merge": [],
        "sink_epoch_delete": [],
    }
    for _ in range(runs):
        sink_dir = tempfile.mkdtemp(prefix="bench_sink_") + "/sink"
        write = idempotent_parquet_sink(
            sink_dir, keys=["event_id"], order_cols=["event_time"]
        )
        t0 = time.time()
        write(batch, 0)
        probe_times["sink_epoch_first"].append(time.time() - t0)
        t0 = time.time()
        write(batch, 1)
        probe_times["sink_epoch_replay"].append(time.time() - t0)
        # same first epoch through the manifest-committed sink: the
        # transactional overhead = snapshot resolve + atomic commit
        txn_dir = os.path.dirname(sink_dir) + "/txn"
        write_txn = transactional_parquet_sink(
            txn_dir, keys=["event_id"], order_cols=["event_time"]
        )
        t0 = time.time()
        write_txn(batch, 0)
        probe_times["sink_epoch_txn"].append(time.time() - t0)
        # MERGE epoch: a 10% overlapping update slice through the
        # bucket-granular copy-on-write path (replace + carry-over)
        ups = batch.filter(F.pmod(F.col("event_id"), F.lit(10)) == 0)
        t0 = time.time()
        transactional_merge(
            ups, txn_dir, keys=["event_id"], order_cols=["event_time"]
        )
        probe_times["sink_epoch_merge"].append(time.time() - t0)
        # DELETE epoch: erase the same 10% slice copy-on-write (the
        # right-to-be-forgotten pass at the q0 batch scale)
        t0 = time.time()
        transactional_delete(
            ups.select("event_id"), txn_dir, keys=["event_id"]
        )
        probe_times["sink_epoch_delete"].append(time.time() - t0)
        shutil.rmtree(os.path.dirname(sink_dir), ignore_errors=True)
    for probe, raw in probe_times.items():
        ts = sorted(round(t, 3) for t in raw)
        timings[probe] = ts[0]
        spreads[probe] = spread(ts)

    control_post = best_of(
        lambda: run_to_completion(control_plan(spark, sf_dir)), runs
    )
    # TWO lines, spread FIRST and the compact summary LAST (VERDICT
    # r12 #2): the driver captures a fixed-size tail of stdout, and
    # r12's single line — summary + the full per-query spread dict —
    # outgrew it, clipping the line's START and losing the headline
    # metric ("parsed": null in BENCH_r12.json). The self-exoneration
    # spread (VERDICT r11 #6) stays available on its own preceding
    # line; the final line is short enough to always survive the tail.
    print(json.dumps({"spread": spreads}))
    print(
        json.dumps(
            {
                "metric": (
                    f"headline query wall-clock, noop sink, local mode, "
                    f"best-of-{runs} (min per query)"
                ),
                "value": round(sum(timings.values()), 3),
                "unit": "sec",
                "queries": timings,
                "sf": sf,
                # zero-code-change load control (VERDICT r9 #1): a
                # frozen lineitem scan-agg defined in bench.py, timed
                # best-of-N before and after the suite. NOT summed
                # into value. Compare across rounds: if the control
                # moved, the box did — exonerate per-query deltas
                # before reading them as regressions.
                "control": {
                    "pre_sec": control_pre,
                    "post_sec": control_post,
                    "desc": "frozen lineitem filter+groupBy agg; "
                    "compare POST_SEC across rounds (pre carries "
                    "residual JVM warmup; delta = box load, not code)",
                },
                # load evidence (VERDICT r11 #6): loadavg at suite
                # start/end; per-query best-of-N [min, median, max]
                # spreads are on the PRECEDING stdout line — a spike
                # with a quiet control self-exonerates as box
                # contention, not a code regression.
                "load": {
                    "start_1m_5m_15m": [round(x, 2) for x in load_start],
                    "end_1m_5m_15m": [
                        round(x, 2) for x in os.getloadavg()
                    ],
                },
                # round-over-round movement with the box factored out
                # (VERDICT r14 #7): sum over the queries common to the
                # newest recorded BENCH artifact, divided by the
                # control ratio — normalized_delta_pct is the
                # code-attributable drift; raw_delta_pct is the
                # unexonerated wall-clock one.
                "vs_prev": vs_prev_round(timings, control_post, sf),
            }
        )
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
