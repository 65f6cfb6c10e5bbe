"""bench.py helper contracts (no Spark session needed).

The driver records bench.py's final JSON line per round; `vs_prev` is
the control-normalized round-over-round delta (VERDICT r14 #7) that
exonerates box drift inside the artifact itself — its math and its
refusal cases are pinned here because a silently-wrong delta would
misdirect a whole round's perf reading.
"""

from __future__ import annotations

import importlib.util
import json

import pytest


@pytest.fixture(scope="module")
def bench():
    spec = importlib.util.spec_from_file_location(
        "bench_under_test", "/root/repo/bench.py"
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


@pytest.fixture(scope="module")
def prev_artifact():
    import glob

    path = sorted(glob.glob("/root/repo/BENCH_r*.json"))[-1]
    return json.load(open(path))


def test_vs_prev_math_matches_hand_computation(bench, prev_artifact):
    parsed = prev_artifact["parsed"]
    prev_q = parsed["queries"]
    prev_ctl = parsed["control"]["post_sec"]
    # synthesize "this round": every common query 10% slower, control
    # 10% slower too -> normalized delta must be ~0 while raw is +10
    timings = {k: v * 1.10 for k, v in prev_q.items()}
    out = bench.vs_prev_round(timings, prev_ctl * 1.10, parsed["sf"])
    assert out is not None
    assert out["round"] == prev_artifact["n"]
    assert out["n_common"] == len(prev_q)
    assert out["raw_delta_pct"] == pytest.approx(10.0, abs=0.2)
    assert out["normalized_delta_pct"] == pytest.approx(0.0, abs=0.2)
    assert out["control_ratio"] == pytest.approx(1.10, abs=0.01)


def test_vs_prev_refuses_cross_sf_and_disjoint(bench, prev_artifact):
    parsed = prev_artifact["parsed"]
    prev_q = parsed["queries"]
    prev_ctl = parsed["control"]["post_sec"]
    # a cross-scale-factor comparison measures the data, not the code
    assert bench.vs_prev_round(dict(prev_q), prev_ctl, 0.009) is None
    # no common queries -> nothing to compare
    assert bench.vs_prev_round({"zzz_nonexistent": 1.0}, prev_ctl,
                               parsed["sf"]) is None
    # a dead control cannot normalize
    assert bench.vs_prev_round(dict(prev_q), 0.0, parsed["sf"]) is None


def test_spread_median_is_standard(bench):
    # even N takes the two-middle average (the r12 upper-middle pick
    # reported the MAX as the median and mis-triggered exoneration)
    assert bench.spread([1.0, 2.0]) == [1.0, 1.5, 2.0]
    assert bench.spread([1.0, 2.0, 9.0]) == [1.0, 2.0, 9.0]
