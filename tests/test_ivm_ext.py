"""Semantic invariants for plans/ivm_ext.py (the oracle pins values;
these pin the CONTRACTS the values rest on)."""

from __future__ import annotations

from f1_realtime_data_pipeline_spark.plans import ivm_ext

SF = "/root/testdata/sf0.001"


def test_scd2_intervals_partition_time(spark):
    """Per key: exactly one current version, versions dense from 1,
    and each effective_to equals the NEXT version's effective_from
    (intervals tile the key's history with no gap or overlap)."""
    rows = ivm_ext.cdc_scd2_build(spark, SF).collect()
    by_key: dict = {}
    for r in rows:
        by_key.setdefault(r.cust_id, []).append(r)
    assert by_key, "slice must be non-empty"
    for versions in by_key.values():
        versions.sort(key=lambda r: r.version_n)
        assert [v.version_n for v in versions] == list(
            range(1, len(versions) + 1)
        )
        assert sum(v.is_current for v in versions) == 1
        assert versions[-1].is_current == 1
        assert versions[-1].effective_to is None
        for cur, nxt in zip(versions, versions[1:]):
            assert cur.effective_to == nxt.effective_from
            assert cur.effective_from < cur.effective_to


def test_scd2_asof_matches_interval_semantics(spark):
    """Every matched fact's dim version was valid at the fact ts;
    unmatched facts predate their key's first version (or the key has
    no dim rows at all — odd-only customers)."""
    dim = {
        (r.cust_id, r.version_n): r
        for r in ivm_ext.cdc_scd2_build(spark, SF).collect()
    }
    # rebuild the even-parity dim the asof query actually probes
    even_rows = [
        r
        for r in ivm_ext._scd2_source(spark, SF, parity=0)
        .orderBy("o_custkey", "o_orderdate", "o_orderkey")
        .collect()
    ]
    first_even: dict = {}
    for r in even_rows:
        first_even.setdefault(r.o_custkey, r.o_orderdate)
    out = ivm_ext.cdc_scd2_asof(spark, SF).collect()
    assert out
    n_matched = 0
    for r in out:
        if r.dim_version is None:
            first = first_even.get(r.cust_id)
            assert first is None or r.ts < first
        else:
            n_matched += 1
    assert n_matched > 0


def test_scd2_merge_equals_full_rebuild(spark):
    """The incremental path (anti-join passthrough + semi-join-pruned
    rebuild) is row-identical to the full build, and both sides of
    the split are non-trivial at the cut date."""
    from pyspark.sql import functions as F

    full = ivm_ext.cdc_scd2_build(spark, SF)
    merged = ivm_ext.cdc_scd2_merge(spark, SF)
    cols = full.columns
    sym_diff = full.select(cols).exceptAll(merged.select(cols)).count()
    sym_diff += merged.select(cols).exceptAll(full.select(cols)).count()
    assert sym_diff == 0
    cut = ivm_ext.SCD2_MERGE_CUT
    src = ivm_ext._scd2_source(spark, SF, parity=None)
    n_base = src.filter(F.col("o_orderdate") < cut).count()
    n_delta = src.filter(F.col("o_orderdate") >= cut).count()
    assert n_base > 0 and n_delta > 0, "cut must split the history"
    # BOTH merge paths must carry keys: untouched passthrough AND
    # touched rebuild (an early cut touched every key and left the
    # anti-join path dead)
    keys = set(r.o_custkey for r in src.select("o_custkey").distinct().collect())
    touched = set(
        r.o_custkey
        for r in src.filter(F.col("o_orderdate") >= cut)
        .select("o_custkey")
        .distinct()
        .collect()
    )
    assert touched and keys - touched, (
        f"cut must split the KEY set too: {len(touched)}/{len(keys)} touched"
    )


def test_dq_checks_detect_planted_violations(spark, tmp_path):
    """One planted violation per constraint class: the audit must
    count each exactly (a gate that can only ever say 'passed' is
    untested)."""
    import datetime as dt

    from f1_realtime_data_pipeline_spark.plans.dq_ext import p_dq_checks

    ts = dt.datetime(1995, 1, 1)
    rows = [
        # clean row
        (1, 10, "O", 100.0, ts, "1-URGENT"),
        # completeness: NULL custkey (also skips the referential scan)
        (2, None, "O", 100.0, ts, "1-URGENT"),
        # uniqueness: duplicate orderkey 3
        (3, 10, "O", 100.0, ts, "1-URGENT"),
        (3, 10, "O", 100.0, ts, "1-URGENT"),
        # referential: custkey 99 absent from customer
        (4, 99, "O", 100.0, ts, "1-URGENT"),
        # range: non-positive price
        (5, 10, "O", -5.0, ts, "1-URGENT"),
        # set: status outside {O,F,P}
        (6, 10, "X", 100.0, ts, "1-URGENT"),
        # pattern: malformed priority
        (7, 10, "O", 100.0, ts, "urgent"),
    ]
    spark.createDataFrame(
        rows,
        "o_orderkey bigint, o_custkey bigint, o_orderstatus string, "
        "o_totalprice double, o_orderdate timestamp, o_orderpriority string",
    ).toPandas().to_parquet(
        str(tmp_path / "orders.parquet"),
        index=False,
        coerce_timestamps="us",
        allow_truncated_timestamps=True,
    )
    spark.createDataFrame(
        [(10, "c10", 0, 0.0, "BUILDING")],
        "c_custkey bigint, c_name string, c_nationkey int, "
        "c_acctbal double, c_mktsegment string",
    ).toPandas().to_parquet(str(tmp_path / "customer.parquet"), index=False)

    got = {
        r.check_name: (r.n_checked, r.n_violations, r.passed)
        for r in p_dq_checks(spark, str(tmp_path)).collect()
    }
    assert got == {
        "completeness_custkey": (8, 1, 0),
        "pattern_priority": (8, 1, 0),
        "range_totalprice_pos": (8, 1, 0),
        "referential_custkey": (8, 1, 0),
        "set_orderstatus": (8, 1, 0),
        "unique_orderkey": (8, 1, 0),
    }


def test_bloom_prune_no_false_negative(spark):
    """The (bloom_pass=0, true_member=1) cell must not exist — a
    bloom filter never drops a real member."""
    rows = ivm_ext.j_bloom_prune(spark, SF).collect()
    cells = {(r.bloom_pass, r.true_member): r.n_rows for r in rows}
    assert (0, 1) not in cells
    assert cells.get((1, 1), 0) > 0, "members must pass"


def test_bloom_mask_stays_below_sign_bit(spark):
    """Every stored word is non-negative: positions map into 62 bits
    so two's-complement shift semantics can never diverge per engine."""
    from pyspark.sql import functions as F

    dimkeys = (
        ivm_ext.read_table(spark, SF, "customer")
        .select(F.col("c_custkey").alias("k"))
        .distinct()
    )
    for c, d in ivm_ext.BLOOM_HASHES:
        mx = dimkeys.select(
            ivm_ext._bloom_pos("k", c, d, ivm_ext.BLOOM_BITS).alias("p")
        ).agg(F.max("p"), F.min("p")).collect()[0]
        assert 0 <= mx[1] and mx[0] < ivm_ext.BLOOM_BITS


def test_mips_reduction_preserves_order(spark):
    """The Bachrach/Neyshabur MIPS→cosine reduction: augmenting DB
    vectors with sqrt(M²−‖x‖²) (queries with 0) makes augmented-cosine
    ranking equal inner-product ranking — pinned against mips_topk as
    truth. Also pins that MIPS ≠ plain cosine on this corpus (if the
    two never diverged the operator would be redundant)."""
    import math

    from f1_realtime_data_pipeline_spark.operators import similarity as sim
    from f1_realtime_data_pipeline_spark.sources.parquet import read_table

    embs = {
        r.vec_id: r.embedding
        for r in read_table(spark, SF, "embeddings")
        .filter("embedding IS NOT NULL")
        .collect()
    }
    big_m = max(math.sqrt(sum(x * x for x in v)) for v in embs.values())
    aug = {
        i: list(v) + [math.sqrt(max(0.0, big_m**2 - sum(x * x for x in v)))]
        for i, v in embs.items()
    }

    def top1_aug_cosine(qid):
        qv = list(embs[qid]) + [0.0]
        qn = math.sqrt(sum(x * x for x in qv))
        best = None
        for cid, cv in aug.items():
            if cid == qid:
                continue
            cn = math.sqrt(sum(x * x for x in cv))
            cos = sum(a * b for a, b in zip(qv, cv)) / (qn * cn)
            key = (-cos, cid)
            if best is None or key < best[0]:
                best = (key, cid)
        return best[1]

    mips = {
        r.query_id: r.neighbor_id
        for r in sim.mips_topk(
            read_table(spark, SF, "embeddings"), n_queries=8, k=1
        ).collect()
    }
    assert mips, "fixture must produce MIPS results"
    for qid, want in mips.items():
        assert top1_aug_cosine(qid) == want

    # the operator DISTINCTION, on a constructed fixture (the synthetic
    # corpus's cluster geometry happens to make MIPS and cosine agree
    # at every probed (query, rank) — measured at sf0.001 and sf0.01):
    # neighbor 1 is perfectly aligned with the query but short
    # (cosine winner); neighbor 2 is slightly off-axis but 10× longer
    # (inner-product winner).
    planted = spark.createDataFrame(
        [
            (0, [1.0] + [0.0] * 7, 0),
            (1, [0.5] + [0.0] * 7, 0),
            (2, [4.0, 3.0] + [0.0] * 6, 0),
        ],
        "vec_id bigint, embedding array<float>, label int",
    )
    m1 = {
        r.query_id: r.neighbor_id
        for r in sim.mips_topk(planted, n_queries=1, k=1).collect()
    }
    c1 = {
        r.query_id: r.neighbor_id
        for r in sim.knn_bruteforce(planted, n_queries=1, k=1).collect()
    }
    assert m1[0] == 2 and c1[0] == 1


def test_asof_nearest_contract(spark):
    """Constructed cases: backward tie wins at equal distance, a
    forward-only match within tolerance attaches with dir='f',
    out-of-tolerance rows stay unmatched, and exact-ts matches have
    distance 0."""
    import datetime as dt

    from f1_realtime_data_pipeline_spark.operators.joins import (
        asof_join_nearest,
    )

    def ts(day):
        return dt.datetime(2000, 1, 1) + dt.timedelta(days=day)

    right = spark.createDataFrame(
        [(1, ts(10), "r10"), (1, ts(20), "r20"), (2, ts(50), "r50")],
        "k bigint, ts timestamp, val string",
    )
    left = spark.createDataFrame(
        [
            (100, 1, ts(15)),   # equidistant 10/20 -> backward r10
            (101, 1, ts(21)),   # nearest r20 backward
            (102, 2, ts(45)),   # only forward r50 within tol
            (103, 2, ts(200)),  # out of tolerance -> unmatched
            (104, 1, ts(10)),   # exact tie -> dist 0
        ],
        "fact_id bigint, k bigint, ts timestamp",
    )
    out = {
        r.fact_id: (r.val, r.match_dir, r.dist_s)
        for r in asof_join_nearest(
            left, right, on="k", ts_col="ts", value_cols=["val"],
            tolerance_s=30 * 86400,
        ).collect()
    }
    assert out[100] == ("r10", "b", 5 * 86400)
    assert out[101] == ("r20", "b", 1 * 86400)
    assert out[102] == ("r50", "f", 5 * 86400)
    assert out[103] == (None, None, None)
    assert out[104] == ("r10", "b", 0)


def test_cusum_window_identity_matches_recursion(spark, tmp_path):
    """The window form (prefix sum − running min) must equal the
    clamped recursion S_t = max(0, S_{t-1} + x_t − k) exactly, and a
    planted volume shift must raise the flag while the pre-shift
    regime stays quiet."""
    import datetime as dt

    from f1_realtime_data_pipeline_spark.plans.windows_star import (
        w_cusum_shift,
    )

    # 30 quiet days of 2/day, then 10 days of 12/day (the shift)
    rows = []
    key = 0
    for day in range(40):
        n = 2 if day < 30 else 12
        for _ in range(n):
            key += 1
            rows.append(
                (key, 1, "O", 1.0,
                 dt.datetime(2020, 1, 1) + dt.timedelta(days=day),
                 "1-URGENT")
            )
    spark.createDataFrame(
        rows,
        "o_orderkey bigint, o_custkey bigint, o_orderstatus string, "
        "o_totalprice double, o_orderdate timestamp, o_orderpriority string",
    ).toPandas().to_parquet(
        str(tmp_path / "orders.parquet"),
        index=False,
        coerce_timestamps="us",
        allow_truncated_timestamps=True,
    )
    out = sorted(
        w_cusum_shift(spark, str(tmp_path)).collect(), key=lambda r: r.day
    )
    total, days = 2 * 30 + 12 * 10, 40
    k = (1000 * total) // days
    s = 0
    for r in out:
        s = max(0, s + 1000 * r.n - k)
        assert r.cusum_milli == s, f"day {r.day}: {r.cusum_milli} != {s}"
        assert r.shift_flag == (1 if s > 5 * k else 0)
    assert out[-1].shift_flag == 1, "post-shift regime must alarm"
    assert all(r.shift_flag == 0 for r in out[:30]), "quiet regime"
