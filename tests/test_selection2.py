"""Value pins for the round-6 audit/sketch operators: CMS heavy
hitters, MinHash estimate calibration, sentence chunking, kNN recall
audit, and the order-total histogram."""

from __future__ import annotations

from pyspark.sql import Row
from pyspark.sql import functions as F

from f1_realtime_data_pipeline_spark.operators import dedup as dd
from f1_realtime_data_pipeline_spark.plans import selection_ext as sel

SF = "/root/testdata/sf0.001"


def test_cms_estimate_upper_bounds_exact(spark):
    out = sel.t_heavy_hitters_cms(spark, SF).collect()
    assert len(out) == sel.HH_TOPK
    for r in out:
        # the count-min invariant: estimates never undercount
        assert r.n_cms >= r.n_exact, (r.w, r.n_exact, r.n_cms)
    # the exact top term must be a plausible stopword-scale count
    top = max(out, key=lambda r: r.n_exact)
    assert top.n_exact > 1


def test_cms_collision_free_term_is_exact(spark, monkeypatch):
    # two distinct tokens in a 512-wide, 3-deep sketch: cells cannot
    # collide across all three rows unless the md5 ids collide mod the
    # hash constants — with these two literals they do not, so the
    # estimate equals the truth for both
    rows = [Row(doc_id=0, text="alpha alpha beta")]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    monkeypatch.setattr(sel, "_docs", lambda s, d: df)
    out = {r.w: r for r in sel.t_heavy_hitters_cms(spark, SF).collect()}
    assert out["alpha"].n_exact == 2 and out["alpha"].n_cms == 2
    assert out["beta"].n_exact == 1 and out["beta"].n_cms == 1


def test_minhash_audit_identical_docs_estimate_full(spark):
    docs = spark.createDataFrame(
        [
            Row(doc_id=0, text="the quick brown fox jumps over the lazy dog today"),
            Row(doc_id=1, text="the quick brown fox jumps over the lazy dog today"),
            Row(doc_id=2, text="completely different words in every position here now"),
        ],
        "doc_id bigint, text string",
    )
    out = {(r.doc_a, r.doc_b): r for r in dd.minhash_est_audit(docs).collect()}
    r = out[(0, 1)]
    # identical shingle sets: every permutation matches, truth is 1.0
    assert r.est_ppm == 1_000_000
    assert r.exact_ppm == 1_000_000
    assert r.err_ppm == 0
    # the unrelated doc never becomes a candidate
    assert (0, 2) not in out and (1, 2) not in out


def test_sentence_chunk_budget_rollover(spark, monkeypatch):
    text = ". ".join("word " * 40 for _ in range(3)).strip()  # 3 x 40-token sents
    df = spark.createDataFrame(
        [Row(doc_id=0, text=text)], "doc_id bigint, text string"
    )
    monkeypatch.setattr(sel, "_docs", lambda s, d: df)
    rows = sorted(
        sel.t_sentence_chunk(spark, SF).collect(), key=lambda r: r.sent_pos
    )
    assert [r.n_tok for r in rows] == [40, 40, 40]
    # cumulative-before: 0, 40, 80 → chunks 0, 0, 1 at budget 64
    assert [r.chunk_id for r in rows] == [0, 0, 1]


def test_knn_recall_audit_bounds(spark, sf_dir):
    out = sel.e_knn_recall_audit(spark, sf_dir).collect()
    assert len(out) == 16
    for r in out:
        assert 0 <= r.n_found <= r.n_true <= 5
        assert r.recall_ppm == (r.n_found * 1_000_000) // r.n_true
    # LSH with these parameters finds most true neighbors on the
    # fixture corpus — the audit exists to MEASURE this, but a total
    # recall collapse would mean the index is broken
    mean_recall = sum(r.recall_ppm for r in out) / len(out)
    assert mean_recall > 250_000


def test_histogram_covers_all_orders(spark, sf_dir):
    out = sel  # reuse spark fixture; histogram lives in inventory_star
    from f1_realtime_data_pipeline_spark.plans import inventory_star as inv

    rows = inv.a_histogram(spark, sf_dir).collect()
    total = sum(r.n for r in rows)
    import duckdb

    n_orders = (
        duckdb.connect()
        .execute(f"SELECT COUNT(*) FROM read_parquet('{sf_dir}/orders.parquet')")
        .fetchone()[0]
    )
    assert total == n_orders
    for r in rows:
        assert 0 <= r.bucket <= 19 and r.lo == r.bucket * 30000.0


def test_weighted_sample_zero_char_doc_is_guarded(spark, monkeypatch):
    from pyspark.sql import Row

    rows = [Row(doc_id=i, n_chars=(0 if i == 5 else 100)) for i in range(10)]
    df = spark.createDataFrame(rows, "doc_id bigint, n_chars bigint")
    monkeypatch.setattr(sel, "_docs", lambda s, d: df)
    out = {r.doc_id: r.priority for r in sel.t_weighted_sample(spark, SF).collect()}
    # no NULL priorities (the Spark-NULLS-FIRST / DuckDB-NULLS-LAST
    # parity break the guard exists to prevent); the empty doc's
    # weight floors at 1
    assert all(p is not None for p in out.values())
    h5 = ((5 % sel.HASH_MOD) * sel.HASH_MULT) % sel.HASH_MOD
    assert out[5] == (h5 + 1) * 1_000_000


def test_priority_hash_no_int64_overflow_at_large_doc_id(spark, monkeypatch):
    # doc_id past 3.5e9: the raw (doc_id * MULT) form overflows int64
    # (DuckDB raises, non-ANSI Spark wraps); the reduced form is exact
    # and engine-identical
    import duckdb

    from pyspark.sql import Row

    big = 3_500_000_000
    df = spark.createDataFrame(
        [Row(doc_id=big, lang="en")], "doc_id bigint, lang string"
    )
    monkeypatch.setattr(sel, "_docs", lambda s, d: df)
    (r,) = sel.t_priority_sample(spark, SF).collect()
    expected = ((big % sel.HASH_MOD) * sel.HASH_MULT) % sel.HASH_MOD
    assert r.h == expected
    got = (
        duckdb.connect()
        .execute(
            f"SELECT (({big} % {sel.HASH_MOD}) * {sel.HASH_MULT}) % {sel.HASH_MOD}"
        )
        .fetchone()[0]
    )
    assert got == expected


def test_decoders_raise_value_error_on_short_headers():
    import pytest

    from f1_realtime_data_pipeline_spark.operators import multimodal as mm

    for blob in (
        b"\x89PNG\r\n\x1a\n" + b"\x00" * 8,   # PNG cut inside IHDR
        b"GIF89a" + b"\x00" * 3,              # GIF cut inside LSD
        b"BM" + b"\x00" * 10,                 # BMP cut inside info header
    ):
        with pytest.raises(ValueError):
            mm.decode_image(blob)
    with pytest.raises(ValueError):
        mm.decode_bmp_ahash(b"BM" + b"\x00" * 10)


def test_decoders_raise_value_error_on_null_payload():
    # r8 NULL sweep: a MISSING blob is a fact of any real corpus, and
    # None[:2] raised TypeError — which escapes the Arrow worker and
    # kills the whole job, unlike the typed-ValueError contract (r7)
    # that makes bad blobs filterable upstream. Every pure decoder
    # must refuse None the same way it refuses junk bytes.
    import pytest

    from f1_realtime_data_pipeline_spark.operators import multimodal as mm

    for decoder in (
        mm.decode_image,
        mm.decode_bmp_ahash,
        mm.decode_wav,
        mm.decode_jpeg,
        mm.decode_mp4,
        mm.decode_mp4_chunk_offset,
    ):
        with pytest.raises(ValueError, match="null payload"):
            decoder(None)


def test_watermark_curve_matches_single_window_form(spark, sf_dir):
    # the distributed prefix-max must reproduce the global-window
    # audit exactly (same 30m delay, same per-type counts)
    from f1_realtime_data_pipeline_spark.plans import windows_star as ws

    curve = {r.event_type: r for r in sel.w_watermark_curve(spark, sf_dir).collect()}
    audit = {r.event_type: r for r in ws.w_lateness_audit(spark, sf_dir).collect()}
    assert set(curve) == set(audit)
    for t, a in audit.items():
        assert curve[t].n_events == a.n_events
        assert curve[t].n_late_30m == a.n_late
    # monotone in the delay: a longer grace period never flags more
    for r in curve.values():
        assert r.n_late_5m >= r.n_late_15m >= r.n_late_30m >= r.n_late_60m


def test_lsh_tuning_curve_monotone_in_bands(spark, sf_dir):
    # more bands with fewer rows per band = more permissive buckets =
    # at least as many candidates (the S-curve direction)
    rows = {
        (r.bands, r.rows_per_band): r.n_candidates
        for r in sel.d_lsh_tuning_curve(spark, sf_dir).collect()
    }
    assert set(rows) == set(sel.LSH_TUNE_CONFIGS)
    assert rows[(16, 1)] >= rows[(8, 2)] >= rows[(4, 4)] >= rows[(2, 8)]


def test_band_candidates_parameterized_matches_detector_default(spark, sf_dir):
    # r8: d_lsh_tuning_curve reuses dedup._band_candidates with
    # explicit (bands, rows). The parameterized call at the detector's
    # own config must be plan-identical to the default call (the
    # single-scaffold guarantee), and an over-wide config must refuse
    # rather than silently read past the signature.
    import pytest as _pytest

    from f1_realtime_data_pipeline_spark.operators import dedup as dd

    import re

    sigs = dd.minhash_signatures(sel._docs(spark, sf_dir))
    default = dd._band_candidates(sigs)
    explicit = dd._band_candidates(sigs, dd.LSH_BANDS, dd.BAND_ROWS)

    def norm(df):  # strip auto-generated expression ids
        return re.sub(
            r"#\d+", "#x", df._jdf.queryExecution().analyzed().toString()
        )

    assert norm(default) == norm(explicit)
    with _pytest.raises(ValueError, match="exceeds"):
        dd._band_candidates(sigs, dd.MINHASH_PERMS, 2)


def test_cluster_stats_accounting(spark, sf_dir):
    from f1_realtime_data_pipeline_spark.operators import dedup as dd

    stats = sel.d_cluster_stats(spark, sf_dir).collect()
    n_docs_in_clusters = sum(r.cluster_size * r.n_clusters for r in stats)
    assert n_docs_in_clusters == dd.dup_clusters(
        sel._docs(spark, sf_dir)
    ).count()
    assert all(r.cluster_size >= 2 or r.n_clusters >= 0 for r in stats)


def test_ivf_probe_curve_monotone(spark, sf_dir):
    rows = {r.nprobe: r for r in sel.e_ivf_probe_curve(spark, sf_dir).collect()}
    assert set(rows) == set(sel.IVF_TUNE_NPROBES)
    # widening the probe only adds candidates and hits
    for a, b in zip(sorted(rows), sorted(rows)[1:]):
        assert rows[b].n_candidates >= rows[a].n_candidates
        assert rows[b].n_hits >= rows[a].n_hits
        assert rows[b].recall_ppm >= rows[a].recall_ppm
    for r in rows.values():
        assert 0 <= r.recall_ppm <= 1_000_000


def test_dedup_by_ahash_groups(spark, sf_dir):
    out = sel.m_dedup_by_ahash(spark, sf_dir).collect()
    by_group: dict = {}
    for r in out:
        by_group.setdefault(r.keeper, []).append(r)
    for keeper, rows in by_group.items():
        canon = [r for r in rows if r.is_canonical]
        assert len(canon) == 1 and canon[0].doc_id == keeper
        assert all(r.doc_id >= keeper for r in rows)


def test_domain_weights_shift_toward_lossy_domains(spark, monkeypatch):
    # r7 DoReMi-lite: a domain whose text the corpus bigram LM
    # predicts poorly (unique bigrams -> low avg_prob_ppm -> high
    # surprisal loss) must GAIN weight over the iterations; a
    # highly predictable domain must LOSE it. Weights stay a
    # normalized ppb simplex.
    from unittest import mock

    from pyspark.sql import Row

    from f1_realtime_data_pipeline_spark.plans import llm_ext, selection_ext

    rows = []
    # domain A: one repeated bigram chain -> P(w2|w1)=1 everywhere
    # (no trailing space: a boundary '' token would dent the score)
    for i in range(6):
        rows.append(Row(doc_id=i, source="predictable",
                        text=" ".join(["alpha beta"] * 10), lang="en"))
    # domain B: a SHARED prefix token with a different successor in
    # every position of every doc -> P(successor|q) = 1/60 each.
    # (All-distinct bigrams would be perfectly predictive in a bigram
    # count model: c(w1 w2) = c(w1) = 1 -> ratio 1. Surprisal needs
    # shared prefixes with divergent successors.)
    for i in range(6, 12):
        words = " ".join(f"q a{i}x{j}" for j in range(10))
        rows.append(Row(doc_id=i, source="surprising", text=words, lang="en"))
    df = spark.createDataFrame(rows, "doc_id bigint, source string, text string, lang string")

    with mock.patch.object(llm_ext, "_docs", lambda s, d: df), \
         mock.patch.object(selection_ext, "_docs", lambda s, d: df):
        out = {r.source: r for r in selection_ext.t_domain_weights(None, None).collect()}

    assert set(out) == {"predictable", "surprising"}
    assert out["surprising"].loss_ppm > out["predictable"].loss_ppm
    assert out["surprising"].w_ppb > out["surprising"].w0_ppb
    assert out["predictable"].w_ppb < out["predictable"].w0_ppb
    total = out["surprising"].w_ppb + out["predictable"].w_ppb
    assert abs(total - 1_000_000_000) <= 2  # ppb simplex (integer rounding)


def test_contamination_report_classifies_clean_and_leaky(spark):
    # r7: a test doc sharing a 3-gram with a train doc is compromised
    # with the right overlap fraction; a fully novel test doc still
    # gets a row with compromised=false (classify, never drop).
    from unittest import mock

    from pyspark.sql import Row

    from f1_realtime_data_pipeline_spark.operators.dedup import (
        _SPLIT_BUCKETS,
        _SPLIT_MULT,
        _TEST_GE,
        _TRAIN_LT,
    )
    from f1_realtime_data_pipeline_spark.plans import selection_ext

    def split(i):
        return ((i % _SPLIT_BUCKETS) * _SPLIT_MULT) % _SPLIT_BUCKETS

    train_id = next(i for i in range(4000) if split(i) < _TRAIN_LT)
    test_ids = [i for i in range(4000) if split(i) >= _TEST_GE]
    leaky, clean = test_ids[0], test_ids[1]
    shared = "alpha beta gamma delta epsilon"
    rows = [
        Row(doc_id=train_id, text=shared + " train tail words here"),
        Row(doc_id=leaky, text="lead in " + shared + " test tail"),
        Row(doc_id=clean, text="entirely novel vocabulary nothing shared at all"),
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    with mock.patch.object(selection_ext, "_docs", lambda s, d: df):
        out = {r.doc_id: r for r in selection_ext.t_contamination_report(None, None).collect()}

    assert set(out) == {leaky, clean}  # every test doc classified
    assert out[leaky].compromised and out[leaky].n_leaky_train_docs == 1
    # "alpha beta gamma delta epsilon" has 3 three-gram shingles, all
    # shared; the leaky doc has 9 tokens -> 7 shingles total
    assert out[leaky].max_shared_shingles == 3
    assert abs(out[leaky].max_overlap_frac - 3 / 7) < 1e-12
    assert not out[clean].compromised
    assert out[clean].n_leaky_train_docs == 0 and out[clean].max_overlap_frac == 0.0


def test_multimodal_decoders_bounded_and_64bit():
    # r7 review reproductions: every bad blob must raise the typed
    # ValueError (filterable upstream), never struct.error or
    # ZeroDivisionError escaping the Arrow worker untyped.
    import struct as _struct

    import pytest

    from f1_realtime_data_pipeline_spark.operators import multimodal as mm

    # header-only stco as the LAST box: entry-count unpack used to read
    # an empty slice -> struct.error
    stco_tail = mm.encode_mp4(16, 16, 1000, 1) + _struct.pack(">I4s", 8, b"stco")
    with pytest.raises(ValueError):
        mm.decode_mp4_chunk_offset(_struct.pack(">I4s", 8, b"ftyp") + b""[:0] + stco_tail[len(mm.encode_mp4(16,16,1000,1)):])
    # zero-dim BMP: used to hit ZeroDivisionError at the mean
    with pytest.raises(ValueError):
        mm.decode_bmp_ahash(
            b"BM" + _struct.pack("<IHHI", 54, 0, 0, 54)
            + _struct.pack("<IiiHHIIiiII", 40, 0, 4, 1, 24, 0, 0, 0, 0, 0, 0)
        )
    # negative width passes the signed unpack: must be rejected too
    with pytest.raises(ValueError):
        mm.decode_bmp_ahash(
            b"BM" + _struct.pack("<IHHI", 54, 0, 0, 54)
            + _struct.pack("<IiiHHIIiiII", 40, -4, 4, 1, 24, 0, 0, 0, 0, 0, 0)
        )
    # PNG truncated right after the acTL fourcc: used to struct.error
    png_trunc = (
        b"\x89PNG\r\n\x1a\n"
        + _struct.pack(">I", 13) + b"IHDR"
        + _struct.pack(">II", 4, 4) + b"\x08\x02\x00\x00\x00" + b"\x00" * 4
        + _struct.pack(">I", 8) + b"acTL"
    )
    with pytest.raises(ValueError):
        mm.decode_image(png_trunc)

    # the single-walk fetch-plan decode surfaces the stco offset and
    # the schema carries it as BIGINT (stco is uint32; >2 GiB offsets
    # used to wrap negative through an int32 column)
    full = mm._decode_mp4_full(mm.encode_mp4(16, 16, 1000, 1))
    assert full[5] is not None and full[5] > 0
    assert "chunk_off bigint" in mm.FRAME_PLAN_SCHEMA


def test_trailing_spend_range_frame_semantics(spark, tmp_path):
    """r16 bounded RANGE frame: day 30's frame [1..30] drops day 0 but
    keeps days 10/29; day 60 stands alone (frame [31..60] excludes
    30); and same-day peers BOTH join the frame regardless of row
    order (value-bounded, not ROWS)."""
    import datetime as dt

    from f1_realtime_data_pipeline_spark.plans.windows_star import (
        w_trailing_spend,
    )

    def ts(day):
        return dt.datetime(1970, 1, 1) + dt.timedelta(days=day)

    # (orderkey, custkey, day, price)
    orders = [
        (1, 7, 0, 1.00), (2, 7, 10, 2.00), (3, 7, 10, 4.00),
        (4, 7, 29, 8.00), (5, 7, 30, 16.00), (6, 7, 60, 32.00),
    ]
    spark.createDataFrame(
        [(k, c, ts(d), p) for k, c, d, p in orders],
        "o_orderkey bigint, o_custkey bigint, o_orderdate timestamp, "
        "o_totalprice double",
    ).toPandas().to_parquet(
        str(tmp_path / "orders.parquet"),
        index=False,
        # pandas defaults to TIMESTAMP(NANOS), which Spark's vectorized
        # parquet reader rejects — the events-table gotcha
        coerce_timestamps="us",
        allow_truncated_timestamps=True,
    )

    out = {r.o_orderkey: r
           for r in w_trailing_spend(spark, str(tmp_path)).collect()}
    want = {   # trailing cents, n in frame
        1: (100, 1),            # day 0 alone
        2: (700, 3),            # day 10: 1+2+4 (same-day peer included)
        3: (700, 3),
        4: (1500, 4),           # day 29: all of 0..29
        5: (3000, 4),           # day 30: frame [1..30] drops day 0
        6: (3200, 1),           # day 60: frame [31..60]
    }
    got = {k: (r.trailing_30d_cents, r.n_orders_30d) for k, r in out.items()}
    assert got == want
