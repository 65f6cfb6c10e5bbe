"""Tests for the round-6 data-selection surface: DSIR importance
selection, hash-priority sampling, diversity-aware retrieval, MAD
outliers, and the perceptual average-hash decode — semantic edge
cases on tiny literal frames (the sf0.01/sf0.1 oracle checks cover
the corpus-scale behavior)."""

from __future__ import annotations

from pyspark.sql import Row

from f1_realtime_data_pipeline_spark.operators import multimodal as mm
from f1_realtime_data_pipeline_spark.plans import selection_ext as sel

SF = "/root/testdata/sf0.001"


# ---------------------------------------------------------------------------
# DSIR importance selection
# ---------------------------------------------------------------------------


def test_dsir_pure_target_doc_scores_full_affinity(spark, monkeypatch):
    # tokens that ONLY occur in target-language docs score 1e6 ppm;
    # tokens shared 1:1 with a non-target doc score 500000.
    rows = [
        Row(doc_id=0, lang="en", text="alpha alpha beta"),
        Row(doc_id=1, lang="de", text="gamma delta"),
        Row(doc_id=2, lang="en", text="alpha gamma"),
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, lang string, text string")
    monkeypatch.setattr(sel, "_docs", lambda s, d: df)
    out = {r.doc_id: r for r in sel.t_dsir_select(spark, SF).collect()}
    # doc0: alpha(3/3=1e6) x2 + beta(1/1=1e6) → 1e6, selected
    assert out[0].affinity_ppm == 1_000_000 and out[0].selected
    # doc1: gamma appears 2x total, 1x in en → 500000; delta 0/1 → 0
    # mean = (500000 + 0) // 2 = 250000, not selected
    assert out[1].affinity_ppm == 250_000 and not out[1].selected
    # doc2: alpha 1e6, gamma 500000 → 750000, selected
    assert out[2].affinity_ppm == 750_000 and out[2].selected


# ---------------------------------------------------------------------------
# hash-priority sampling
# ---------------------------------------------------------------------------


def test_priority_sample_is_deterministic_and_k_sized(spark):
    a = sel.t_priority_sample(spark, SF).collect()
    b = sel.t_priority_sample(spark, SF).collect()
    assert len(a) == sel.SAMPLE_K
    assert sorted(r.doc_id for r in a) == sorted(r.doc_id for r in b)
    # the k smallest priorities: every selected h ≤ every excluded h
    import duckdb

    con = duckdb.connect()
    hmax = max(r.h for r in a)
    n_below = con.execute(
        f"SELECT COUNT(*) FROM read_parquet('{SF}/documents.parquet') "
        f"WHERE (doc_id * {sel.HASH_MULT}) % {sel.HASH_MOD} < {hmax}"
    ).fetchone()[0]
    assert n_below <= sel.SAMPLE_K


def test_weighted_sample_prefers_longer_docs(spark):
    # the size-biased sample's mean n_chars should exceed the corpus
    # mean — the whole point of dividing the priority by the weight
    import duckdb

    sample = sel.t_weighted_sample(spark, SF).collect()
    assert len(sample) == sel.SAMPLE_K
    corpus_mean = (
        duckdb.connect()
        .execute(f"SELECT AVG(n_chars) FROM read_parquet('{SF}/documents.parquet')")
        .fetchone()[0]
    )
    sample_mean = sum(r.n_chars for r in sample) / len(sample)
    assert sample_mean > corpus_mean


# ---------------------------------------------------------------------------
# diversity-aware retrieval
# ---------------------------------------------------------------------------


def test_diverse_topk_round_robins_buckets(spark, sf_dir):
    out = sel.e_diverse_topk(spark, sf_dir).collect()
    assert out, "shortlist should produce selections"
    by_q: dict = {}
    for r in out:
        by_q.setdefault(r.query_id, []).append(r)
    for q, rows in by_q.items():
        rows.sort(key=lambda r: r.sel_rnk)
        assert [r.sel_rnk for r in rows] == list(range(1, len(rows) + 1))
        # distinct buckets always precede bucket repeats: the number of
        # distinct buckets in the first j picks must be >= that of any
        # suffix-extension pattern a plain cosine top-k would give —
        # concretely, a bucket repeats only after every other available
        # bucket has appeared once (round-robin invariant for rank 2+)
        first_seen: dict = {}
        for i, r in enumerate(rows):
            if r.bucket not in first_seen:
                first_seen[r.bucket] = i
        n_buckets = len(first_seen)
        # the first n_buckets picks are exactly the distinct buckets
        assert len({r.bucket for r in rows[:n_buckets]}) == n_buckets


# ---------------------------------------------------------------------------
# MAD outliers
# ---------------------------------------------------------------------------


def test_mad_flags_planted_outlier(spark, monkeypatch):
    vals = [float(v) for v in (10, 11, 12, 13, 14)] + [1000.0]
    rows = [Row(event_type="t", value=v) for v in vals]
    df = spark.createDataFrame(rows, "event_type string, value double")
    monkeypatch.setattr(sel, "_events", lambda s, d: df)
    (r,) = sel.w_anomaly_mad(spark, SF).collect()
    assert r.n == 6
    assert r.med == 12.5
    assert r.n_outliers == 1  # only the 1000.0


# ---------------------------------------------------------------------------
# perceptual average-hash
# ---------------------------------------------------------------------------


def test_ahash_decode_matches_formula():
    # encode → decode roundtrip recovers exactly the arithmetic the
    # oracle computes, across dims incl. the stride-padding cases
    for doc_id in (0, 1, 2, 7, 13, 100, 255):
        w, h = 1 + (doc_id * 7) % 16, 1 + (doc_id * 13) % 16
        payload = mm.encode_bmp_gray(w, h, doc_id)
        dw, dh, mean, ahash = mm.decode_bmp_ahash(payload)
        assert (dw, dh) == (w, h)
        lum = [mm.gray_lum_for(doc_id, x, y) for y in range(h) for x in range(w)]
        exp_mean = sum(lum) // (w * h)
        assert mean == exp_mean
        exp = 0
        for y in range(h):
            for x in range(w):
                if mm.gray_lum_for(doc_id, x, y) > exp_mean:
                    exp |= 1 << ((y * w + x) % 63)
        assert ahash == exp


def test_ahash_rejects_truncated_and_foreign_bytes():
    import pytest

    with pytest.raises(ValueError):
        mm.decode_bmp_ahash(b"\x89PNG1234")
    good = mm.encode_bmp_gray(5, 4, 42)
    with pytest.raises(ValueError):
        mm.decode_bmp_ahash(good[:40])


def test_ahash_brightness_invariant_but_content_sensitive():
    # identical bytes → identical signature (trivially), AND a uniform
    # brightness shift (doc 10 → 11 adds +31 to every pixel with no
    # mod-256 wraparound at 8×8) collides too — the mean-normalization
    # that makes aHash a PERCEPTUAL hash, not a byte hash
    a = mm.decode_bmp_ahash(mm.encode_bmp_gray(8, 8, 10))
    b = mm.decode_bmp_ahash(mm.encode_bmp_gray(8, 8, 10))
    shifted = mm.decode_bmp_ahash(mm.encode_bmp_gray(8, 8, 11))
    assert a == b
    assert shifted[3] == a[3] and shifted[2] != a[2]
    # a phase that wraps mod 256 (doc 13: 13·31 ≡ 147, 147+126 > 255)
    # genuinely reshapes the above-mean pattern → different signature
    wrapped = mm.decode_bmp_ahash(mm.encode_bmp_gray(8, 8, 13))
    assert wrapped[3] != a[3]
