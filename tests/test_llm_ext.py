"""Tests for the round-2 LLM-data extension operators: exact
substring dedup (rolling windows), SemDeDup, k-means, and the
Gopher-rule quality filter — semantic edge cases on tiny literal
frames (the sf0.01 oracle checks cover the corpus-scale behavior).
"""

from __future__ import annotations

from pyspark.sql import Row

from f1_realtime_data_pipeline_spark.operators import dedup as dd
from f1_realtime_data_pipeline_spark.operators import similarity as sim
from f1_realtime_data_pipeline_spark.plans import llm_ext


def _docs(spark, rows):
    return spark.createDataFrame(
        [Row(doc_id=i, text=t) for i, t in enumerate(rows)], "doc_id bigint, text string"
    )


def _embs(spark, vecs):
    return spark.createDataFrame(
        [Row(vec_id=i, embedding=[float(x) for x in v]) for i, v in enumerate(vecs)],
        "vec_id bigint, embedding array<float>",
    )


# ---------------------------------------------------------------------------
# exact substring dedup
# ---------------------------------------------------------------------------


def test_substring_dedup_catches_unaligned_duplicates(spark):
    # The shared 8-token passage starts at offset 0 in doc0 but offset 2
    # in doc1 — disjoint span dedup (doc_spans) misses this alignment;
    # rolling windows must catch it in BOTH docs.
    passage = "alpha beta gamma delta epsilon zeta eta theta"
    df = _docs(
        spark,
        [
            passage + " tail1 tail2 tail3",
            "pre1 pre2 " + passage + " other tokens here",
            "fully unique words nothing shared at all among docs",
        ],
    )
    out = {
        r.doc_id: r
        for r in dd.substring_dedup_stats(df, k=8).collect()
    }
    assert out[0].n_dup_windows >= 1
    assert out[1].n_dup_windows >= 1
    assert out[2].n_dup_windows == 0
    # window counts: len(tokens) - k + 1
    assert out[0].n_windows == 11 - 8 + 1
    assert out[2].dup_frac == 0.0


def test_substring_dedup_short_docs_have_no_windows(spark):
    df = _docs(spark, ["only three words", "a longer document with exactly eight tokens right here"])
    rows = {r.doc_id: r for r in dd.substring_dedup_stats(df, k=8).collect()}
    assert 0 not in rows  # < k tokens -> no windows -> absent
    assert rows[1].n_windows == 9 - 8 + 1


# ---------------------------------------------------------------------------
# SemDeDup
# ---------------------------------------------------------------------------


def test_semdedup_drops_higher_id_twin(spark):
    # 17 vectors so ids 0..15 are the IVF centroids; vec 16 duplicates
    # vec 0 exactly -> same cell, cosine 1.0 -> 16 dropped, 0 kept.
    base = [[0.0] * 64 for _ in range(16)]
    for i, v in enumerate(base):
        v[i] = 1.0
    vecs = base + [[1.0 if j == 0 else 0.0 for j in range(64)]]
    out = {r.vec_id: r for r in sim.semdedup(_embs(spark, vecs), threshold=0.9).collect()}
    assert out[0].keep is True
    assert out[16].keep is False
    assert out[16].cell == out[0].cell


def test_semdedup_cell_cost_scales_subquadratically(spark, sf_dir):
    # The within-cluster pairwise scan is the operator's entire cost at
    # scale: Σ|cell|² pair-dots. With the corpus-derived C = ceil(√N)
    # (and the k-means-trained centroids balancing the cells) that cost
    # must track ~N^1.5, not the N²/C of any fixed cell count.
    # Measured on this corpus: N=200 → 2782 (N^1.5=2828), N=500 →
    # 11402 (N^1.5=11180) — the 2× bound leaves headroom for data
    # drift, and the growth-rate check pins the exponent.
    from pyspark.sql import functions as F

    from f1_realtime_data_pipeline_spark.sources.parquet import read_table

    embs = read_table(spark, sf_dir, "embeddings")
    costs = {}
    for n in (200, 500):
        out = sim.semdedup(embs.filter(F.col("vec_id") < n))
        costs[n] = (
            out.groupBy("cell")
            .count()
            .agg(F.sum(F.col("count") * F.col("count")))
            .collect()[0][0]
        )
        assert costs[n] <= 2 * n**1.5, f"N={n}: pair cost {costs[n]} not ~N^1.5"
    growth = costs[500] / costs[200]
    assert growth < (500 / 200) ** 2 * 0.8, f"pair cost growing quadratically: {growth}"


def test_semdedup_keeps_distinct_vectors(spark):
    vecs = [[0.0] * 64 for _ in range(17)]
    for i in range(16):
        vecs[i][i] = 1.0
    vecs[16][16] = 1.0  # orthogonal to everything
    out = sim.semdedup(_embs(spark, vecs), threshold=0.9).collect()
    assert all(r.keep for r in out)


# ---------------------------------------------------------------------------
# near-dup LSH plane scaling
# ---------------------------------------------------------------------------


def test_neardup_lsh_plane_count_scales_and_matches_oracle(spark):
    # The N-derived planes-per-table differs across scale factors
    # (floor 8 at the ~520-vector sf0.001 fixture, 10 at sf0.1's
    # ~2075) and the DuckDB twin built with the same count matches
    # the Spark detector pair-for-pair at BOTH — i.e. the occupancy
    # knob scales without breaking oracle-exactness.
    import duckdb

    from f1_realtime_data_pipeline_spark.functions.vector import neardup_planes_for
    from f1_realtime_data_pipeline_spark.plans.llm_star import (
        _EMBS_NEARDUP_SQL,
        _embs_neardup,
    )

    planes_seen = []
    for sf_dir in ("/root/testdata/sf0.001", "/root/testdata/sf0.1"):
        fixture = _embs_neardup(spark, sf_dir)
        planes = neardup_planes_for(fixture.count())
        planes_seen.append(planes)
        got = {
            (r.vec_a, r.vec_b, round(r.cosine, 9))
            for r in sim.cosine_neardup_lsh_pairs(fixture, threshold=0.9).collect()
        }
        con = duckdb.connect()
        con.execute(
            "CREATE VIEW embeddings AS SELECT * FROM "
            f"read_parquet('{sf_dir}/embeddings.parquet')"
        )
        sql = sim.cosine_neardup_lsh_pairs_sql(
            0.9, src=_EMBS_NEARDUP_SQL, planes_per_table=planes
        )
        want = {
            (a, b, round(c, 9)) for a, b, c in con.execute(sql).fetchall()
        }
        assert got == want, f"{sf_dir}: {len(got)} spark vs {len(want)} oracle pairs"
        assert got, f"{sf_dir}: planted copies must produce pairs"
    assert planes_seen[0] != planes_seen[1], (
        f"plane counts should differ across sf: {planes_seen}"
    )


# ---------------------------------------------------------------------------
# k-means
# ---------------------------------------------------------------------------


def test_kmeans_separates_two_blobs(spark):
    # Two tight blobs on orthogonal axes; seeds (ids 0 and 1) land one
    # in each blob, so one Lloyd iteration must classify every member
    # with its blob's seed.
    blob_a = [[1.0, 0.05 * i] + [0.0] * 62 for i in range(5)]
    blob_b = [[0.05 * i, 1.0] + [0.0] * 62 for i in range(5)]
    # interleave so seeds 0,1 are one from each blob
    vecs = [blob_a[0], blob_b[0]] + blob_a[1:] + blob_b[1:]
    out = sim.kmeans_assign(_embs(spark, vecs), n_clusters=2, iters=2).collect()
    cells = {r.vec_id: r.cell for r in out}
    a_ids = [0] + list(range(2, 6))
    b_ids = [1] + list(range(6, 10))
    assert len({cells[i] for i in a_ids}) == 1
    assert len({cells[i] for i in b_ids}) == 1
    assert cells[0] != cells[1]


def test_incremental_neardup_gate_checks_existing_only(spark, tmp_path):
    """r16 fuzzy admission: a batch doc duplicating an EXISTING doc is
    rejected (n_near_matches>=1, best_jaccard 1.0); a novel batch doc
    is admitted; and — the incremental property — a batch doc that
    duplicates only ANOTHER BATCH doc is still admitted (the gate
    probes the existing index, it never pairs batch x batch).
    Split buckets: ids 0/1/2 -> existing, 17/21/38 -> batch."""
    from f1_realtime_data_pipeline_spark.plans.llm_ext import (
        d_incremental_neardup,
    )

    texts = {
        0: "alpha beta gamma delta epsilon zeta eta theta",
        1: "one two three four five six seven eight",
        2: "one two three four five six seven eight",
        17: "alpha beta gamma delta epsilon zeta eta theta",
        21: "purple monkeys dishwasher quantum flute parade sings",
        38: "purple monkeys dishwasher quantum flute parade sings",
    }
    rows = [(i, t, "en", "s", len(t)) for i, t in texts.items()]
    spark.createDataFrame(
        rows,
        "doc_id bigint, text string, lang string, source string, "
        "n_chars bigint",
    ).toPandas().to_parquet(str(tmp_path / "documents.parquet"),
                            index=False)
    out = {r.doc_id: r
           for r in d_incremental_neardup(spark, str(tmp_path)).collect()}
    assert set(out) == {17, 21, 38}
    assert not out[17].admitted
    assert out[17].n_near_matches == 1
    assert out[17].best_jaccard == 1.0
    for i in (21, 38):  # novel / batch-internal dup: both admitted
        assert out[i].admitted
        assert out[i].n_near_matches == 0
        assert out[i].best_jaccard is None


def test_balanced_select_caps_cells_and_breaks_ties_by_id(spark):
    """r16 density equalization: (1) per cell the rank is dense
    1..cell_size and keep == rank <= cap, so kept = min(cap, size);
    (2) a cell of IDENTICAL vectors (all affinities equal) keeps the
    LOWEST vec_ids — the deterministic tie-break the skew axis
    relies on."""
    blob_a = [[1.0, 0.05 * i] + [0.0] * 62 for i in range(5)]
    blob_b = [[0.05 * i, 1.0] + [0.0] * 62 for i in range(5)]
    vecs = [blob_a[0], blob_b[0]] + blob_a[1:] + blob_b[1:]
    out = sim.balanced_select(
        _embs(spark, vecs), cap=2, n_clusters=2, iters=2
    ).collect()
    by_cell: dict = {}
    for r in out:
        by_cell.setdefault(r.cell, []).append(r)
    assert len(out) == 10 and len(by_cell) == 2
    for rows in by_cell.values():
        assert sorted(r.cell_rank for r in rows) == list(
            range(1, len(rows) + 1)
        )
        assert all(r.cell_size == len(rows) for r in rows)
        assert all(r.keep == (r.cell_rank <= 2) for r in rows)
        assert sum(r.keep for r in rows) == min(2, len(rows))

    # identical vectors: one cell, equal affinity, ties -> min ids kept
    same = [[1.0] + [0.0] * 63] * 6
    kept = sorted(
        r.vec_id
        for r in sim.balanced_select(
            _embs(spark, same), cap=3, n_clusters=1
        ).collect()
        if r.keep
    )
    assert kept == [0, 1, 2]


def test_balanced_select_rejects_bad_cap(spark):
    import pytest as _pt

    with _pt.raises(ValueError, match="cap"):
        sim.balanced_select(_embs(spark, [[1.0] * 64]), cap=0)


def test_kmeans_fixed_point_sums_are_partition_invariant(spark):
    # Same data, 1 vs 32 shuffle partitions -> bit-identical assignment
    # (the fixed-point decimal accumulation is order-free).
    vecs = [[float((i * 7 + j * 3) % 11) / 11.0 for j in range(64)] for i in range(40)]
    df = _embs(spark, vecs)
    a = sorted((r.vec_id, r.cell) for r in sim.kmeans_assign(df, 4, iters=1).collect())
    b = sorted(
        (r.vec_id, r.cell)
        for r in sim.kmeans_assign(df.repartition(32), 4, iters=1).collect()
    )
    assert a == b


# ---------------------------------------------------------------------------
# Gopher quality filter
# ---------------------------------------------------------------------------


def test_gopher_rules_fire_individually(spark):
    long_doc = (
        " ".join(f"word{i:03d}" for i in range(60)) + " the of"
    )  # 62 words, mwl 7, 2 stopwords, fully diverse — passes every rule
    short_doc = "tiny doc with the and of stop words"  # fails words_ok only-ish
    no_stop = " ".join(f"unique{i}" for i in range(60))  # fails stop_ok
    repetitive = "the " + " ".join(["spam"] * 60) + " of"  # fails rep/ttr
    df = _docs(spark, [long_doc, short_doc, no_stop, repetitive])
    assert "t_quality_gopher" in llm_ext.QUERIES
    out = {r.doc_id: r for r in _gopher_on(df).collect()}
    assert out[0].keep is True
    assert out[1].words_ok is False and out[1].keep is False
    assert out[2].stop_ok is False and out[2].keep is False
    assert out[3].rep_ok is False and out[3].ttr_ok is False and out[3].keep is False


def test_gopher_emits_keep_false_for_zero_token_docs(spark):
    # r7 (VERDICT r6 #4): a NULL-text doc must come OUT of the filter
    # with keep=false — not silently vanish via x/0 metrics + an inner
    # join against the exploded counts. The plan itself also unions
    # in-plan edge docs (-1 NULL, -2 ''), visible here too.
    df = _docs(spark, ["the of and a real document with twenty words " * 6])
    df = df.unionByName(
        spark.createDataFrame([(7, None)], "doc_id bigint, text string")
    )
    out = {r.doc_id: r for r in _gopher_on(df).collect()}
    assert 7 in out, "NULL-text doc was dropped instead of rejected"
    assert out[7].keep is False and out[7].n_words == 0
    assert out[7].mean_word_len is None and out[7].top_term_frac is None
    assert out[7].words_ok is False and out[7].mwl_ok is False
    # the corpus relation stays clean: exactly the input docs, no
    # phantom rows (r7 review — edge docs live in the dedicated probe)
    assert set(out) == {0, 7}
    edges = {
        r.doc_id: r for r in llm_ext.t_quality_gopher_edges(spark, None).collect()
    }
    assert edges[-1].keep is False and edges[-1].n_words == 0
    assert edges[-2].keep is False and edges[-2].n_words == 1
    assert edges[-3].keep is False and edges[-3].stop_ok is True


def _gopher_on(docs_df):
    """Run the Gopher filter plan over a literal docs frame (the
    registered query binds to parquet; the logic is identical)."""
    from unittest import mock

    from f1_realtime_data_pipeline_spark.plans import llm_ext as m

    with mock.patch.object(m, "_docs", lambda spark, sf_dir: docs_df):
        return m.t_quality_gopher(None, None)


# ---------------------------------------------------------------------------
# TF-IDF keywords + rare-token scoring
# ---------------------------------------------------------------------------


def test_tfidf_ranks_distinctive_term_first(spark, monkeypatch):
    # "zebra" appears 3x in doc0 and nowhere else; "shared" is in every
    # doc. The distinctive term must outrank the ubiquitous one.
    docs = _docs(
        spark,
        [
            "zebra zebra zebra shared filler one",
            "shared other words here",
            "shared more words there",
        ],
    )
    monkeypatch.setattr(llm_ext, "_docs", lambda spark, sf_dir: docs)
    out = llm_ext.t_tfidf_keywords(spark, "unused")
    top = {r.doc_id: r.term for r in out.collect() if r.rnk == 1}
    assert top[0] == "zebra"
    # rnk is dense per doc and capped
    per_doc = [r for r in out.collect() if r.doc_id == 0]
    assert sorted(r.rnk for r in per_doc) == list(range(1, len(per_doc) + 1))
    assert len(per_doc) <= llm_ext.TFIDF_TOP_K


def test_rare_tokens_scores_are_exact(spark, monkeypatch):
    # doc0: every token corpus-unique (hapax) -> sum_df = n_tokens,
    # commonness = 1/N, hapax_frac = 1. doc1/doc2 share all tokens ->
    # df=2 each, commonness = 2/N, hapax_frac = 0.
    docs = _docs(spark, ["aa bb cc", "dd ee", "dd ee"])
    monkeypatch.setattr(llm_ext, "_docs", lambda spark, sf_dir: docs)
    out = {r.doc_id: r for r in llm_ext.t_rare_tokens(spark, "unused").collect()}
    assert out[0].n_tokens == 3 and out[0].sum_df == 3 and out[0].n_hapax == 3
    assert out[0].commonness == 1.0 / 3.0 and out[0].hapax_frac == 1.0
    assert out[1].sum_df == 4 and out[1].n_hapax == 0
    assert out[1].commonness == 2.0 / 3.0 and out[1].hapax_frac == 0.0


# ---------------------------------------------------------------------------
# bloom decontamination
# ---------------------------------------------------------------------------


def test_bloom_contamination_is_superset_of_exact(spark, sf_dir):
    # A bloom filter can false-positive but NEVER false-negative:
    # per train doc, every exactly-contaminated shingle must be
    # flagged, so n_flagged >= n_contaminated with equal n_shingles —
    # and somewhere the corpus must show real contamination.
    from f1_realtime_data_pipeline_spark.sources.parquet import read_table

    docs = read_table(spark, sf_dir, "documents")
    exact = {r.doc_id: r for r in dd.contamination(docs, n=3).collect()}
    bloom = {r.doc_id: r for r in dd.contamination_bloom(docs, n=3).collect()}
    assert set(exact) == set(bloom)
    assert any(r.n_contaminated > 0 for r in exact.values())
    for doc_id, e in exact.items():
        b = bloom[doc_id]
        assert b.n_shingles == e.n_shingles
        assert b.n_flagged >= e.n_contaminated, f"false negative in doc {doc_id}"


# ---------------------------------------------------------------------------
# chunking + incremental dedup
# ---------------------------------------------------------------------------


def test_chunk_overlap_geometry(spark, monkeypatch):
    # 50 tokens, chunk=32, stride=24 -> starts 1, 25, 49: full chunk,
    # 26-token chunk, 2-token tail. Overlap region must repeat verbatim.
    words = [f"w{i:02d}" for i in range(50)]
    docs = _docs(spark, [" ".join(words)])
    monkeypatch.setattr(llm_ext, "_docs", lambda spark, sf_dir: docs)
    out = sorted(
        llm_ext.t_chunk_overlap(spark, "unused").collect(),
        key=lambda r: r.chunk_idx,
    )
    assert [(r.chunk_idx, r.chunk_start, r.n_chunk_tokens) for r in out] == [
        (1, 1, 32),
        (2, 25, 26),
        (3, 49, 2),
    ]
    assert out[0].chunk_text.split()[24:] == out[1].chunk_text.split()[:8]
    assert out[2].chunk_text == "w48 w49"


def test_incremental_dedup_flags_repeats(spark, monkeypatch):
    # pick doc_ids so the split hash puts exactly docs 4 and 13 in the
    # new batch (bucket >= 900); doc 4's text already exists in the
    # corpus, doc 13's does not.
    from f1_realtime_data_pipeline_spark.operators.dedup import (
        _SPLIT_BUCKETS,
        _SPLIT_MULT,
        _TEST_GE,
    )
    from pyspark.sql import Row

    batch_ids = [i for i in range(40) if (i * _SPLIT_MULT) % _SPLIT_BUCKETS >= _TEST_GE]
    assert len(batch_ids) >= 2
    dup_id, novel_id = batch_ids[0], batch_ids[1]
    existing_id = next(
        i for i in range(40) if (i * _SPLIT_MULT) % _SPLIT_BUCKETS < _TEST_GE
    )
    rows = [
        Row(doc_id=existing_id, text="shared corpus text"),
        Row(doc_id=dup_id, text="shared corpus text"),
        Row(doc_id=novel_id, text="genuinely new content"),
    ]
    docs = spark.createDataFrame(rows, "doc_id bigint, text string")
    monkeypatch.setattr(llm_ext, "_docs", lambda spark, sf_dir: docs)
    out = {r.doc_id: r.is_novel for r in llm_ext.d_incremental_dedup(spark, "unused").collect()}
    assert out == {dup_id: False, novel_id: True}


# ---------------------------------------------------------------------------
# span splice
# ---------------------------------------------------------------------------


def test_span_splice_removes_repeated_spans(spark):
    # doc1 repeats doc0's first 8-token span; the splice must remove it
    # from doc1 (first occurrence wins) and keep doc1's own tail.
    span = "alpha beta gamma delta epsilon zeta eta theta"
    docs = _docs(spark, [span + " tail0a tail0b", span + " own1a own1b"])
    out = {r.doc_id: r for r in dd.span_splice(docs, span_tokens=8).collect()}
    assert out[0].n_removed == 0
    assert out[0].clean_text == span + " tail0a tail0b"
    assert out[1].n_removed == 1
    assert out[1].clean_text == "own1a own1b"


def test_span_splice_fully_duplicated_doc_rebuilds_empty(spark):
    text = "one two three four five six seven eight"
    out = {r.doc_id: r for r in dd.span_splice(_docs(spark, [text, text]), span_tokens=8).collect()}
    assert out[0].clean_text == text
    assert out[1].clean_text == "" and out[1].n_removed == out[1].n_spans


# ---------------------------------------------------------------------------
# edit-distance fuzzy-dup verify
# ---------------------------------------------------------------------------


def test_editdist_separates_reorder_from_near_copy(spark, monkeypatch):
    # Both pairs are LSH candidates (same token bag / one-word delta),
    # but only the near-copy is a character-level duplicate: the
    # re-ordered doc shares every shingle-bag signal yet needs many
    # character edits, which is exactly what this stage detects.
    base = "the quick brown fox jumps over the lazy dog near the old river bank today"
    near = base.replace("today", "tonight")
    docs = _docs(spark, [base, near, " ".join(reversed(base.split()))])
    monkeypatch.setattr(llm_ext, "_docs", lambda spark, sf_dir: docs)
    out = {(r.doc_a, r.doc_b): r for r in llm_ext.d_editdist_neardup(spark, "x").collect()}
    assert (0, 1) in out and out[(0, 1)].is_fuzzy_dup
    for (a, b), r in out.items():
        if 2 in (a, b):
            assert not r.is_fuzzy_dup, f"re-ordered doc passed as fuzzy dup: {r}"


# ---------------------------------------------------------------------------
# training-shard export
# ---------------------------------------------------------------------------


def test_write_training_shards_roundtrip(spark, sf_dir, tmp_path):
    # the export materializes every doc exactly once, under its
    # deterministic shard, and a re-export replaces shard-for-shard
    from f1_realtime_data_pipeline_spark.sources.export import (
        shard_assign,
        write_training_shards,
    )
    from f1_realtime_data_pipeline_spark.sources.parquet import read_table

    docs = read_table(spark, sf_dir, "documents")
    out = str(tmp_path / "shards")
    write_training_shards(docs, out, n_shards=4)
    back = spark.read.parquet(out)
    assert back.count() == docs.count()
    assert back.select("shard").distinct().count() == 4
    expect = {r.doc_id: r.shard for r in shard_assign(docs, 4).collect()}
    got = {r.doc_id: r.shard for r in back.select("doc_id", "shard").collect()}
    assert got == expect
    # re-export is byte-stable at the row-set level
    write_training_shards(docs, out, n_shards=4)
    again = {r.doc_id: r.shard for r in spark.read.parquet(out).select("doc_id", "shard").collect()}
    assert again == expect


def test_pii_redact_semantics(spark, sf_dir):
    """r5 PII redaction: injected email/phone/IPv4 are all found and
    replaced with typed placeholders; nothing from the clean corpus
    text is touched; counts reflect the dirty text."""
    from f1_realtime_data_pipeline_spark.plans.llm_ext import t_pii_redact

    rows = {r.doc_id: r for r in t_pii_redact(spark, sf_dir).collect()}
    assert len(rows) > 0
    for doc_id, r in list(rows.items())[:50]:
        assert (r.n_email, r.n_phone, r.n_ip) == (1, 1, 1)
        assert "<EMAIL>" in r.redacted
        assert "<PHONE>" in r.redacted
        assert "<IP>" in r.redacted
        assert "@" not in r.redacted
        assert "+1-555" not in r.redacted
        assert r.redacted_len == len(r.redacted)
    # the redaction is surgical: stripping placeholders and scaffold
    # words leaves exactly the original clean text
    from f1_realtime_data_pipeline_spark.sources.parquet import read_table

    texts = {
        r.doc_id: r.text
        for r in read_table(spark, sf_dir, "documents").select("doc_id", "text").collect()
    }
    for doc_id in list(rows)[:20]:
        red = rows[doc_id].redacted
        assert red == f"<EMAIL> {texts[doc_id]} call <PHONE> from <IP>"


def test_interleave_sources_no_clumping(spark, sf_dir):
    """Semantics pin: positions are unique; while every source still
    has docs left, consecutive positions come from different sources
    (round-robin head); each source's positions are evenly strided."""
    from f1_realtime_data_pipeline_spark.plans.llm_ext import (
        t_interleave_sources,
    )

    rows = t_interleave_sources(spark, sf_dir).collect()
    pos = {r.train_pos: r.source for r in rows}
    assert len(pos) == len(rows)  # unique positions
    n_src = len({r.source for r in rows})
    per_src_min = min(
        sum(1 for r in rows if r.source == s) for s in {r.source for r in rows}
    )
    # the head of the order (all sources still alive) never repeats a
    # source within any n_src-wide stretch
    head = [pos[p] for p in sorted(pos) if p < per_src_min * n_src]
    for i in range(0, len(head) - n_src, n_src):
        assert len(set(head[i : i + n_src])) == n_src
    # per-source stride is exactly n_src in the alive region
    for s in {r.source for r in rows}:
        ps = sorted(p for p, src in pos.items() if src == s)[:per_src_min]
        assert all(b - a == n_src for a, b in zip(ps, ps[1:]))


def test_length_buckets_batch_invariants(spark, sf_dir):
    """Semantics pin: batch membership is within one length bucket,
    no batch exceeds the batch size, slots are 0..n-1 within a batch,
    and batch members' token counts differ by < bucket width."""
    from f1_realtime_data_pipeline_spark.plans.llm_ext import (
        LEN_BATCH_SIZE,
        LEN_BUCKET_WIDTH,
        t_length_buckets,
    )

    rows = t_length_buckets(spark, sf_dir).collect()
    from collections import defaultdict

    batches = defaultdict(list)
    for r in rows:
        batches[(r.len_bucket, r.batch_idx)].append(r)
    for (_, _), members in batches.items():
        assert len(members) <= LEN_BATCH_SIZE
        assert sorted(m.batch_slot for m in members) == list(range(len(members)))
        lens = [m.n_tokens for m in members]
        assert max(lens) - min(lens) < LEN_BUCKET_WIDTH
        assert len({m.len_bucket for m in members}) == 1


def test_split_hash_no_overflow_at_large_doc_id(spark, monkeypatch):
    # the deterministic split/shard/sample hash must stay inside int64
    # for any BIGINT doc_id: (d % B)*M is bounded by B*M < 2^63 while
    # the raw d*M form overflows at d >= ~3.5e9 (DuckDB raises,
    # non-ANSI Spark silently wraps — divergent split assignment)
    import duckdb

    from pyspark.sql import Row

    from f1_realtime_data_pipeline_spark.plans import llm_star as ls

    big = 4_000_000_000
    df = spark.createDataFrame(
        [Row(doc_id=big, text="alpha beta", lang="en", source="s", n_chars=10)],
        "doc_id bigint, text string, lang string, source string, n_chars bigint",
    )
    monkeypatch.setattr(ls, "_docs", lambda s, d: df)
    (r,) = ls.t_train_split(spark, "/root/testdata/sf0.001").collect()
    expected_bucket = ((big % ls._SPLIT_BUCKETS) * ls._SPLIT_MULT) % ls._SPLIT_BUCKETS
    assert r.bucket == expected_bucket
    # DuckDB computes the identical reduced form without overflow
    got = (
        duckdb.connect()
        .execute(
            f"SELECT (({big} % {ls._SPLIT_BUCKETS}) * {ls._SPLIT_MULT})"
            f" % {ls._SPLIT_BUCKETS}"
        )
        .fetchone()[0]
    )
    assert got == expected_bucket


def test_pinned_knn_join_baseline_matches_its_oracle(spark):
    # r7: e_knn_join (pinned 6-plane) was demoted from the registry to
    # a fixed-parameter BASELINE (its candidate volume grows with N by
    # construction; the registered form is e_knn_join_derived). Demoted
    # does not mean unchecked: the pinned plan must still match its
    # DuckDB twin pair-for-pair — this is the parity row the driver
    # used to provide.
    import duckdb

    from f1_realtime_data_pipeline_spark.plans.llm_star import (
        E_KNN_JOIN_PINNED_SQL,
        e_knn_join,
    )

    sf_dir = "/root/testdata/sf0.001"
    got = {
        (r.query_id, r.neighbor_id, r.rnk, round(r.cosine, 9))
        for r in e_knn_join(spark, sf_dir).collect()
    }
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW embeddings AS SELECT * FROM "
        f"read_parquet('{sf_dir}/embeddings.parquet')"
    )
    want = {
        (q, n, k, round(c, 9))
        for q, n, k, c in con.execute(E_KNN_JOIN_PINNED_SQL).fetchall()
    }
    assert got == want
    assert got, "baseline join produced no pairs"


def test_pipeline_corpus_equals_recomposed_stages(spark):
    # r7 review: the fused pipeline and its standalone stages must
    # stay value-equivalent — the Spark side now shares one builder
    # per stage (normalize_text / quality_score_from_counts), and this
    # test guards the SQL twins the same way by recomposing
    # pipeline_corpus from the REGISTERED stage queries and comparing
    # at sf0.001. Any one-sided edit to a stage rule (length band,
    # character class, split constant) breaks this equality.
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    from f1_realtime_data_pipeline_spark.operators.dedup import (
        _TRAIN_LT,
        split_bucket,
    )
    from f1_realtime_data_pipeline_spark.plans import llm_star as ls
    from f1_realtime_data_pipeline_spark.plans.llm_star import (
        _PIPE_MIN_QUALITY,
        _VAL_LT,
    )

    sf = "/root/testdata/sf0.001"
    docs = spark.read.parquet(f"{sf}/documents.parquet").select(
        "doc_id", "source"
    )
    normed = ls.t_normalize(spark, sf).select("doc_id", "norm_text")
    quality = ls.t_quality(spark, sf).select("doc_id", "n_tokens", "quality_score")

    w = Window.partitionBy("norm_text").orderBy(F.col("doc_id").asc())
    canon = (
        docs.join(normed, "doc_id")
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
    )
    bucket = split_bucket()
    split = (
        F.when(bucket < _TRAIN_LT, "train")
        .when(bucket < _VAL_LT, "val")
        .otherwise("test")
    )
    recomposed = {
        (r.split, r.source): (r.n_docs, r.n_tokens)
        for r in canon.join(quality, "doc_id")
        .filter(F.col("quality_score") >= _PIPE_MIN_QUALITY)
        .withColumn("split", split)
        .groupBy("split", "source")
        .agg(
            F.count("*").cast("bigint").alias("n_docs"),
            F.sum("n_tokens").cast("bigint").alias("n_tokens"),
        )
        .collect()
    }
    fused = {
        (r.split, r.source): (r.n_docs, r.n_tokens)
        for r in ls.pipeline_corpus(spark, sf).collect()
    }
    assert fused == recomposed
    assert fused, "pipeline produced no groups"


def test_ascii_fold_is_engine_portable_where_lower_is_not(spark):
    # r9 unicode sweep: Spark lower() applies full Unicode casing
    # ('İ' -> 'i' + U+0307, trailing 'Σ' -> final 'ς') while DuckDB
    # lower() applies the simple per-codepoint map — 18 of 58
    # text/dedup oracles flipped on a unicode corpus. The tokenizer
    # contract folds ASCII only (translate), identical in both
    # engines; pin both halves so a contract edit or engine upgrade
    # that reintroduces engine lower() fails here.
    import duckdb
    import pyspark.sql.functions as F

    from f1_realtime_data_pipeline_spark.functions.text import (
        ascii_lower,
        ascii_lower_sql,
    )

    hazards = ["İstanbul DİYARBAKIR", "ΣΊΣΥΦΟΣ τέλος", "STRASSE ẞ", "Ǆungla"]
    df = spark.createDataFrame([(h,) for h in hazards], "t string")
    sp_fold = [r.f for r in df.select(ascii_lower("t").alias("f")).collect()]
    sp_lower = [r.f for r in df.select(F.lower("t").alias("f")).collect()]
    con = duckdb.connect()
    for h, fold, low in zip(hazards, sp_fold, sp_lower):
        d_fold, d_low = con.execute(
            f"SELECT {ascii_lower_sql('?')}, lower(?)", [h, h]
        ).fetchone()
        assert fold == d_fold, f"ascii fold diverged on {h!r}"
        if h.startswith(("İ", "Σ")):
            assert low != d_low, (
                f"engine lower() now agrees on {h!r} — the ASCII-fold "
                "contract rationale should be revisited"
            )
    # the fold equals engine lower() on pure-ASCII input (the
    # fixture-regime identity that made the contract migration
    # value-neutral across all 174 registered oracles)
    ascii_df = spark.createDataFrame([("Hello WORLD 123",)], "t string")
    row = ascii_df.select(
        ascii_lower("t").alias("f"), F.lower("t").alias("l")
    ).collect()[0]
    assert row.f == row.l == "hello world 123"


def test_levenshtein_is_codepoint_based(spark):
    # d_editdist_neardup's engine contract: Spark levenshtein counts
    # CODEPOINTS — one CJK substitution costs 1, not its 3 UTF-8
    # bytes. DuckDB's levenshtein is byte-based, so the DuckDB oracle
    # twin verifies the ASCII regime where both definitions coincide
    # (tools/robustness_fixtures.py documents the domain). Pin the
    # Spark semantics so an engine upgrade changing them is caught.
    import duckdb
    import pyspark.sql.functions as F

    df = spark.createDataFrame([("日本語", "日本x")], "a string, b string")
    assert df.select(F.levenshtein("a", "b").alias("d")).collect()[0].d == 1
    byte_based = duckdb.connect().execute(
        "SELECT levenshtein('日本語', '日本x')"
    ).fetchone()[0]
    assert byte_based == 3  # the documented divergence this domain note rests on


def test_editdist_unicode_bijection_preserves_distance(spark):
    # d_editdist_unicode's core identity (r11, VERDICT r10 #3): an
    # injective per-character substitution (ASCII vowels → precomposed
    # accents) leaves Levenshtein distance invariant, so Spark's
    # codepoint levenshtein over the genuinely MULTIBYTE images must
    # equal the plain distance over the ASCII bases. A byte-based
    # engine would charge 2 per vowel↔consonant edit and fail this.
    import pyspark.sql.functions as F

    from f1_realtime_data_pipeline_spark.plans.llm_ext import (
        _VOWELS_ACCENT,
        _VOWELS_ASCII,
    )

    def py_lev(a: str, b: str) -> int:
        prev = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            cur = [i]
            for j, cb in enumerate(b, 1):
                cur.append(
                    min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb))
                )
            prev = cur
        return prev[-1]

    pairs = [
        ("kitten", "sitting"),
        ("a quick brown fox", "a quick brown ox jumped"),
        ("aeiou", "uoiea"),
        ("same text", "same text"),
        ("", "vowels only aeiou"),
        ("anagram", "margana"),
    ]
    df = spark.createDataFrame(pairs, "a string, b string")
    ua = F.translate("a", _VOWELS_ASCII, _VOWELS_ACCENT)
    ub = F.translate("b", _VOWELS_ASCII, _VOWELS_ACCENT)
    got = df.select(
        F.levenshtein(ua, ub).alias("lev_cp"),
        # prove the inputs really were multibyte where vowels exist
        (F.octet_length(ua) - F.length(ua)).alias("extra_bytes"),
        (F.length(F.translate("a", _VOWELS_ASCII, ""))).alias("novowel_len"),
        F.length("a").alias("a_len"),
    ).collect()
    for (a, b), row in zip(pairs, got):
        assert row.lev_cp == py_lev(a, b), (a, b)
        assert row.extra_bytes == row.a_len - row.novowel_len  # one per vowel


# ---------------------------------------------------------------------------
# chi-squared drift: zero-observed cells
# ---------------------------------------------------------------------------


def test_chi2_drift_zero_cell_contributes_expected(spark, tmp_path):
    # ADVICE r13: a source with ZERO docs in a corpus-populated bucket
    # is the strongest drift signal — that cell must contribute its
    # expected count ((0-e)^2/e = e), not silently drop out of the sum.
    # Two disjoint sources (a: all bucket 0, b: all bucket 1) make
    # every expected count e = 10*10/20 = 5, so each source's chi2 is
    # 5 (observed cell) + 5 (its ZERO cell) = 10 → 10_000_000 micro;
    # the pre-fix observed-cells-only sum read 5_000_000.
    rows = [(i, "x", "en", "a", 100) for i in range(10)] + [
        (100 + i, "x", "en", "b", 600) for i in range(10)
    ]
    schema = (
        "doc_id bigint, text string, lang string, source string, "
        "n_chars bigint"
    )
    spark.createDataFrame(rows, schema).write.parquet(
        str(tmp_path / "documents.parquet")
    )
    out = {
        r.source: r
        for r in llm_ext.t_chi2_drift(spark, str(tmp_path)).collect()
    }
    assert set(out) == {"a", "b"}
    for s in ("a", "b"):
        assert out[s].n_docs == 10
        assert out[s].dof == 1
        assert out[s].chi2_micro == 10_000_000
