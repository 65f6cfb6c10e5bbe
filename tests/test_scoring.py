"""Model-based scoring (plans/scoring_ext.py).

scoring_ext registered in r15; this file stays its pytest-side
oracle gate, including the degenerate shapes (NULL text, empty
string, token ties) the harness corpus cannot witness.
"""

from __future__ import annotations

import duckdb
import pandas as pd
import pytest

from f1_realtime_data_pipeline_spark.plans import scoring_ext as sx


def _compare(sdf: pd.DataFrame, odf: pd.DataFrame) -> None:
    assert sorted(sdf.columns) == sorted(odf.columns)
    assert len(sdf) == len(odf)
    cols = sorted(sdf.columns)
    s = sdf.reindex(cols, axis=1).sort_values(by=cols, na_position="last").reset_index(drop=True)
    o = odf.reindex(cols, axis=1).sort_values(by=cols, na_position="last").reset_index(drop=True)
    pd.testing.assert_frame_equal(s, o, check_dtype=False)


def _docs_con(path: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{path}')"
    )
    return con


@pytest.mark.parametrize("name", ["t_classifier_scores", "t_classifier_dist"])
def test_scoring_oracle_parity(spark, sf_dir, name):
    sdf = sx.QUERIES[name](spark, sf_dir).toPandas()
    odf = _docs_con(f"{sf_dir}/documents.parquet").execute(
        sx.ORACLE[name]
    ).fetchdf()
    _compare(sdf, odf)


@pytest.fixture()
def edge_docs(spark, tmp_path):
    """NULL text (dead extractor), empty string, whitespace-only, and
    two normal docs sharing a source — the shapes the sf fixtures
    don't carry."""
    rows = [
        (0, None, "en", "a", None),
        (1, "", "en", "a", 0),
        (2, "   ", "en", "b", 3),
        (3, "the quick brown fox", "en", "b", 19),
        (4, "the quick brown fox", "en", "b", 19),
    ]
    df = spark.createDataFrame(
        rows, "doc_id bigint, text string, lang string, source string, n_chars bigint"
    )
    path = str(tmp_path / "documents.parquet")
    df.toPandas().to_parquet(path, index=False)
    return path


@pytest.mark.parametrize("name", ["t_classifier_scores", "t_classifier_dist"])
def test_scoring_edge_parity(spark, edge_docs, tmp_path, name):
    # both engines over the SAME degenerate parquet
    sdf = sx.QUERIES[name](spark, str(tmp_path)).toPandas()
    odf = _docs_con(edge_docs).execute(sx.ORACLE[name]).fetchdf()
    _compare(sdf, odf)


def test_scoring_classify_never_drop_contracts(spark, tmp_path, edge_docs):
    per = sx.t_classifier_scores(spark, str(tmp_path)).toPandas()
    by_id = per.set_index("doc_id")
    # NULL text: classified as unscored — present, pred NULL, 0 tokens
    assert len(per) == 5
    assert by_id.loc[0, "n_toks"] == 0
    assert pd.isna(by_id.loc[0, "pred_class"])
    assert pd.isna(by_id.loc[0, "margin"])
    # '' tokenizes to one boundary-empty token (pinned contract)
    assert by_id.loc[1, "n_toks"] == 1
    assert by_id.loc[1, "pred_class"] in range(sx.N_CLASSES)
    # identical texts score identically (the model is a pure function)
    assert by_id.loc[3, "score"] == by_id.loc[4, "score"]
    assert by_id.loc[3, "pred_class"] == by_id.loc[4, "pred_class"]
    # margins are never negative (winner minus runner-up)
    scored = per[per["margin"].notna()]
    assert (scored["margin"] >= 0).all()


def test_scoring_dist_accounts_every_doc(spark, sf_dir):
    per = sx.t_classifier_scores(spark, sf_dir).toPandas()
    dist = sx.t_classifier_dist(spark, sf_dir).toPandas()
    assert dist["n_docs"].sum() == len(per)
    assert dist["n_toks"].sum() == per["n_toks"].sum()


@pytest.fixture()
def bm25_docs(spark, tmp_path):
    rows = [
        (0, "stream stream stream x", "en", "a", 22),
        (1, "stream y", "en", "a", 8),
        (2, "z z z z z z z z", "en", "b", 15),
        (3, None, "en", "b", None),
    ]
    df = spark.createDataFrame(
        rows, "doc_id bigint, text string, lang string, source string, n_chars bigint"
    )
    path = str(tmp_path / "documents.parquet")
    df.toPandas().to_parquet(path, index=False)
    return path


def test_bm25_hand_computed(spark, tmp_path, bm25_docs):
    got = {r.doc_id: r for r in sx.t_bm25_topk(spark, str(tmp_path)).collect()}
    # expected values from the documented integer formula (python //
    # mirrors both engines' non-negative integer division)
    N, S = 3, 14  # doc 3 has no tokens; dl = 4, 2, 8
    df_stream = 2
    idf_ppk = ((N - df_stream + 1) * 1000) // (df_stream + 1)

    def sat(tf, dl):
        return (44 * tf * S * 1_000_000) // (20 * S * tf + 6 * S + 18 * dl * N)

    # only the two stream-matching docs are retrieved; the NULL doc
    # and the no-hit doc never appear
    assert set(got) == {0, 1}
    assert got[0].score == idf_ppk * sat(3, 4)
    assert got[1].score == idf_ppk * sat(1, 2)
    assert got[0].n_terms_hit == got[1].n_terms_hit == 1
    # saturation + length normalization rank the tf=3 doc first
    assert got[0].score > got[1].score
    # oracle agrees on the same degenerate parquet
    import duckdb as _d
    con = _d.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{bm25_docs}')"
    )
    odf = con.execute(sx.ORACLE["t_bm25_topk"]).fetchdf()
    sdf = sx.t_bm25_topk(spark, str(tmp_path)).toPandas()
    _compare(sdf, odf)


def test_bm25_postings_matches_topk_form(spark, tmp_path, bm25_docs, sf_dir):
    # the index+probe form and the one-pass form are the SAME ranking
    # function — identical arithmetic, identical output — on both the
    # hand-computed degenerate corpus and the real fixture
    for d in (str(tmp_path), sf_dir):
        a = sorted(
            sx.t_bm25_topk(spark, d).collect(),
            key=lambda r: (-r.score, r.doc_id),
        )
        b = sorted(
            sx.t_bm25_postings(spark, d).collect(),
            key=lambda r: (-r.score, r.doc_id),
        )
        assert [tuple(r) for r in a] == [tuple(r) for r in b]


def test_soft_dedup_weights_contracts(spark, tmp_path):
    # copies share mass: weight_ppm = 1e6 DIV n_copies; NULL texts
    # form ONE group (the d_exact classification contract)
    rows = [
        (0, "same text", "en", "a", 9),
        (1, "same text", "en", "a", 9),
        (2, "same text", "en", "b", 9),
        (3, "unique", "en", "b", 6),
        (4, None, "en", "b", None),
        (5, None, "en", "a", None),
    ]
    df = spark.createDataFrame(
        rows, "doc_id bigint, text string, lang string, source string, n_chars bigint"
    )
    df.toPandas().to_parquet(str(tmp_path / "documents.parquet"), index=False)
    got = {
        r.doc_id: (r.n_copies, r.weight_ppm)
        for r in sx.t_soft_dedup_weights(spark, str(tmp_path)).collect()
    }
    assert got == {
        0: (3, 333333),
        1: (3, 333333),
        2: (3, 333333),
        3: (1, 1000000),
        4: (2, 500000),
        5: (2, 500000),
    }
    # mass conservation within a group: n_copies * weight ≈ 1e6
    # (truncation loses < n_copies ppm, never gains)
    for n, w in got.values():
        assert 1_000_000 - n < n * w <= 1_000_000


def test_decay_curve_monotone_and_consistent(spark, sf_dir):
    curve = sx.w_decay_curve(spark, sf_dir).toPandas().set_index("event_type")
    pop = (
        sx.w_decay_popularity(spark, sf_dir).toPandas().set_index("event_type")
    )
    # the H=7 column IS w_decay_popularity's decayed mass (same
    # arithmetic, one pass vs the registered single-H query)
    assert (curve["decayed_h7"] == pop["decayed_micro"]).all()
    # longer half-life keeps more mass (fixture values non-negative)
    assert (curve["decayed_h1"] <= curve["decayed_h7"]).all()
    assert (curve["decayed_h7"] <= curve["decayed_h30"]).all()


# ---------------------------------------------------------------------------
# RRF hybrid fusion (r16)
# ---------------------------------------------------------------------------


def test_rrf_fusion_oracle_parity_and_contracts(spark, sf_dir):
    con = duckdb.connect()
    for t in ("documents", "embeddings"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * "
            f"FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    sdf = sx.QUERIES["t_rrf_fusion"](spark, sf_dir).toPandas()
    odf = con.execute(sx.ORACLE["t_rrf_fusion"]).fetchdf()
    _compare(sdf, odf)
    assert len(sdf) == sx.RRF_TOPK
    # every fused score decomposes into the two lists' integer
    # contributions: recompute from the rank columns
    import numpy as np

    def contrib(rank):
        return np.where(
            rank.isna(), 0, 1_000_000_000 // (sx.RRF_K + rank.fillna(1))
        ).astype("int64")

    want = contrib(sdf["lex_rank"]) + contrib(sdf["sem_rank"])
    assert (sdf["rrf_ppb"].to_numpy() == want).all()
    # a doc present in BOTH lists outranks the same ranks alone;
    # scores are sorted desc with doc_id tie-break
    assert list(sdf["rrf_ppb"]) == sorted(sdf["rrf_ppb"], reverse=True)


def test_pareto_select_dominance_semantics(spark, tmp_path):
    """Hand-built frontier: equal (len, quality) pairs both survive
    (mutually non-dominating); a strictly-shorter doc with EQUAL
    quality dominates a longer one; higher-quality-at-same-length
    dominates; unscored (NULL text) docs are excluded."""
    rows = [
        (0, "aa bb", "en", "a", 5),            # 2 tokens
        (1, "aa bb", "en", "a", 5),            # duplicate: same (t, q)
        (2, "aa bb cc", "en", "a", 8),         # 3 tokens
        (3, None, "en", "a", None),            # unscored
    ]
    spark.createDataFrame(
        rows,
        "doc_id bigint, text string, lang string, source string, "
        "n_chars bigint",
    ).toPandas().to_parquet(str(tmp_path / "documents.parquet"), index=False)
    out = sx.t_pareto_select(spark, str(tmp_path)).toPandas()
    got = {int(r.doc_id): (int(r.n_toks), int(r.quality))
           for r in out.itertuples()}
    # docs 0 and 1 are identical → both on the frontier (if either is)
    assert (0 in got) == (1 in got)
    assert 3 not in got  # unscored excluded
    # doc 2 survives iff its quality strictly beats the 2-token max
    q2 = {r.doc_id: r for r in out.itertuples() if r.doc_id == 2}
    if 0 in got and 2 in got:
        assert got[2][1] > got[0][1]
    # oracle parity on the same fixture
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{tmp_path}/documents.parquet')"
    )
    odf = con.execute(sx.ORACLE["t_pareto_select"]).fetchdf()
    _compare(out, odf)
