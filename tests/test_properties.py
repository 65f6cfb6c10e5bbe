"""Property-based tests (hypothesis) for the determinism contracts the
oracle depends on. Each property runs few examples (a Spark job per
example) but generates adversarial shapes a hand-written fixture
wouldn't — duplicate keys, empty inputs, boundary decimals, unicode.
"""

from __future__ import annotations

from hypothesis import given, settings, strategies as st

from pyspark.sql import Row
from pyspark.sql import functions as F

from f1_realtime_data_pipeline_spark.functions.text import token_count
from f1_realtime_data_pipeline_spark.operators.aggregations import cents
from f1_realtime_data_pipeline_spark.operators.joins import salted_join
from f1_realtime_data_pipeline_spark.sources.tables import upsert_last_wins

_SETTINGS = dict(max_examples=5, deadline=None)

_key = st.integers(min_value=0, max_value=9)
_val = st.text(alphabet="abcxyz", min_size=1, max_size=4)


@settings(**_SETTINGS)
@given(
    base=st.lists(st.tuples(_key, _val), max_size=12, unique_by=lambda t: t[0]),
    updates=st.lists(st.tuples(_key, _val), max_size=12, unique_by=lambda t: t[0]),
)
def test_upsert_is_dict_merge(spark_prop, base, updates):
    schema = "k bigint, v string"
    b = spark_prop.createDataFrame([Row(k=k, v=v) for k, v in base], schema)
    u = spark_prop.createDataFrame([Row(k=k, v=v) for k, v in updates], schema)
    got = {r.k: r.v for r in upsert_last_wins(b, u, ["k"]).collect()}
    assert got == {**dict(base), **dict(updates)}


@settings(**_SETTINGS)
@given(
    vals=st.lists(
        st.decimals(
            min_value=-10**6, max_value=10**6, places=2, allow_nan=False
        ),
        min_size=1,
        max_size=20,
    )
)
def test_cents_exact_on_two_decimal_values(spark_prop, vals):
    # every 2-decimal value scales to its exact integer cents through
    # the double round-trip (the oracle-exact money contract)
    df = spark_prop.createDataFrame([Row(x=float(v)) for v in vals], "x double")
    got = [r.c for r in df.select(cents("x").alias("c")).collect()]
    assert got == [int(v * 100) for v in vals]


@settings(**_SETTINGS)
@given(
    left=st.lists(st.tuples(_key, st.integers(0, 100)), max_size=15),
    right=st.lists(st.tuples(_key, _val), max_size=10, unique_by=lambda t: t[0]),
)
def test_salted_join_equals_plain_join(spark_prop, left, right):
    l = spark_prop.createDataFrame(
        [Row(k=k, n=n) for k, n in left], "k bigint, n bigint"
    )
    r = spark_prop.createDataFrame(
        [Row(k=k, v=v) for k, v in right], "k bigint, v string"
    )
    salted = {(t.k, t.n, t.v) for t in salted_join(l, r, "k", salt=4).collect()}
    plain = {(t.k, t.n, t.v) for t in l.join(r, "k").collect()}
    assert salted == plain


@settings(**_SETTINGS)
@given(
    texts=st.lists(
        st.text(alphabet=st.characters(codec="utf-8", exclude_categories=("Cs",)),
                min_size=1, max_size=30),
        min_size=1,
        max_size=10,
    )
)
def test_token_count_matches_python_split(spark_prop, texts):
    # the tokenizer contract: count == split on the engine-portable
    # explicit whitespace class (bare \s differs between Java, RE2,
    # and Python at the edges — \x0B, \x1c-\x1f)
    import re

    df = spark_prop.createDataFrame([Row(t=t) for t in texts], "t string")
    got = [r.n for r in df.select(token_count("t").alias("n")).collect()]
    expected = [len(re.split(r"[ \t\n\x0B\f\r]+", t.lower())) for t in texts]
    assert got == expected


_word = st.sampled_from(["aa", "bb", "cc", "dd"])
_doc = st.lists(_word, min_size=0, max_size=20).map(" ".join)


@settings(**_SETTINGS)
@given(texts=st.lists(_doc, min_size=1, max_size=8))
def test_span_dedup_invariants(spark_prop, texts):
    """Model check: (1) every distinct span text has exactly one
    keep=true row; (2) that row is the lexicographically-first
    (doc_id, span_pos) occurrence; (3) spans reconstruct each doc's
    token stream exactly."""
    from f1_realtime_data_pipeline_spark.operators.dedup import span_dedup

    rows = [Row(doc_id=i, text=t) for i, t in enumerate(texts)]
    df = spark_prop.createDataFrame(rows, "doc_id bigint, text string")
    out = span_dedup(df).collect()

    # python model
    def py_tokens(t):
        import re
        return [w for w in re.split(r"[ \t\n\x0B\f\r]+", t.lower())]

    model = {}
    for i, t in enumerate(texts):
        toks = py_tokens(t)
        for p in range((len(toks) + 7) // 8):
            span = " ".join(toks[p * 8 : p * 8 + 8])
            model.setdefault(span, []).append((i, p))

    got_all = {}
    kept = {}
    for r in out:
        got_all.setdefault(r.span, []).append((r.doc_id, r.span_pos))
        if r.keep:
            assert r.span not in kept, f"two keeps for span {r.span!r}"
            kept[r.span] = (r.doc_id, r.span_pos)
    assert {s: sorted(v) for s, v in got_all.items()} == {
        s: sorted(v) for s, v in model.items()
    }
    for span, occs in model.items():
        assert kept[span] == min(occs)


@settings(max_examples=4, deadline=None)
@given(
    rows=st.lists(
        st.tuples(_key, st.integers(min_value=-50, max_value=50)),
        min_size=1,
        max_size=14,
    ),
    cuts=st.lists(st.integers(min_value=0, max_value=14), max_size=3),
)
def test_agg_sink_epoch_partition_invariant(spark_prop, tmp_path_factory, rows, cuts):
    """The materialized view's merge is associative: ANY partition of
    the same rows into micro-batches (including empty ones) commits
    the identical per-key totals the one-shot batch aggregate gives —
    the property that makes incremental maintenance trustworthy."""
    from f1_realtime_data_pipeline_spark.streaming.sinks import (
        read_sink_snapshot,
        transactional_agg_sink,
    )

    spark = spark_prop
    sink = str(tmp_path_factory.mktemp("aggprop") / "view")
    bounds = sorted({min(c, len(rows)) for c in cuts} | {0, len(rows)})
    write = transactional_agg_sink(sink, group_cols=["k"], sum_cols=["v"])
    for ep, (lo, hi) in enumerate(zip(bounds, bounds[1:] + [len(rows)])):
        chunk = rows[lo:hi]
        write(
            spark.createDataFrame(chunk, "k long, v long")
            if chunk
            else spark.createDataFrame([], "k long, v long"),
            ep,
        )
    got = {
        r.k: (r.v, r.n_rows) for r in read_sink_snapshot(spark, sink).collect()
    }
    want: dict = {}
    for k, v in rows:
        s, n = want.get(k, (0, 0))
        want[k] = (s + v, n + 1)
    assert got == want


@given(
    w=st.integers(min_value=1, max_value=40),
    h=st.integers(min_value=1, max_value=40),
    doc_id=st.integers(min_value=0, max_value=10**9),
)
@settings(max_examples=200, deadline=None)
def test_bmp_ahash_roundtrip_matches_arithmetic(w, h, doc_id):
    """encode→decode recovers exactly the oracle's arithmetic for any
    dims (incl. every stride-padding class w%4) and id phase —
    pure-Python twin of the m_image_ahash formula contract."""
    from f1_realtime_data_pipeline_spark.operators import multimodal as mm

    payload = mm.encode_bmp_gray(w, h, doc_id)
    dw, dh, mean, ahash = mm.decode_bmp_ahash(payload)
    assert (dw, dh) == (w, h)
    lum = [mm.gray_lum_for(doc_id, x, y) for y in range(h) for x in range(w)]
    assert mean == sum(lum) // (w * h)
    exp = 0
    for y in range(h):
        for x in range(w):
            if mm.gray_lum_for(doc_id, x, y) > mean:
                exp |= 1 << ((y * w + x) % 63)
    assert ahash == exp


# ---------------------------------------------------------------------------
# r14 staged-operator arithmetic contracts vs pure-python references
# ---------------------------------------------------------------------------

_edge = st.tuples(
    st.integers(min_value=0, max_value=6), st.integers(min_value=0, max_value=6)
)


def _pagerank_ref(
    edges, iters, scale=10**9, d_pct=85, redistribute=False, seeds=None
):
    """Pure-python mirror of operators.graph.pagerank's integer
    arithmetic (out-degree counts edge rows; dangling mass dropped by
    default, split equally across all nodes when ``redistribute``;
    ``seeds`` restricts initial mass AND the per-round base term to
    the seed set — personalized PageRank)."""
    from collections import Counter, defaultdict

    nodes = {n for e in edges for n in e}
    deg = Counter(s for s, _ in edges)
    base = (100 - d_pct) * scale // 100
    is_seed = (lambda n: n in seeds) if seeds is not None else (lambda n: True)
    r = {n: scale * is_seed(n) for n in nodes}
    for _ in range(iters):
        inflow = defaultdict(int)
        for s, t in edges:
            inflow[t] += r[s] // deg[s]
        share = 0
        if redistribute and nodes:
            share = sum(r[n] for n in nodes if deg[n] == 0) // len(nodes)
        r = {
            n: is_seed(n) * base
            + (d_pct * (inflow.get(n, 0) + share)) // 100
            for n in nodes
        }
    return r


@settings(**_SETTINGS)
@given(
    edges=st.lists(_edge, min_size=1, max_size=15),
    iters=st.integers(min_value=0, max_value=3),
    redistribute=st.booleans(),
    seed_pick=st.one_of(st.none(), st.sets(st.integers(0, 6), max_size=4)),
)
def test_pagerank_matches_reference_on_random_graphs(
    spark_prop, edges, iters, redistribute, seed_pick
):
    # self-loops, multi-edges, dangling nodes, disconnected parts,
    # seed sets that may be empty or miss the graph entirely —
    # whatever hypothesis draws, the distributed fixed-point loop must
    # equal the sequential reference EXACTLY (integer arithmetic has
    # no tolerance band), in all dangling/personalization variants
    from f1_realtime_data_pipeline_spark.operators.graph import pagerank

    df = spark_prop.createDataFrame(edges, "src bigint, dst bigint")
    seeds_df = (
        spark_prop.createDataFrame(
            [(s,) for s in sorted(seed_pick)], "node bigint"
        )
        if seed_pick is not None
        else None
    )
    got = {
        r.node: r.rank
        for r in pagerank(
            df,
            iters=iters,
            redistribute_dangling=redistribute,
            seeds=seeds_df,
        ).collect()
    }
    assert got == _pagerank_ref(
        edges, iters, redistribute=redistribute, seeds=seed_pick
    )


@settings(**_SETTINGS)
@given(
    vals=st.lists(
        st.tuples(
            st.integers(min_value=-(10**9), max_value=10**9),
            st.integers(min_value=0, max_value=62),
        ),
        min_size=1,
        max_size=20,
    )
)
def test_decay_shift_is_floor_division_both_engines(spark_prop, vals):
    # the w_decay_popularity contract: arithmetic right shift ==
    # floor division by 2^h, identically in Spark SQL, DuckDB, and
    # python — including negative masses
    import duckdb

    df = spark_prop.createDataFrame(vals, "v bigint, h int")
    got = [
        r.s
        for r in df.select(F.expr("shiftright(v, h)").alias("s"))
        .orderBy("s")
        .collect()
    ]
    con = duckdb.connect()
    con.execute("CREATE TABLE t(v BIGINT, h INT)")
    con.executemany("INSERT INTO t VALUES (?, ?)", vals)
    duck = sorted(x[0] for x in con.execute("SELECT v >> h FROM t").fetchall())
    ref = sorted(v // (1 << h) for v, h in vals)
    assert got == duck == ref


def _hits_ref(edges, iters, scale=10**6):
    """Pure-python mirror of operators.graph.hits's integer
    arithmetic: raw side sums over edge ROWS (multi-edges weight),
    L∞ normalization ``raw * scale // max(raw)`` per half-round,
    full-outer zeros for nodes missing a side."""
    from collections import defaultdict

    srcs = {s for s, _ in edges}
    dsts = {t for _, t in edges}
    hub = {s: scale for s in srcs}
    auth = {t: scale for t in dsts}
    for _ in range(iters):
        raw = defaultdict(int)
        for s, t in edges:
            raw[s] += auth[t]
        m = max(raw.values())
        hub = {s: raw[s] * scale // m for s in raw}
        raw2 = defaultdict(int)
        for s, t in edges:
            raw2[t] += hub[s]
        m2 = max(raw2.values())
        auth = {t: raw2[t] * scale // m2 for t in raw2}
    return {
        n: (hub.get(n, 0), auth.get(n, 0)) for n in srcs | dsts
    }


@settings(**_SETTINGS)
@given(
    edges=st.lists(_edge, min_size=1, max_size=15),
    iters=st.integers(min_value=0, max_value=3),
)
def test_hits_matches_reference_on_random_graphs(spark_prop, edges, iters):
    # self-loops, multi-edges, nodes on both sides, disconnected
    # parts — the distributed alternating loop must equal the
    # sequential mirror EXACTLY (integer arithmetic, no tolerance)
    from f1_realtime_data_pipeline_spark.operators.graph import hits

    df = spark_prop.createDataFrame(edges, "src bigint, dst bigint")
    got = {r.node: (r.hub, r.auth) for r in hits(df, iters=iters).collect()}
    assert got == _hits_ref(edges, iters)


# ---- keep-best dedup pipeline (r16) --------------------------------------

# a tiny pool of base texts; sampling WITH replacement plants exact-dup
# groups, and near-identical long texts plant near-dup (LSH) pairs
_BASE_TEXTS = st.sampled_from(
    [
        "alpha beta gamma delta epsilon zeta eta theta",
        "alpha beta gamma delta epsilon zeta eta iota",
        "one two three four five six seven eight nine ten",
        "rivers and maps and a completely different story",
        "",
    ]
)


@settings(max_examples=4, deadline=None)
@given(texts=st.lists(_BASE_TEXTS, min_size=1, max_size=10))
def test_keepbest_pipeline_partition_invariants(
    spark_prop, tmp_path_factory, texts
):
    """Model check against the ACTUAL cluster relation: the survivor
    corpus is a partition of the input — (1) exactly one survivor per
    cluster, and it is a member of that cluster; (2) every
    non-cluster doc survives as a singleton (weight 1, NULL
    cluster_id); (3) survivor weights sum to the corpus size (no doc
    double-counted or lost)."""
    from f1_realtime_data_pipeline_spark.operators.dedup import dup_clusters
    from f1_realtime_data_pipeline_spark.plans.llm_star import (
        pipeline_dedup_keepbest,
    )

    tmp = tmp_path_factory.mktemp("keepbest")
    rows = [(i, t, "en", "s", len(t)) for i, t in enumerate(texts)]
    df = spark_prop.createDataFrame(
        rows,
        "doc_id bigint, text string, lang string, source string, "
        "n_chars bigint",
    )
    df.toPandas().to_parquet(str(tmp / "documents.parquet"), index=False)

    members: dict = {}
    for r in dup_clusters(df, threshold=0.5).collect():
        members.setdefault(r.cluster_id, set()).add(r.doc_id)
    clustered = set().union(*members.values()) if members else set()

    out = pipeline_dedup_keepbest(spark_prop, str(tmp)).collect()
    assert len({r.doc_id for r in out}) == len(out)  # no dup survivors

    survivors_by_cluster: dict = {}
    for r in out:
        if r.cluster_id is not None:
            assert r.cluster_id not in survivors_by_cluster
            survivors_by_cluster[r.cluster_id] = r
        else:
            assert r.doc_id not in clustered
            assert r.n_represented == 1
    assert set(survivors_by_cluster) == set(members)
    for cid, r in survivors_by_cluster.items():
        assert r.doc_id in members[cid]
        assert r.n_represented == len(members[cid])
    assert sum(r.n_represented for r in out) == len(texts)


# ---- bigram novelty scoring (r16) ----------------------------------------

_BATCH_IDS = [17, 21, 38, 42, 63, 67, 84, 88]  # split_bucket >= 900


@settings(max_examples=4, deadline=None)
@given(
    exist_texts=st.lists(_doc, min_size=0, max_size=4),
    batch_texts=st.lists(_doc, min_size=1, max_size=4),
)
def test_novelty_score_matches_python_model(
    spark_prop, tmp_path_factory, exist_texts, batch_texts
):
    """Model check on random corpora: novelty_ppm equals the exact
    integer model over the pinned tokenizer contract (boundary empties
    included), batch docs with no bigram emit no row, and existing
    docs never appear."""
    import re

    from f1_realtime_data_pipeline_spark.plans.llm_star import (
        t_novelty_score,
    )

    ids_texts = list(enumerate(exist_texts)) + [
        (_BATCH_IDS[i], t) for i, t in enumerate(batch_texts)
    ]
    tmp = tmp_path_factory.mktemp("novelty")
    rows = [(i, t, "en", "s", len(t)) for i, t in ids_texts]
    spark_prop.createDataFrame(
        rows,
        "doc_id bigint, text string, lang string, source string, "
        "n_chars bigint",
    ).toPandas().to_parquet(str(tmp / "documents.parquet"), index=False)

    def bigrams(t):
        toks = re.split(r"[ \t\n\x0B\f\r]+", t.lower())
        return {f"{a} {b}" for a, b in zip(toks, toks[1:])}

    seen = set()
    for t in exist_texts:
        seen |= bigrams(t)
    expected = {}
    for i, t in enumerate(batch_texts):
        bg = bigrams(t)
        if bg:
            novel = len(bg - seen)
            expected[_BATCH_IDS[i]] = (
                len(bg), novel, (1_000_000 * novel) // len(bg)
            )

    out = {r.doc_id: (r.n_bigrams, r.n_novel, r.novelty_ppm)
           for r in t_novelty_score(spark_prop, str(tmp)).collect()}
    assert out == expected


# ---- kNN similarity graph: triangles + k-core (r16) -----------------------

_cs_pair = st.tuples(
    st.integers(min_value=1, max_value=6),      # custkey
    st.integers(min_value=10, max_value=16),    # suppkey
)


def _knn_model(rows, k):
    """Pure-python mirror of _knn_sim_edges: capped incidence (cap 40
    is a no-op at this size), pairs with shared >= 2, per-node top-k
    by (shared desc, id asc), undirected union."""
    inc = {}
    for c, s in set(rows):
        inc.setdefault(c, set()).add(s)
    from collections import Counter
    shared = Counter()
    for supps in inc.values():
        ss = sorted(supps)
        for i in range(len(ss)):
            for j in range(i + 1, len(ss)):
                shared[(ss[i], ss[j])] += 1
    shared = {p: n for p, n in shared.items() if n >= 2}
    nbrs = {}
    for (a, b), n in shared.items():
        nbrs.setdefault(a, []).append((b, n))
        nbrs.setdefault(b, []).append((a, n))
    und = set()
    for v, lst in nbrs.items():
        lst.sort(key=lambda wn: (-wn[1], wn[0]))
        for w, _n in lst[:k]:
            und.add((min(v, w), max(v, w)))
    return und


@settings(max_examples=4, deadline=None)
@given(rows=st.lists(_cs_pair, min_size=1, max_size=30))
def test_triangles_match_python_model(spark_prop, tmp_path_factory, rows):
    """g_triangles equals brute-force triangle enumeration over the
    modeled kNN projection on random bipartite graphs (K=2 so the
    kNN cap actually binds). Module attrs are set/restored manually —
    hypothesis forbids function-scoped monkeypatch inside @given."""
    import itertools

    from f1_realtime_data_pipeline_spark.plans import graph_ext as gx

    _saved = gx.TRI_KNN_K
    gx.TRI_KNN_K = 2
    und = _knn_model(rows, 2)
    nodes = sorted({v for e in und for v in e})
    deg = {v: sum(v in e for e in und) for v in nodes}
    wedges = sum(d * (d - 1) // 2 for d in deg.values())
    tris = sum(
        (min(a, b), max(a, b)) in und
        and (min(b, c), max(b, c)) in und
        and (min(a, c), max(a, c)) in und
        for a, b, c in itertools.combinations(nodes, 3)
    )
    expected = (
        len(nodes), len(und), wedges, tris,
        0 if wedges == 0 else (3_000_000 * tris) // wedges,
    )

    tmp = tmp_path_factory.mktemp("tri")
    orders = [(i, c) for i, (c, _) in enumerate(rows)]
    lines = [(i, s) for i, (_, s) in enumerate(rows)]
    spark_prop.createDataFrame(
        orders, "o_orderkey bigint, o_custkey bigint"
    ).toPandas().to_parquet(str(tmp / "orders.parquet"), index=False)
    spark_prop.createDataFrame(
        lines, "l_orderkey bigint, l_suppkey bigint"
    ).toPandas().to_parquet(str(tmp / "lineitem.parquet"), index=False)
    try:
        r = gx.g_triangles(spark_prop, str(tmp)).collect()[0]
    finally:
        gx.TRI_KNN_K = _saved
    assert tuple(r) == expected


@settings(max_examples=4, deadline=None)
@given(rows=st.lists(_cs_pair, min_size=1, max_size=30))
def test_kcore_trim_matches_python_model(spark_prop, tmp_path_factory, rows):
    """g_kcore_trim's per-round removals/edges equal a sequential
    peel of the modeled projection (K=2, kNN cap 2)."""
    from f1_realtime_data_pipeline_spark.plans import graph_ext as gx

    _saved = (gx.TRI_KNN_K, gx.KCORE_K)
    gx.TRI_KNN_K, gx.KCORE_K = 2, 2
    edges = _knn_model(rows, 2)
    expected = []
    for rnd in range(1, 4):
        deg = {}
        for a, b in edges:
            deg[a] = deg.get(a, 0) + 1
            deg[b] = deg.get(b, 0) + 1
        keep = {v for v, d in deg.items() if d >= 2}
        removed = len(deg) - len(keep)
        edges = {(a, b) for a, b in edges if a in keep and b in keep}
        expected.append((rnd, removed, len(edges)))

    tmp = tmp_path_factory.mktemp("kcore")
    orders = [(i, c) for i, (c, _) in enumerate(rows)]
    lines = [(i, s) for i, (_, s) in enumerate(rows)]
    spark_prop.createDataFrame(
        orders, "o_orderkey bigint, o_custkey bigint"
    ).toPandas().to_parquet(str(tmp / "orders.parquet"), index=False)
    spark_prop.createDataFrame(
        lines, "l_orderkey bigint, l_suppkey bigint"
    ).toPandas().to_parquet(str(tmp / "lineitem.parquet"), index=False)
    try:
        got = [(r.round, r.n_removed, r.n_edges_after)
               for r in gx.g_kcore_trim(spark_prop, str(tmp)).collect()]
    finally:
        gx.TRI_KNN_K, gx.KCORE_K = _saved
    assert got == expected
