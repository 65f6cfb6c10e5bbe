"""LLM-data extension surface, rounds 2-3.

Round 2: exact substring dedup (Lee et al.), semantic dedup
(SemDeDup), k-means centroid training, Gopher-rule quality filter.
Round 3: TF-IDF keywords, rare-token importance scoring, bloom-filter
decontamination, trained-centroid IVF kNN, overlapping chunking,
incremental-batch admission dedup, the full pipeline_corpus_v2
composition, C4-style span splice, edit-distance fuzzy-dup verify,
seeded training order, epoch expansion, and deterministic shard
assignment.

Same contract as ``plans.llm_star``: every query has a DuckDB oracle
twin with identical column aliases, exact arithmetic wherever a
group-sum could be partition-order-dependent, and no Python UDFs.
These extend the reference's data-quality surface (the reference
itself has no corpus operators — its 558 LoC are the F1 streaming
contract; this family is the 100 TB training-data posture the engine
adds on top, see SCALE.md).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from f1_realtime_data_pipeline_spark.functions import text as tx
from f1_realtime_data_pipeline_spark.functions.text import (
    normalize_text,
    STOPWORDS,
    tokens,
    tokens_sql,
)
from f1_realtime_data_pipeline_spark.operators import dedup as dd
from f1_realtime_data_pipeline_spark.operators.dedup import (
    split_bucket,
    split_bucket_sql,
)
from f1_realtime_data_pipeline_spark.operators import similarity as sim
from f1_realtime_data_pipeline_spark.operators.materialize import materialize
from f1_realtime_data_pipeline_spark.sources.parquet import read_table

QUERIES: dict = {}
ORACLE: dict[str, str] = {}


def _register(name, fn, sql):
    QUERIES[name] = fn
    if sql is not None:
        ORACLE[name] = sql


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return read_table(spark, sf_dir, "documents")


def _embs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return read_table(spark, sf_dir, "embeddings")


# ---------------------------------------------------------------------------
# exact substring dedup (rolling k-token windows)
# ---------------------------------------------------------------------------


def d_substring_dedup(spark, sf_dir):
    """Per-doc exact-substring duplication profile + drop decision:
    a doc is dropped when over half its overlapping 8-token windows
    also appear verbatim elsewhere in the corpus (Lee et al. 2021
    flag-don't-splice variant; the keep threshold is the pipeline
    knob)."""
    stats = dd.substring_dedup_stats(_docs(spark, sf_dir))
    return stats.select(
        "doc_id",
        "n_windows",
        "n_dup_windows",
        "dup_frac",
        (F.col("dup_frac") < 0.5).alias("keep"),
    )


_register(
    "d_substring_dedup",
    d_substring_dedup,
    f"""SELECT doc_id, n_windows, n_dup_windows, dup_frac,
       (dup_frac < 0.5) AS keep
FROM ({dd.substring_dedup_stats_sql()})""",
)


# ---------------------------------------------------------------------------
# semantic dedup + k-means
# ---------------------------------------------------------------------------


def e_semdedup(spark, sf_dir):
    """SemDeDup over the embedding table: spherical-k-means
    clustering (C = ceil(sqrt(N)) trained centroids), then min-id-wins
    prune of within-cluster cosine-near pairs."""
    return sim.semdedup(_embs(spark, sf_dir))


_register("e_semdedup", e_semdedup, sim.semdedup_sql())


def e_kmeans(spark, sf_dir):
    """One Lloyd iteration of spherical k-means (deterministic seed =
    first C vectors): the final (vec_id, cell) assignment."""
    return sim.kmeans_assign(_embs(spark, sf_dir))


_register("e_kmeans", e_kmeans, sim.kmeans_assign_sql())


def e_balanced_select(spark, sf_dir):
    """Cluster-balanced selection (r16): cap every trained k-means
    cell at 4 members, most prototypical first — the density-
    equalization pass that stops the corpus's densest embedding mode
    from dominating the training mix."""
    return sim.balanced_select(_embs(spark, sf_dir))


_register("e_balanced_select", e_balanced_select, sim.balanced_select_sql())


# ---------------------------------------------------------------------------
# Gopher-rule quality filter
# ---------------------------------------------------------------------------

#: Gopher (Rae et al. 2021) document-quality rules, adapted to the
#: word-level signals this corpus carries (no newlines/punctuation →
#: the line- and symbol-based rules are degenerate here and omitted):
#: word count ∈ [GOPHER_MIN_WORDS, GOPHER_MAX_WORDS], mean word length
#: ∈ [3, 10], ≥ 2 stop words, top-term fraction ≤ 0.2 (repetition
#: guard), type-token ratio ≥ 0.3 (vocabulary-diversity guard).
GOPHER_MIN_WORDS = 50
GOPHER_MAX_WORDS = 100_000
GOPHER_MWL_LO, GOPHER_MWL_HI = 3.0, 10.0
GOPHER_MIN_STOP = 2
GOPHER_MAX_TOP_FRAC = 0.2
GOPHER_MIN_TTR = 0.3


def _gopher_filter(base):
    """The Gopher-rule filter core over a (doc_id, text) frame —
    shared by the corpus query and the edge-doc probe below.

    Scale shape: every metric except the top-term fraction is a
    map-only higher-order expression over the materialized token
    array (inlining the split re-runs it per reference — the measured
    ~10× trap). The top-term fraction needs a per-(doc, word) count —
    explode + two partial-agg groupBys keyed on doc_id, then a
    broadcast-size join back. All integer counts; the only doubles
    are final divisions (IEEE-deterministic).

    Zero-token docs (r7 fix, VERDICT r6 #4): a NULL-text doc
    tokenizes to a NULL array — previously the x/0→NULL metrics plus
    the INNER join against the exploded counts silently DROPPED the
    doc (a filter would then neither keep nor reject it). The filter
    now emits it with ``keep = false``: n_words coalesces to 0,
    ratio metrics stay NULL (undefined, not fabricated), the join to
    the exploded counts is LEFT, and each content rule coalesces its
    NULL comparison to false — an empty doc fails every rule.
    DuckDB-side hazard the twin dodges: ``list_reduce`` over an
    empty/NULL list errors there, so a CASE guards it.
    """
    d = base.select("doc_id", tokens("text").alias("toks"))
    toks = F.col("toks")
    n_words = F.coalesce(F.size(toks), F.lit(0)).cast("int")
    metrics = d.select(
        "doc_id",
        "toks",
        n_words.alias("n_words"),
        F.when(
            n_words > 0,
            F.aggregate(
                F.transform(toks, lambda w: F.length(w).cast("bigint")),
                F.lit(0).cast("bigint"),
                lambda acc, v: acc + v,
            ).cast("double")
            / F.size(toks),
        ).alias("mean_word_len"),
        F.coalesce(
            F.size(F.filter(toks, lambda t: t.isin(*STOPWORDS))), F.lit(0)
        ).cast("int").alias("n_stop"),
        F.when(
            n_words > 0, F.size(F.array_distinct(toks)).cast("double") / F.size(toks)
        ).alias("ttr"),
    )
    top = (
        d.select("doc_id", F.explode(toks).alias("w"))
        .groupBy("doc_id", "w")
        .agg(F.count("*").alias("cnt"))
        .groupBy("doc_id")
        .agg(
            (F.max("cnt").cast("double") / F.sum("cnt")).alias("top_term_frac")
        )
    )
    m = metrics.join(top, "doc_id", "left")
    words_ok = (F.col("n_words") >= GOPHER_MIN_WORDS) & (
        F.col("n_words") <= GOPHER_MAX_WORDS
    )
    mwl_ok = F.coalesce(
        (F.col("mean_word_len") >= GOPHER_MWL_LO)
        & (F.col("mean_word_len") <= GOPHER_MWL_HI),
        F.lit(False),
    )
    stop_ok = F.col("n_stop") >= GOPHER_MIN_STOP
    rep_ok = F.coalesce(F.col("top_term_frac") <= GOPHER_MAX_TOP_FRAC, F.lit(False))
    ttr_ok = F.coalesce(F.col("ttr") >= GOPHER_MIN_TTR, F.lit(False))
    return m.select(
        "doc_id",
        "n_words",
        "mean_word_len",
        "n_stop",
        "ttr",
        "top_term_frac",
        words_ok.alias("words_ok"),
        mwl_ok.alias("mwl_ok"),
        stop_ok.alias("stop_ok"),
        rep_ok.alias("rep_ok"),
        ttr_ok.alias("ttr_ok"),
        (words_ok & mwl_ok & stop_ok & rep_ok & ttr_ok).alias("keep"),
    )


def t_quality_gopher(spark, sf_dir):
    """Gopher-rule quality filter over the CORPUS — output cardinality
    equals |documents| exactly (r7 review: the zero-token edge docs
    were briefly unioned in here, which made rejection counts off by
    two phantom rows for any downstream consumer; they now live in
    the dedicated ``t_quality_gopher_edges`` probe, keeping this
    relation production-clean while the edge stays driver-checked)."""
    return _gopher_filter(_docs(spark, sf_dir).select("doc_id", "text"))


#: the zero-token / boundary-token edge fixture, identical literal
#: rows in both engines (corpus-independent by design)
_GOPHER_EDGE_ROWS = [
    (-1, None),                      # NULL text → NULL token array
    (-2, ""),                        # '' → the pinned single '' token
    (-3, "the of and a it is to in on at"),  # all-stopword short doc
]


def t_quality_gopher_edges(spark, sf_dir):
    """The Gopher filter's zero-token/degenerate edge semantics as a
    driver-checked probe: NULL text (NULL token array — must emit
    keep=false, not vanish), the empty string (tokenizes to one ''
    boundary token per the pinned tokenizer contract), and an
    all-stopword short doc. Runs the SAME plan as t_quality_gopher
    over literal rows, so the oracle pins the edge at every sf
    without polluting the corpus relation's cardinality."""
    edge = spark.createDataFrame(_GOPHER_EDGE_ROWS, "doc_id bigint, text string")
    return _gopher_filter(edge)


_GOPHER_STOP_LIST = ", ".join(f"'{w}'" for w in STOPWORDS)


def _gopher_sql(src: str) -> str:
    return f"""WITH t AS (
  SELECT doc_id, {tokens_sql("text")} AS toks
  FROM {src}
), metrics AS (
  SELECT doc_id,
         CAST(COALESCE(len(toks), 0) AS INT) AS n_words,
         CASE WHEN COALESCE(len(toks), 0) > 0 THEN
           CAST(list_reduce(list_transform(toks, w -> CAST(len(w) AS BIGINT)),
                            (a, b) -> a + b) AS DOUBLE) / len(toks) END AS mean_word_len,
         CAST(COALESCE(len(list_filter(toks, x -> x IN ({_GOPHER_STOP_LIST}))), 0) AS INT) AS n_stop,
         CASE WHEN COALESCE(len(toks), 0) > 0 THEN
           CAST(len(list_distinct(toks)) AS DOUBLE) / len(toks) END AS ttr
  FROM t
), counts AS (
  SELECT doc_id, w, COUNT(*) AS cnt
  FROM (SELECT doc_id, unnest(toks) AS w FROM t)
  GROUP BY doc_id, w
), top AS (
  SELECT doc_id, CAST(MAX(cnt) AS DOUBLE) / SUM(cnt) AS top_term_frac
  FROM counts GROUP BY doc_id
)
SELECT m.doc_id, m.n_words, m.mean_word_len, m.n_stop, m.ttr, top.top_term_frac,
       (m.n_words >= {GOPHER_MIN_WORDS} AND m.n_words <= {GOPHER_MAX_WORDS}) AS words_ok,
       COALESCE(m.mean_word_len >= {GOPHER_MWL_LO} AND m.mean_word_len <= {GOPHER_MWL_HI}, FALSE) AS mwl_ok,
       (m.n_stop >= {GOPHER_MIN_STOP}) AS stop_ok,
       COALESCE(top.top_term_frac <= {GOPHER_MAX_TOP_FRAC}, FALSE) AS rep_ok,
       COALESCE(m.ttr >= {GOPHER_MIN_TTR}, FALSE) AS ttr_ok,
       (m.n_words >= {GOPHER_MIN_WORDS} AND m.n_words <= {GOPHER_MAX_WORDS}
        AND COALESCE(m.mean_word_len >= {GOPHER_MWL_LO} AND m.mean_word_len <= {GOPHER_MWL_HI}, FALSE)
        AND m.n_stop >= {GOPHER_MIN_STOP}
        AND COALESCE(top.top_term_frac <= {GOPHER_MAX_TOP_FRAC}, FALSE)
        AND COALESCE(m.ttr >= {GOPHER_MIN_TTR}, FALSE)) AS keep
FROM metrics m LEFT JOIN top USING (doc_id)"""


_GOPHER_EDGE_SRC = (
    "(SELECT CAST(-1 AS BIGINT) AS doc_id, CAST(NULL AS VARCHAR) AS text"
    " UNION ALL SELECT CAST(-2 AS BIGINT), ''"
    " UNION ALL SELECT CAST(-3 AS BIGINT), 'the of and a it is to in on at')"
)

_register("t_quality_gopher", t_quality_gopher, _gopher_sql("documents"))
_register("t_quality_gopher_edges", t_quality_gopher_edges, _gopher_sql(_GOPHER_EDGE_SRC))


# ---------------------------------------------------------------------------
# TF-IDF keywords + rare-token importance scoring (round 3)
# ---------------------------------------------------------------------------

#: keywords kept per document
TFIDF_TOP_K = 5
#: keep threshold for the commonness score (mean corpus doc-frequency
#: ratio of the doc's tokens): below this the doc is mostly tokens the
#: corpus has never seen elsewhere — the importance-filter drop rule
RARE_COMMONNESS_MIN = 0.05


def t_tfidf_keywords(spark, sf_dir):
    """Top-``TFIDF_TOP_K`` TF-IDF keywords per document.

    idf is the RATIONAL variant (N+1)/(df+1), chosen because ln() is
    not correctly-rounded-guaranteed and differs between JVM and C
    libm in the last ulp, which would break the bit-exact oracle
    hash; every arithmetic op here (int counts, one multiply, one
    divide) is IEEE-exact in both engines. Honest caveat (r7 review):
    the variant is rank-equivalent to log TF-IDF only per-IDF — once
    multiplied by tf, tf·idf and tf·ln(idf) can ORDER differently
    (e.g. tf=1/idf=8 vs tf=2/idf=3: 8 > 6 rational but 2.08 < 2.20
    log), so keyword sets near the top-k cut are the rational
    variant's, not standard log TF-IDF's — a deliberate, documented
    engine-portability trade, not an equivalence.

    Scale shape: explode -> two partial-agg groupBys keyed on
    (doc_id, term) / term, a broadcast-size 1-row count, a term-keyed
    join back, and a per-doc top-k window (partitioned, never global).
    All shuffles carry (hashable-string, int) pairs only. The tf
    relation feeds BOTH the df rollup and the score join, so it is
    persisted — one tokenize+explode instead of two (r8, the
    t_bigram_quality discipline); the remaining second scan is the
    count-star for N, which reads parquet metadata only. Lifecycle
    (ADVICE r8): no explicit unpersist — the blocks are
    reference-tracked and the ContextCleaner drops them when the
    returned plan is garbage-collected; session.py pins periodicGC to
    5 min, so a long multi-query run's cache residue is bounded (the
    dedup.py minhash_lsh_pairs policy).
    """
    from pyspark import StorageLevel

    d = _docs(spark, sf_dir).select("doc_id", tokens("text").alias("toks"))
    tf = (
        d.select("doc_id", F.explode("toks").alias("term"))
        .groupBy("doc_id", "term")
        .agg(F.count("*").cast("bigint").alias("tf"))
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    dfreq = tf.groupBy("term").agg(F.count("*").cast("bigint").alias("df"))
    n_docs = d.agg(F.count(F.lit(1)).cast("bigint").alias("__n"))
    scored = (
        tf.join(dfreq, "term")
        .crossJoin(F.broadcast(n_docs))
        .withColumn(
            "score",
            (F.col("tf").cast("double") * (F.col("__n") + F.lit(1)).cast("double"))
            / (F.col("df") + F.lit(1)).cast("double"),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(
        F.col("score").desc(), F.col("term").asc()
    )
    return (
        scored.withColumn("rnk", F.row_number().over(w).cast("int"))
        .filter(F.col("rnk") <= TFIDF_TOP_K)
        .select("doc_id", "term", "tf", "df", "score", "rnk")
    )


_register(
    "t_tfidf_keywords",
    t_tfidf_keywords,
    f"""WITH t AS (
  SELECT doc_id, {tokens_sql("text")} AS toks FROM documents
), tf AS (
  SELECT doc_id, term, CAST(COUNT(*) AS BIGINT) AS tf
  FROM (SELECT doc_id, unnest(toks) AS term FROM t)
  GROUP BY doc_id, term
), dfreq AS (
  SELECT term, CAST(COUNT(*) AS BIGINT) AS df FROM tf GROUP BY term
), n AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n FROM t
)
SELECT doc_id, term, tf, df, score, rnk FROM (
  SELECT tf.doc_id, tf.term, tf.tf, dfreq.df,
         (CAST(tf.tf AS DOUBLE) * CAST(n.n + 1 AS DOUBLE))
           / CAST(dfreq.df + 1 AS DOUBLE) AS score,
         CAST(ROW_NUMBER() OVER (
           PARTITION BY tf.doc_id
           ORDER BY (CAST(tf.tf AS DOUBLE) * CAST(n.n + 1 AS DOUBLE))
                      / CAST(dfreq.df + 1 AS DOUBLE) DESC,
                    tf.term ASC) AS INT) AS rnk
  FROM tf JOIN dfreq USING (term) CROSS JOIN n
) WHERE rnk <= {TFIDF_TOP_K}""",
)


def t_rare_tokens(spark, sf_dir):
    """Importance/commonness score per document (the CCNet-style
    "how typical of the corpus is this doc" signal, log-free): the
    mean over the doc's token OCCURRENCES of that token's corpus
    document-frequency ratio df/N, plus the hapax fraction (tokens
    appearing in no other document).

    FP determinism: the per-doc numerator is an exact BIGINT sum of
    df counts (order-free under any partitioning — the same trick as
    the fixed-point k-means sums), divided once: commonness =
    sum_df / (n_tokens * N). No transcendentals, no float
    accumulation.

    Scale shape: explode -> (doc_id, term) tf agg -> term-keyed df
    join -> doc-keyed integer agg. The df relation is vocabulary-sized
    (zipf-bounded); everything else shuffles integers. tf feeds both
    the df rollup and the score join — persisted, one explode (r8);
    unpersist is the ContextCleaner's on plan GC, periodicGC pinned to
    5 min by session.py (ADVICE r8 — the dedup.py lifecycle policy).
    """
    from pyspark import StorageLevel

    d = _docs(spark, sf_dir).select("doc_id", tokens("text").alias("toks"))
    tf = (
        d.select("doc_id", F.explode("toks").alias("term"))
        .groupBy("doc_id", "term")
        .agg(F.count("*").cast("bigint").alias("tf"))
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    dfreq = tf.groupBy("term").agg(F.count("*").cast("bigint").alias("df"))
    n_docs = d.agg(F.count(F.lit(1)).cast("bigint").alias("__n"))
    per_doc = (
        tf.join(dfreq, "term")
        .groupBy("doc_id")
        .agg(
            F.sum("tf").cast("bigint").alias("n_tokens"),
            F.sum(F.col("tf") * F.col("df")).cast("bigint").alias("sum_df"),
            F.sum(F.when(F.col("df") == 1, F.col("tf")).otherwise(F.lit(0)))
            .cast("bigint")
            .alias("n_hapax"),
        )
    )
    return (
        per_doc.crossJoin(F.broadcast(n_docs))
        .withColumn(
            "commonness",
            F.col("sum_df").cast("double")
            / (F.col("n_tokens") * F.col("__n")).cast("double"),
        )
        .withColumn(
            "hapax_frac",
            F.col("n_hapax").cast("double") / F.col("n_tokens").cast("double"),
        )
        .select(
            "doc_id",
            "n_tokens",
            "sum_df",
            "n_hapax",
            "commonness",
            "hapax_frac",
            (F.col("commonness") >= RARE_COMMONNESS_MIN).alias("keep"),
        )
    )


_register(
    "t_rare_tokens",
    t_rare_tokens,
    f"""WITH t AS (
  SELECT doc_id, {tokens_sql("text")} AS toks FROM documents
), tf AS (
  SELECT doc_id, term, CAST(COUNT(*) AS BIGINT) AS tf
  FROM (SELECT doc_id, unnest(toks) AS term FROM t)
  GROUP BY doc_id, term
), dfreq AS (
  SELECT term, CAST(COUNT(*) AS BIGINT) AS df FROM tf GROUP BY term
), n AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n FROM t
), per_doc AS (
  SELECT tf.doc_id,
         CAST(SUM(tf.tf) AS BIGINT) AS n_tokens,
         CAST(SUM(tf.tf * dfreq.df) AS BIGINT) AS sum_df,
         CAST(SUM(CASE WHEN dfreq.df = 1 THEN tf.tf ELSE 0 END) AS BIGINT) AS n_hapax
  FROM tf JOIN dfreq USING (term)
  GROUP BY tf.doc_id
)
SELECT doc_id, n_tokens, sum_df, n_hapax,
       CAST(sum_df AS DOUBLE) / CAST(n_tokens * n.n AS DOUBLE) AS commonness,
       CAST(n_hapax AS DOUBLE) / CAST(n_tokens AS DOUBLE) AS hapax_frac,
       (CAST(sum_df AS DOUBLE) / CAST(n_tokens * n.n AS DOUBLE)
          >= {RARE_COMMONNESS_MIN}) AS keep
FROM per_doc CROSS JOIN n""",
)


# ---------------------------------------------------------------------------
# bloom-filter decontamination
# ---------------------------------------------------------------------------


def t_contamination_bloom(spark, sf_dir):
    """Train-vs-test decontamination through a real bloom filter (the
    constant-size structure the broadcast-set variant t_contamination
    defers to at 100 TB); flags are a deterministic superset of true
    overlap, value-checked against the DuckDB twin building the same
    bits."""
    return dd.contamination_bloom(_docs(spark, sf_dir), n=3)


_register("t_contamination_bloom", t_contamination_bloom, dd.contamination_bloom_sql(3))


def e_knn_ivf_trained(spark, sf_dir):
    """IVF ANN top-k probing the k-means-TRAINED centroid table (the
    production index layout; seed-centroid e_knn_ivf is the
    deterministic baseline). Same probe plan, different ≤C-row
    centroid relation."""
    return sim.knn_ivf_trained(_embs(spark, sf_dir), n_queries=16, k=5)


_register("e_knn_ivf_trained", e_knn_ivf_trained, sim.knn_ivf_trained_sql(16, 5))


# ---------------------------------------------------------------------------
# overlapping chunking (RAG/window prep) + incremental-batch dedup
# ---------------------------------------------------------------------------

#: chunk geometry: 32-token chunks every 24 tokens (8-token overlap) —
#: the standard retrieval prep; both knobs are parameters of the shape,
#: not the plan
CHUNK_TOKENS = 32
CHUNK_STRIDE = 24


def t_chunk_overlap(spark, sf_dir):
    """Overlapping fixed-token chunks per document (retrieval /
    context-window prep): starts at 1, 1+stride, ... while <= n_tokens.

    Scale shape: map-only — one sequence + posexplode per doc, the
    token array materialized once; chunk_idx is derived arithmetically
    from the start offset so both engines emit the identical relation
    with no window function at all.
    """
    d = _docs(spark, sf_dir).select("doc_id", tokens("text").alias("toks"))
    toks = F.col("toks")
    n = F.size(toks)
    starts = F.sequence(F.lit(1), n, F.lit(CHUNK_STRIDE))
    return (
        d.select("doc_id", "toks", F.explode(starts).alias("chunk_start"))
        .select(
            "doc_id",
            ((F.col("chunk_start") - 1) / F.lit(CHUNK_STRIDE) + 1)
            .cast("int")
            .alias("chunk_idx"),
            F.col("chunk_start").cast("int").alias("chunk_start"),
            F.least(
                F.lit(CHUNK_TOKENS), F.size("toks") - F.col("chunk_start") + 1
            )
            .cast("int")
            .alias("n_chunk_tokens"),
            F.array_join(
                F.slice(F.col("toks"), F.col("chunk_start"), CHUNK_TOKENS), " "
            ).alias("chunk_text"),
        )
    )


_register(
    "t_chunk_overlap",
    t_chunk_overlap,
    f"""WITH t AS (
  SELECT doc_id, {tokens_sql("text")} AS toks FROM documents
)
SELECT doc_id,
       CAST((chunk_start - 1) // {CHUNK_STRIDE} + 1 AS INT) AS chunk_idx,
       CAST(chunk_start AS INT) AS chunk_start,
       CAST(LEAST({CHUNK_TOKENS}, len(toks) - chunk_start + 1) AS INT) AS n_chunk_tokens,
       array_to_string(list_slice(toks, chunk_start, chunk_start + {CHUNK_TOKENS - 1}), ' ') AS chunk_text
FROM (SELECT doc_id, toks, unnest(range(1, len(toks) + 1, {CHUNK_STRIDE})) AS chunk_start FROM t)""",
)


def d_incremental_dedup(spark, sf_dir):
    """Incremental-ingest dedup: the ~10% "new batch" (same
    deterministic hash split as the test set) checked against the
    existing corpus — a new doc is novel iff its exact text occurs in
    no existing doc. The continuously-ingesting pipeline's admission
    gate: only the batch (not the corpus) is rescanned per ingest.

    Scale shape: the join key is ``xxhash64(text)`` — 8-byte shuffle
    rows, the text never leaves the map side (the oracle joins on the
    text itself, identical decisions absent a 64-bit collision, the
    same contract as d_exact). The batch side is small by construction
    so AQE broadcasts it; the corpus side stays a pruned scan.
    """
    from f1_realtime_data_pipeline_spark.operators.dedup import (
        _TEST_GE,
    )

    docs = _docs(spark, sf_dir)
    bucket = split_bucket()
    with_b = docs.select("doc_id", "text", bucket.alias("bucket"))
    batch = with_b.filter(F.col("bucket") >= _TEST_GE).select(
        "doc_id", F.xxhash64("text").alias("h")
    )
    # NULL-text rows are excluded from the existing set (r6 review
    # fix): Spark's xxhash64(NULL) is a real joinable value while the
    # oracle's text-equality join is NULL-rejecting, so an existing
    # NULL would make the engines disagree on NULL-batch novelty.
    # With the filter, a NULL-text batch doc is novel in BOTH engines.
    existing = (
        with_b.filter((F.col("bucket") < _TEST_GE) & F.col("text").isNotNull())
        .select(F.xxhash64("text").alias("h"))
        .distinct()
        .withColumn("seen", F.lit(1))
    )
    return (
        batch.join(existing, "h", "left")
        .select("doc_id", F.col("seen").isNull().alias("is_novel"))
    )


def _incremental_dedup_sql() -> str:
    from f1_realtime_data_pipeline_spark.operators.dedup import (
        _TEST_GE,
    )

    return f"""WITH batch AS (
  SELECT doc_id, text FROM documents
  WHERE {split_bucket_sql()} >= {_TEST_GE}
), existing AS (
  SELECT DISTINCT text FROM documents
  WHERE {split_bucket_sql()} < {_TEST_GE}
    AND text IS NOT NULL
)
SELECT b.doc_id, (e.text IS NULL) AS is_novel
FROM batch b LEFT JOIN existing e ON b.text = e.text"""


_register("d_incremental_dedup", d_incremental_dedup, _incremental_dedup_sql())


def d_incremental_neardup(spark, sf_dir):
    """Incremental NEAR-dup admission (r16): the same ~10% batch as
    d_incremental_dedup, probed against the existing corpus's
    MinHash-LSH band index and verified at true shingle-Jaccard ≥ 0.5
    — the fuzzy admission control a continuously-ingesting pipeline
    runs where the exact gate only catches byte-identical resubmits.
    No existing×existing candidate join anywhere (see the operator
    docstring for the incremental scale shape)."""
    from f1_realtime_data_pipeline_spark.operators.dedup import (
        incremental_neardup_admission,
    )

    return incremental_neardup_admission(_docs(spark, sf_dir))


def _incremental_neardup_sql() -> str:
    from f1_realtime_data_pipeline_spark.operators.dedup import (
        incremental_neardup_admission_sql,
    )

    return incremental_neardup_admission_sql()


_register(
    "d_incremental_neardup", d_incremental_neardup, _incremental_neardup_sql()
)


# ---------------------------------------------------------------------------
# pipeline_corpus_v2: the full modern prep pipeline in one plan
# ---------------------------------------------------------------------------

#: keep a train doc only when less than half its shingles leak test text
PIPE2_MAX_CONTAM = 0.5


def pipeline_corpus_v2(spark, sf_dir):
    """The round-3 end-to-end corpus pipeline: normalize → exact-dedup
    (first doc_id wins per normalized text) → Gopher-rule quality gate
    → exact-substring-dup drop → test-set decontamination (train side)
    → deterministic split → per-(split, source) mixture accounting.
    The composition a current-generation pretraining prep actually
    runs, with every stage the already-oracle-checked operator.

    Scale shape: each signal stage (Gopher, substring stats,
    contamination) is an independent doc_id-keyed relation joined back
    onto the deduped spine — the pattern a production pipeline uses
    when it materializes per-stage signal tables; the joins all key on
    the 8-byte doc_id, the spine's dedup window carries (norm_text,
    doc_id) only, and the final rollup aggregates to the (split,
    source) domain. Absent signal rows (docs too short for substring
    windows; non-train docs with no contamination row) default to
    keep, so the LEFT joins never drop the spine.
    """
    d = _docs(spark, sf_dir)
    norm = normalize_text("text")
    normed = d.select("doc_id", "source", "text", norm.alias("norm_text"))
    w = Window.partitionBy("norm_text").orderBy(F.col("doc_id").asc())
    canon = (
        normed.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("doc_id", "source", "text")
    )
    g = t_quality_gopher(spark, sf_dir).select("doc_id", F.col("keep").alias("g_keep"))
    s = d_substring_dedup(spark, sf_dir).select("doc_id", F.col("keep").alias("s_keep"))
    c = dd.contamination(_docs(spark, sf_dir), n=3).select(
        "doc_id",
        (F.col("contamination_ratio") < PIPE2_MAX_CONTAM).alias("c_keep"),
    )
    from f1_realtime_data_pipeline_spark.operators.dedup import (
        _TEST_GE,
        _TRAIN_LT,
    )

    kept = (
        canon.join(g, "doc_id")
        .join(s, "doc_id", "left")
        .join(c, "doc_id", "left")
        .filter(
            F.col("g_keep")
            & F.coalesce(F.col("s_keep"), F.lit(True))
            & F.coalesce(F.col("c_keep"), F.lit(True))
        )
    )
    bucket = split_bucket()
    split = (
        F.when(bucket < _TRAIN_LT, "train")
        .when(bucket < _TEST_GE, "val")
        .otherwise("test")
    )
    from f1_realtime_data_pipeline_spark.functions.text import token_count

    return (
        kept.withColumn("split", split)
        .withColumn("n_tok", token_count("text"))
        .groupBy("split", "source")
        .agg(
            F.count("*").cast("bigint").alias("n_docs"),
            F.sum("n_tok").cast("bigint").alias("n_tokens"),
        )
    )


def _pipeline_v2_sql() -> str:
    from f1_realtime_data_pipeline_spark.functions.text import token_count_sql
    from f1_realtime_data_pipeline_spark.operators.dedup import (
        _TEST_GE,
        _TRAIN_LT,
    )

    return rf"""WITH normed AS (
  SELECT doc_id, source, text,
         {tx.normalize_text_sql("text")} AS norm_text
  FROM documents
), canon AS (
  SELECT doc_id, source, text FROM (
    SELECT doc_id, source, text,
           ROW_NUMBER() OVER (PARTITION BY norm_text ORDER BY doc_id ASC) AS rn
    FROM normed
  ) WHERE rn = 1
), gopher AS (
  SELECT doc_id, keep AS g_keep FROM ({ORACLE["t_quality_gopher"]})
), sub AS (
  SELECT doc_id, keep AS s_keep FROM ({ORACLE["d_substring_dedup"]})
), contam AS (
  SELECT doc_id, (contamination_ratio < {PIPE2_MAX_CONTAM}) AS c_keep
  FROM ({dd.contamination_sql(3)})
), kept AS (
  SELECT c.doc_id, c.source, c.text
  FROM canon c
  JOIN gopher g USING (doc_id)
  LEFT JOIN sub s USING (doc_id)
  LEFT JOIN contam t USING (doc_id)
  WHERE g.g_keep AND COALESCE(s.s_keep, TRUE) AND COALESCE(t.c_keep, TRUE)
)
SELECT CASE WHEN {split_bucket_sql()} < {_TRAIN_LT} THEN 'train'
            WHEN {split_bucket_sql()} < {_TEST_GE} THEN 'val'
            ELSE 'test' END AS split,
       source,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM({token_count_sql("text")}) AS BIGINT) AS n_tokens
FROM kept
GROUP BY 1, 2"""


_register("pipeline_corpus_v2", pipeline_corpus_v2, _pipeline_v2_sql())


def d_span_splice(spark, sf_dir):
    """C4-style splice: rebuild every document with corpus-duplicated
    spans removed (the flag-only d_span_dedup's downstream step)."""
    return dd.span_splice(_docs(spark, sf_dir))


_register("d_span_splice", d_span_splice, dd.span_splice_sql())


# ---------------------------------------------------------------------------
# edit-distance near-dup verify (fuzzy dedup, BigCode/RefinedWeb-style)
# ---------------------------------------------------------------------------

#: normalized edit similarity at or above this ⇒ fuzzy duplicates
EDITSIM_MIN = 0.8


def d_editdist_neardup(spark, sf_dir):
    """Edit-distance verification of the MinHash-LSH candidate pairs:
    the fuzzy-dedup second stage (set-similarity candidates, then a
    character-level check that token-bag sketches can't express —
    re-orderings and near-anagram docs pass Jaccard but fail here).

    edit_sim = 1 - levenshtein/greatest(len_a, len_b); both engines
    compute Levenshtein with the same exact integer DP, so the stage
    is value-checked. GRANULARITY domain (r9 unicode sweep): Spark's
    levenshtein counts CODEPOINTS — the engine contract, correct for
    multilingual near-dup verification — while DuckDB's counts UTF-8
    bytes, so the oracle twin verifies the ASCII regime where the two
    definitions coincide (the fixture corpus); the codepoint
    semantics themselves are pinned by
    tests/test_llm_ext.py::test_levenshtein_is_codepoint_based, and
    the oracle row for the NON-ASCII regime is the companion
    ``d_editdist_unicode`` (codepoint-exact by construction — r11).
    Scale shape: the O(len²)-per-pair DP runs ONLY
    on the LSH candidate set (bounded by band-bucket occupancy, never
    the corpus); texts are late-fetched onto the bare id pairs by two
    doc_id joins, so the candidate generation itself never shuffles a
    document body. The shared (doc_id, text) relation is persisted —
    both late-fetch joins read one materialized block instead of
    re-scanning parquet (r11, VERDICT r10 #6: 3→2 scans; lifecycle is
    the tf-idf policy — ContextCleaner unpersists on plan GC).
    """
    from pyspark import StorageLevel

    docs = _docs(spark, sf_dir)
    cand = dd.minhash_lsh_pairs(docs, threshold=0.5).select("doc_a", "doc_b")
    t = docs.select("doc_id", "text").persist(StorageLevel.MEMORY_AND_DISK)
    paired = (
        cand.join(t.select(F.col("doc_id").alias("doc_a"), F.col("text").alias("ta")), "doc_a")
        .join(t.select(F.col("doc_id").alias("doc_b"), F.col("text").alias("tb")), "doc_b")
    )
    lev = F.levenshtein("ta", "tb")
    edit_sim = F.lit(1.0) - lev.cast("double") / F.greatest(
        F.length("ta"), F.length("tb")
    ).cast("double")
    return (
        paired.select(
            "doc_a",
            "doc_b",
            lev.cast("int").alias("lev"),
            edit_sim.alias("edit_sim"),
        )
        .withColumn("is_fuzzy_dup", F.col("edit_sim") >= EDITSIM_MIN)
    )


_register(
    "d_editdist_neardup",
    d_editdist_neardup,
    f"""WITH cand AS (
  SELECT doc_a, doc_b FROM ({dd.minhash_lsh_pairs_sql(0.5)})
)
SELECT c.doc_a, c.doc_b,
       CAST(levenshtein(a.text, b.text) AS INT) AS lev,
       (1.0 - CAST(levenshtein(a.text, b.text) AS DOUBLE)
            / CAST(GREATEST(length(a.text), length(b.text)) AS DOUBLE)) AS edit_sim,
       ((1.0 - CAST(levenshtein(a.text, b.text) AS DOUBLE)
            / CAST(GREATEST(length(a.text), length(b.text)) AS DOUBLE))
        >= {EDITSIM_MIN}) AS is_fuzzy_dup
FROM cand c
JOIN documents a ON a.doc_id = c.doc_a
JOIN documents b ON b.doc_id = c.doc_b""",
)


#: cross-engine-identical ASCII projection: strip every codepoint
#: outside printable ASCII (space..tilde). Java regex removes an
#: astral-plane char as two surrogate deletions, RE2 as one codepoint
#: — the REPLACEMENT is empty either way, so the projected string is
#: byte-identical across engines.
_ASCII_ONLY_RE = "[^ -~]"

#: injective substitution used by d_editdist_unicode: lowercase ASCII
#: vowels → precomposed acute accents (2-byte UTF-8, BMP single
#: UTF-16 units — safe for Spark's String-based translate). Injective
#: on the post-projection alphabet (pure ASCII, so the image chars
#: cannot pre-exist), hence distance-preserving.
_VOWELS_ASCII = "aeiou"
_VOWELS_ACCENT = "áéíóú"


def d_editdist_unicode(spark, sf_dir):
    """Codepoint-exact NON-ASCII oracle row for the edit-distance
    contract (VERDICT r10 #3 — the d_editdist_neardup granularity
    residual): Spark's ``levenshtein`` counts codepoints while
    DuckDB's counts UTF-8 bytes, so the production query's twin can
    only verify the ASCII regime. This variant closes the gap with a
    distance-preserving bijection:

    1. both engines project the candidate texts to printable ASCII
       with the identical regex (``[^ -~]`` → ''), so the base pair
       is byte-identical cross-engine on ANY corpus (the multilingual
       hazard fixture included);
    2. Spark additionally maps the five lowercase vowels to
       precomposed acute accents (an injective character substitution
       — ``translate('aeiou' → 'áéíóú')``) and runs ``levenshtein``
       on those genuinely multibyte strings;
    3. DuckDB runs ``levenshtein`` on the untouched ASCII base, where
       bytes == codepoints.

    Injective per-character substitution leaves edit distance
    invariant (edit scripts map 1:1 through the bijection), so the
    two engines agree IFF Spark's levenshtein is codepoint-based —
    a byte-based engine would charge 2 for every vowel↔consonant
    substitution and the values would diverge on the first such pair.
    ``n_accented_*`` (= octet_length − length on the Spark side, =
    vowel count on the DuckDB side) proves the multibyte regime was
    genuinely exercised, row by row. Same candidate pipeline as
    d_editdist_neardup (banded MinHash-LSH, late-fetched texts, the
    r11 persisted shared relation), so a green row verifies the
    production query's own unicode behavior end-to-end.
    """
    from pyspark import StorageLevel

    docs = _docs(spark, sf_dir)
    cand = dd.minhash_lsh_pairs(docs, threshold=0.5).select("doc_a", "doc_b")
    base = F.regexp_replace("text", _ASCII_ONLY_RE, "")
    t = docs.select("doc_id", base.alias("atext")).persist(
        StorageLevel.MEMORY_AND_DISK
    )
    paired = (
        cand.join(t.select(F.col("doc_id").alias("doc_a"), F.col("atext").alias("ta")), "doc_a")
        .join(t.select(F.col("doc_id").alias("doc_b"), F.col("atext").alias("tb")), "doc_b")
    )
    ua = F.translate("ta", _VOWELS_ASCII, _VOWELS_ACCENT)
    ub = F.translate("tb", _VOWELS_ASCII, _VOWELS_ACCENT)
    return paired.select(
        "doc_a",
        "doc_b",
        F.levenshtein(ua, ub).cast("int").alias("lev_cp"),
        (F.octet_length(ua) - F.length(ua)).cast("int").alias("n_accented_a"),
        (F.octet_length(ub) - F.length(ub)).cast("int").alias("n_accented_b"),
    )


_register(
    "d_editdist_unicode",
    d_editdist_unicode,
    f"""WITH cand AS (
  SELECT doc_a, doc_b FROM ({dd.minhash_lsh_pairs_sql(0.5)})
), t AS (
  SELECT doc_id, regexp_replace(text, '{_ASCII_ONLY_RE}', '', 'g') AS atext
  FROM documents
)
SELECT c.doc_a, c.doc_b,
       CAST(levenshtein(a.atext, b.atext) AS INT) AS lev_cp,
       CAST(length(a.atext) - length(translate(a.atext, '{_VOWELS_ASCII}', '')) AS INT)
         AS n_accented_a,
       CAST(length(b.atext) - length(translate(b.atext, '{_VOWELS_ASCII}', '')) AS INT)
         AS n_accented_b
FROM cand c
JOIN t a ON a.doc_id = c.doc_a
JOIN t b ON b.doc_id = c.doc_b""",
)


# ---------------------------------------------------------------------------
# training order + epoch expansion (mixture mechanics)
# ---------------------------------------------------------------------------

#: per-source repeat factors for epoch expansion (upsample scarce,
#: high-quality sources — the standard mixture trick); unlisted
#: sources default to 1. src0/src1 are the synthetic corpus' source
#: labels (TESTDATA.md) so the repeat path is genuinely exercised.
EPOCH_REPEATS: dict[str, int] = {"src0": 3, "src1": 2}


#: range buckets for the distributed global-rank assignment. The
#: shuffle key is md5-uniform on [0, HASH_MOD), so fixed equal-width
#: ranges balance without sampling; at cluster scale set this to the
#: shuffle parallelism (the output is IDENTICAL for any bucket count —
#: it only controls task granularity).
SHUFFLE_ORDER_BUCKETS = 64


def t_shuffle_order(spark, sf_dir):
    """Deterministic training-order shuffle: every doc gets a
    pseudo-random but reproducible rank from the md5 of its id (the
    seeded-permutation every trainer needs — data order matters, and
    a re-run must produce the identical order).

    Distributed global rank (the scalable zipWithIndex — VERDICT r4
    #1): a partition-less ``row_number()`` would drag every row
    through ONE WindowExec task, so instead

    1. bucket each row by an explicit equal-width range of the
       md5-uniform shuffle key (``(key * B) DIV HASH_MOD`` — pure
       row expression, no ``repartitionByRange`` sampling pass and
       none of its recompute nondeterminism; bucket order == key
       order by construction),
    2. count rows per bucket (tiny B-row aggregate) and turn the
       counts into cumulative start offsets with a broadcast
       triangular join (B² pairs at B=64 — no window at all),
    3. rank WITHIN each bucket (``Window.partitionBy(bucket)`` — B
       parallel sorted partitions, each ~N/B rows) and add the
       bucket's offset.

    global_pos = bucket_offset + local_rank reproduces the exact
    total order (shuffle_key, doc_id) because ties on shuffle_key
    always share a bucket. The checkpointed count branch leaves ONE
    source scan in the final plan (PLANS.md); every stage is bounded
    by N/B rows per task at any corpus size.
    """
    d = _docs(spark, sf_dir).select("doc_id", "source")
    key = tx.md5_id(F.concat(F.lit("shuffle:"), F.col("doc_id").cast("string")))
    B = SHUFFLE_ORDER_BUCKETS
    keyed = d.withColumn("shuffle_key", key).withColumn(
        "bucket", F.expr(f"(shuffle_key * {B}) DIV {tx.HASH_MOD}")
    )
    # B-row aggregate, checkpointed so the triangular self-join and the
    # final attach don't each re-derive it from the scan (scans 3 -> 2)
    counts = materialize(
        keyed.groupBy("bucket").agg(F.count("*").alias("n"))
    )
    offsets = (
        counts.alias("a")
        .join(
            F.broadcast(counts.alias("b")),
            F.col("b.bucket") < F.col("a.bucket"),
            "left",
        )
        .groupBy(F.col("a.bucket").alias("bucket"))
        .agg(F.coalesce(F.sum("b.n"), F.lit(0)).alias("bucket_offset"))
    )
    w = Window.partitionBy("bucket").orderBy(
        F.col("shuffle_key").asc(), F.col("doc_id").asc()
    )
    return (
        keyed.join(F.broadcast(offsets), "bucket")
        .withColumn(
            "train_pos",
            (F.col("bucket_offset") + F.row_number().over(w)).cast("bigint"),
        )
        .select("doc_id", "source", "shuffle_key", "train_pos")
    )


_register(
    "t_shuffle_order",
    t_shuffle_order,
    f"""SELECT doc_id, source, shuffle_key,
       CAST(ROW_NUMBER() OVER (ORDER BY shuffle_key ASC, doc_id ASC) AS BIGINT) AS train_pos
FROM (
  SELECT doc_id, source,
         {tx.md5_id_sql("('shuffle:' || CAST(doc_id AS VARCHAR))")} AS shuffle_key
  FROM documents
)""",
)


def t_epoch_expand(spark, sf_dir):
    """Epoch expansion: repeat each doc ``EPOCH_REPEATS[source]``
    times (default 1) with an explicit copy index — how a mixture
    upsamples scarce high-quality sources without weighted samplers.
    Map-only (sequence + explode); output size is Σ r_s·|source_s|,
    the training token budget made explicit.
    """
    d = _docs(spark, sf_dir).select("doc_id", "source")
    r = F.lit(1)
    for src, n in sorted(EPOCH_REPEATS.items()):
        r = F.when(F.col("source") == src, F.lit(n)).otherwise(r)
    return (
        d.withColumn("n_copies", r.cast("int"))
        .select(
            "doc_id",
            "source",
            "n_copies",
            F.explode(F.sequence(F.lit(1), F.col("n_copies"))).alias("copy_idx"),
        )
        .select("doc_id", "source", "n_copies", F.col("copy_idx").cast("int").alias("copy_idx"))
    )


_EPOCH_CASE = "CASE " + " ".join(
    f"WHEN source = '{s}' THEN {n}" for s, n in sorted(EPOCH_REPEATS.items())
) + " ELSE 1 END"

_register(
    "t_epoch_expand",
    t_epoch_expand,
    f"""SELECT doc_id, source, CAST(n_copies AS INT) AS n_copies,
       CAST(unnest(range(1, n_copies + 1)) AS INT) AS copy_idx
FROM (SELECT doc_id, source, {_EPOCH_CASE} AS n_copies FROM documents)""",
)


def t_shard_assign(spark, sf_dir):
    """Deterministic doc→shard mapping for training-shard export (the
    pure-expression core of sources.export.write_training_shards)."""
    from f1_realtime_data_pipeline_spark.sources.export import shard_assign

    return shard_assign(_docs(spark, sf_dir))


from f1_realtime_data_pipeline_spark.sources.export import shard_assign_sql as _sas

_register("t_shard_assign", t_shard_assign, _sas())


# ---------------------------------------------------------------------------
# PII redaction (r5): the anonymization pass every released training
# corpus runs (CCNet/Dolma/FineWeb all ship one) — regex-detect
# emails / phone numbers / IPv4 addresses, replace with typed
# placeholder tokens, and count what was removed (the redaction-rate
# signal privacy review audits).
#
# The synthetic corpus has no PII, so the fixture INJECTS it
# deterministically from doc_id — pure JVM concat, same
# fixture-adapter scheme as the multimodal payloads — and the oracle
# rebuilds the identical dirty text in SQL. Patterns stay in the
# Java-regex ∩ RE2 common dialect so both engines match identically.
#
# Scale shape: map-only single scan, every expression whole-stage
# codegen (regexp_replace / regexp_count are JVM built-ins — no
# Python anywhere); at 100 TB this is the cheapest kind of pass there
# is, and composes into pipeline_corpus-style fused single-scan runs.
# ---------------------------------------------------------------------------

#: Java-regex ∩ RE2 common-dialect patterns (no lookaround, no \b
#: differences in play: placements are space-delimited)
PII_EMAIL_RE = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
PII_PHONE_RE = "\\+[0-9]{1,2}-[0-9]{3}-[0-9]{4}"
PII_IP_RE = "([0-9]{1,3}\\.){3}[0-9]{1,3}"


def _pii_dirty(d: DataFrame) -> DataFrame:
    """Inject one email, one phone, one IPv4 per doc (deterministic
    from doc_id, pure JVM concat — no UDF)."""
    # NULL text coalesces to '' in BOTH engines (r7 review round 2):
    # Spark's concat_ws skips NULL elements while the SQL twin's ||
    # nullifies the whole expression — a NULL-text doc would count
    # 1/1/1 here and NULL/NULL/NULL in the oracle. '' keeps the
    # byte-identical dirty string on every non-null doc and defines
    # the NULL case as "no text, planted PII still found".
    return d.withColumn(
        "dirty",
        F.concat_ws(
            " ",
            F.concat(F.lit("user"), F.col("doc_id").cast("string"),
                     F.lit("@ex"), (F.col("doc_id") % 7).cast("string"),
                     F.lit(".com")),
            F.coalesce(F.col("text"), F.lit("")),
            F.lit("call"),
            F.concat(F.lit("+1-555-"),
                     F.format_string("%04d", (F.col("doc_id") % 10000).cast("int"))),
            F.lit("from"),
            F.concat_ws(".", F.lit("10"), (F.col("doc_id") % 256).cast("string"),
                        ((F.col("doc_id") * 3) % 256).cast("string"),
                        ((F.col("doc_id") * 7) % 256).cast("string")),
        ),
    )


def t_pii_redact(spark, sf_dir):
    """Count + redact PII: emails → <EMAIL>, phones → <PHONE>, IPv4 →
    <IP>. Counts come from the DIRTY text (what privacy review audits:
    how much was found), the redacted text from the replace chain —
    order matters and is pinned: email first (its local part may
    contain digits/dots an IP pattern could nibble), then phone, then
    IP."""
    d = _pii_dirty(_docs(spark, sf_dir).select("doc_id", "text"))
    red = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(F.col("dirty"), PII_EMAIL_RE, "<EMAIL>"),
            PII_PHONE_RE,
            "<PHONE>",
        ),
        PII_IP_RE,
        "<IP>",
    )
    return d.select(
        "doc_id",
        F.regexp_count(F.col("dirty"), F.lit(PII_EMAIL_RE)).cast("int").alias("n_email"),
        F.regexp_count(F.col("dirty"), F.lit(PII_PHONE_RE)).cast("int").alias("n_phone"),
        F.regexp_count(F.col("dirty"), F.lit(PII_IP_RE)).cast("int").alias("n_ip"),
        red.alias("redacted"),
        F.length(red).cast("int").alias("redacted_len"),
    )


_PII_DIRTY_SQL = (
    "'user' || CAST(doc_id AS VARCHAR) || '@ex' || CAST(doc_id % 7 AS VARCHAR)"
    " || '.com ' || COALESCE(text, '') || ' call +1-555-' || printf('%04d', doc_id % 10000)"
    " || ' from 10.' || CAST(doc_id % 256 AS VARCHAR) || '.'"
    " || CAST((doc_id * 3) % 256 AS VARCHAR) || '.'"
    " || CAST((doc_id * 7) % 256 AS VARCHAR)"
)

_register(
    "t_pii_redact",
    t_pii_redact,
    f"""SELECT doc_id,
       CAST(len(regexp_extract_all(dirty, '{PII_EMAIL_RE}')) AS INT) AS n_email,
       CAST(len(regexp_extract_all(dirty, '{PII_PHONE_RE}')) AS INT) AS n_phone,
       CAST(len(regexp_extract_all(dirty, '{PII_IP_RE}')) AS INT) AS n_ip,
       redacted,
       CAST(length(redacted) AS INT) AS redacted_len
FROM (
  SELECT doc_id, dirty,
         regexp_replace(regexp_replace(regexp_replace(
           dirty, '{PII_EMAIL_RE}', '<EMAIL>', 'g'),
           '{PII_PHONE_RE}', '<PHONE>', 'g'),
           '{PII_IP_RE}', '<IP>', 'g') AS redacted
  FROM (SELECT doc_id, {_PII_DIRTY_SQL} AS dirty FROM documents)
)""",
)


# ---------------------------------------------------------------------------
# LM-quality scoring (r5): the perplexity-filter family (CCNet scores
# docs with a KenLM; Gopher/FineWeb keep it as a core quality signal).
# A 5-gram LM doesn't fit the oracle, but the SHAPE does: train a
# bigram conditional-probability model on the corpus itself (two
# count aggregations), then score each document by its mean bigram
# probability — low-probability token sequences mark gibberish or
# boilerplate exactly like high perplexity does (score ≈ 1/ppl proxy).
#
# Exact arithmetic: per-instance probabilities go through integer
# fixed-point ((cnt_bg · 1e6) DIV cnt_prefix) BEFORE the group-sum, so
# the aggregate is shuffle-order-independent and hash-matches DuckDB —
# the same discipline every other scoring query here follows (a double
# sum over a shuffle is partition-order-dependent).
#
# Scale shape: one scan explodes bigram instances; two count
# aggregations (bigram table is vocab²-bounded, prefix table
# vocab-bounded); instances join back on the bigram key — at 100 TB
# swap the two string keys for xxhash64(w1||w2)/xxhash64(w1) like the
# shingle index, making every shuffle row 8/16 bytes.
# ---------------------------------------------------------------------------


def t_bigram_quality(spark, sf_dir):
    """Corpus-trained bigram LM quality score per document:
    avg_prob_ppm = mean over bigram instances of
    P(w2|w1) = count(w1 w2) / count(w1 ·), in parts-per-million."""
    from pyspark import StorageLevel

    d = _docs(spark, sf_dir).select("doc_id", tokens("text").alias("toks"))
    big = (
        d.filter(F.size("toks") >= 2)
        .select(
            "doc_id",
            F.explode(
                F.zip_with(
                    F.slice(F.col("toks"), 1, F.size("toks") - 1),
                    F.slice(F.col("toks"), 2, F.size("toks") - 1),
                    lambda a, b: F.struct(a.alias("w1"), b.alias("w2")),
                )
            ).alias("bg"),
        )
        .select("doc_id", F.col("bg.w1").alias("w1"), F.col("bg.w2").alias("w2"))
        # the instance relation is consumed TWICE (train: bigram/prefix
        # counts; score: join-back) — persist so the corpus is
        # tokenized+exploded once (r8 best-of-3: −12% wall; same
        # module discipline as t_contamination_report's shingle
        # relation; MEMORY_AND_DISK spills rather than OOMs at scale).
        # Lifecycle (ADVICE r8): reference-tracked — ContextCleaner
        # unpersists on plan GC, periodicGC pinned to 5 min in
        # session.py, so cache residue across a long run is bounded.
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    bgc = big.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("cbg"))
    # prefix counts roll up from the bigram table (Σ_w2 cbg == count of
    # w1-as-prefix instances) — vocab²-bounded input instead of a second
    # corpus-wide aggregation over the exploded instances
    pfc = bgc.groupBy("w1").agg(F.sum("cbg").alias("cw1"))
    return (
        big.join(bgc, ["w1", "w2"])
        .join(pfc, "w1")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("int").alias("n_bigrams"),
            F.sum(F.expr("(cbg * 1000000) DIV cw1")).alias("__sum_ppm"),
        )
        # integer division end-to-end (ADVICE r5): the oracle uses '//';
        # a double quotient is exact at fixture scale but drifts once
        # the summed ppm approaches 2^53 on large documents
        .select(
            "doc_id",
            "n_bigrams",
            F.expr("__sum_ppm DIV n_bigrams").cast("bigint").alias("avg_prob_ppm"),
        )
    )


_register(
    "t_bigram_quality",
    t_bigram_quality,
    f"""WITH toks AS (
  SELECT doc_id, {tokens_sql('text')} AS t FROM documents
), big AS (
  SELECT doc_id, t[i] AS w1, t[i + 1] AS w2
  FROM toks, UNNEST(range(1, len(t))) AS u(i)
  WHERE len(t) >= 2
), bgc AS (
  SELECT w1, w2, COUNT(*) AS cbg FROM big GROUP BY w1, w2
), pfc AS (
  SELECT w1, SUM(cbg) AS cw1 FROM bgc GROUP BY w1
)
SELECT doc_id,
       CAST(COUNT(*) AS INT) AS n_bigrams,
       CAST(SUM((cbg * 1000000) // cw1) // COUNT(*) AS BIGINT) AS avg_prob_ppm
FROM big JOIN bgc USING (w1, w2) JOIN pfc USING (w1)
GROUP BY doc_id""",
)


# ---------------------------------------------------------------------------
# training-order mechanics (r5, re-planned r6): interleaving +
# length-bucketed batching. r5 shipped these as per-group window ranks
# (Window.partitionBy(source) / partitionBy(len_bucket)); the r5
# verdict correctly flagged that shape — sources number in the tens and
# length mass concentrates in a few buckets, so at 100 TB a "bounded
# group" is still a multi-TB SINGLE WindowExec task. r6 composes the
# t_shuffle_order bucketed offset+local-rank trick PER GROUP: the rank
# window now partitions on (group, key-range bucket), every task
# bounded by ~|group|/B rows at any corpus size. Oracles unchanged —
# the bucketed rank reproduces the exact per-group total order because
# ties on shuffle_key always share a bucket.
# ---------------------------------------------------------------------------


def _bucketed_group_rank(keyed: DataFrame, group_cols: list, B: int = SHUFFLE_ORDER_BUCKETS) -> DataFrame:
    """0-based rank within each ``group_cols`` group ordered by
    (shuffle_key, doc_id), WITHOUT a single-task-per-group window.

    Input must carry ``shuffle_key`` (md5-uniform on [0, HASH_MOD))
    and ``doc_id``. Three bounded stages:

    1. bucket each row by an equal-width range of the shuffle key
       (pure row expression — no sampling pass; bucket order == key
       order within a group by construction),
    2. count rows per (group, bucket) — a |groups|·B-row aggregate,
       checkpointed so the offset join and the final attach share one
       derivation — and turn counts into cumulative start offsets with
       a broadcast triangular join keyed on the group (equi on group,
       ``b.bucket < a.bucket`` as the residual filter: per-group B²
       pairs, no window),
    3. rank WITHIN each (group, bucket) partition — |groups|·B
       parallel sorted partitions, each ~|group|/B rows — and add the
       bucket's offset.

    Adds ``rnk`` (bigint, 0-based). Identical output for any B; B only
    controls task granularity, so at cluster scale set it to the
    shuffle parallelism.
    """
    keyed = keyed.withColumn(
        "__b", F.expr(f"(shuffle_key * {B}) DIV {tx.HASH_MOD}")
    )
    counts = materialize(
        keyed.groupBy(*group_cols, "__b").agg(F.count(F.lit(1)).alias("__n"))
    )
    cond = F.col("b.__b") < F.col("a.__b")
    for g in group_cols:
        # NULL-SAFE group equality (r7 review round 2): a NULL group
        # value (e.g. len_bucket of a NULL-text doc) must form its own
        # rank partition like the oracle's PARTITION BY does — plain
        # == would null-reject and the row would vanish from the
        # output while the oracle emits it
        cond = F.col(f"a.{g}").eqNullSafe(F.col(f"b.{g}")) & cond
    offsets = (
        counts.alias("a")
        .join(F.broadcast(counts.alias("b")), cond, "left")
        .groupBy(
            *[F.col(f"a.{g}").alias(g) for g in group_cols],
            F.col("a.__b").alias("__b"),
        )
        .agg(F.coalesce(F.sum("b.__n"), F.lit(0)).alias("__off"))
    )
    w = Window.partitionBy(*group_cols, "__b").orderBy(
        F.col("shuffle_key").asc(), F.col("doc_id").asc()
    )
    k = keyed.alias("k")
    o = offsets.alias("o")
    attach = F.col("k.__b") == F.col("o.__b")
    for g in group_cols:
        attach = F.col(f"k.{g}").eqNullSafe(F.col(f"o.{g}")) & attach
    return (
        k.join(F.broadcast(o), attach)
        .select(*[F.col(f"k.{c}") for c in keyed.columns], F.col("o.__off"))
        .withColumn(
            "rnk",
            (F.col("__off") + F.row_number().over(w)).cast("bigint") - 1,
        )
        .drop("__b", "__off")
    )


def t_interleave_sources(spark, sf_dir):
    """Source-interleaved training order: sources round-robin through
    the stream (position = within-source-rank · n_sources +
    source_idx) so no source clumps — the mixing-order every
    multi-corpus trainer applies after per-source shuffling. Within a
    source the order is the seeded md5 shuffle; the per-source rank is
    the bucketed offset+local-rank composition (``_bucketed_group_rank``
    on (source, key-range bucket) — VERDICT r5 #2; no window partitions
    on bare ``source``, so the largest source is spread over B tasks).
    The source index is alphabetic rank — a tiny sorted-distinct
    relation joined broadcast (the allowlisted global window: tens of
    rows); the source COUNT rides the same relation as a second window
    column (r8, r7-verdict item: this used to be an eager
    ``srcs.count()`` job fired at plan-BUILD time that derived the
    distinct-sources relation a second time — now one derivation,
    fully lazy, inside the plan). Sources differ in size, so tail
    positions thin out to the surviving sources — positions stay
    unique and order-stable, which is the property training ingestion
    needs (exact round-robin density only holds while all sources have
    docs left)."""
    d = _docs(spark, sf_dir).select("doc_id", "source")
    srcs = (
        d.select("source").distinct()
        .withColumn(
            "source_idx",
            F.row_number()
            .over(Window.orderBy("source"))
            .cast("bigint"),
        )
        .withColumn("source_idx", F.col("source_idx") - 1)
        .withColumn(
            "__n_src",
            F.count(F.lit(1)).over(Window.partitionBy()).cast("bigint"),
        )
    )
    key = tx.md5_id(F.concat(F.lit("shuffle:"), F.col("doc_id").cast("string")))
    ranked = _bucketed_group_rank(
        d.withColumn("shuffle_key", key), ["source"]
    )
    return (
        ranked.join(F.broadcast(srcs), "source")
        .select(
            "doc_id",
            "source",
            (F.col("rnk") * F.col("__n_src") + F.col("source_idx"))
            .cast("bigint")
            .alias("train_pos"),
        )
    )


_register(
    "t_interleave_sources",
    t_interleave_sources,
    f"""WITH srcs AS (
  SELECT source, ROW_NUMBER() OVER (ORDER BY source) - 1 AS source_idx
  FROM (SELECT DISTINCT source FROM documents)
), n AS (SELECT COUNT(*) AS n_src FROM srcs),
ranked AS (
  SELECT doc_id, source,
         ROW_NUMBER() OVER (
           PARTITION BY source
           ORDER BY {tx.md5_id_sql("('shuffle:' || CAST(doc_id AS VARCHAR))")} ASC,
                    doc_id ASC
         ) - 1 AS src_rank
  FROM documents
)
SELECT doc_id, ranked.source,
       CAST(src_rank * n.n_src + srcs.source_idx AS BIGINT) AS train_pos
FROM ranked JOIN srcs USING (source) CROSS JOIN n""",
)


#: length-bucketed batching knobs: bucket width in tokens, docs per batch
LEN_BUCKET_WIDTH = 16
LEN_BATCH_SIZE = 8


def t_length_buckets(spark, sf_dir):
    """Length-bucketed batching plan: group docs of similar token
    length and number fixed-size batches within each bucket — the
    dynamic-batching layout that minimizes padding waste (batch max
    length ≈ every member's length). Bucket id is integer division of
    the token count; batch id is the within-bucket seeded-shuffle rank
    DIV batch size. The within-bucket rank is the bucketed
    offset+local-rank composition on (len_bucket, key-range bucket)
    (``_bucketed_group_rank`` — VERDICT r5 #3: only the bucket COUNT
    is bounded; real corpora concentrate length mass in a few buckets,
    so a bare ``partitionBy(len_bucket)`` window would make the hot
    bucket one unbounded task). Everything else is map-side
    arithmetic."""
    d = _docs(spark, sf_dir).select(
        "doc_id", tx.token_count("text").cast("bigint").alias("n_tokens")
    )
    key = tx.md5_id(F.concat(F.lit("shuffle:"), F.col("doc_id").cast("string")))
    ranked = _bucketed_group_rank(
        d.withColumn(
            "len_bucket", F.expr(f"n_tokens DIV {LEN_BUCKET_WIDTH}")
        ).withColumn("shuffle_key", key),
        ["len_bucket"],
    )
    return (
        ranked.select(
            "doc_id",
            "n_tokens",
            F.col("len_bucket").cast("int").alias("len_bucket"),
            F.expr(f"rnk DIV {LEN_BATCH_SIZE}").cast("int").alias("batch_idx"),
            F.expr(f"rnk % {LEN_BATCH_SIZE}").cast("int").alias("batch_slot"),
        )
    )


_register(
    "t_length_buckets",
    t_length_buckets,
    f"""SELECT doc_id, n_tokens,
       CAST(len_bucket AS INT) AS len_bucket,
       CAST(rnk // {LEN_BATCH_SIZE} AS INT) AS batch_idx,
       CAST(rnk % {LEN_BATCH_SIZE} AS INT) AS batch_slot
FROM (
  SELECT doc_id, n_tokens, n_tokens // {LEN_BUCKET_WIDTH} AS len_bucket,
         ROW_NUMBER() OVER (
           PARTITION BY n_tokens // {LEN_BUCKET_WIDTH}
           ORDER BY {tx.md5_id_sql("('shuffle:' || CAST(doc_id AS VARCHAR))")} ASC,
                    doc_id ASC
         ) - 1 AS rnk
  FROM (
    SELECT doc_id, CAST(len({tokens_sql('text')}) AS BIGINT) AS n_tokens
    FROM documents
  )
)""",
)


def p_dataset_card(spark, sf_dir):
    """The per-source DATASET CARD: the statistics table every corpus
    release publishes — document and token volumes, average length,
    language breadth, and the exact-duplicate rate. One fused plan:
    a text-count join flags duplicated docs, then a single per-source
    rollup aggregates everything; all integer arithmetic (fixed-point
    ppm for the rate) so the group-sums are shuffle-order-free.

    Scale note: the duplicate flag groups by the text itself for
    oracle parity; at 100 TB group on xxhash64(text) instead (8-byte
    shuffle rows, the d_exact discipline) — same plan shape."""
    d = _docs(spark, sf_dir).select(
        "doc_id", "source", "lang", "text",
        tx.token_count("text").cast("bigint").alias("n_tokens"),
    )
    # NULL-SAFE flag join (r7 review round 2): groupBy keeps a NULL
    # text group in both engines, but a null-rejecting join would drop
    # every NULL-text doc from the CARD — published per-source counts
    # silently below |documents|, and both engines agreed so the
    # oracle could never flag it. NULL texts count as duplicates of
    # each other, like any other equal-text group.
    tc = d.groupBy("text").agg(F.count(F.lit(1)).alias("__c"))
    flagged = (
        d.alias("d")
        .join(tc.alias("t"), F.col("d.text").eqNullSafe(F.col("t.text")))
        .select(*[F.col(f"d.{c}") for c in d.columns], F.col("t.__c"))
        .withColumn("__dup", (F.col("__c") > 1).cast("bigint"))
    )
    return (
        flagged.groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum("n_tokens").cast("bigint").alias("total_tokens"),
            F.countDistinct("lang").cast("int").alias("n_langs"),
            F.sum("__dup").cast("bigint").alias("n_dup_docs"),
        )
        .select(
            "source",
            "n_docs",
            "total_tokens",
            F.expr("total_tokens DIV n_docs").cast("bigint").alias("avg_tokens"),
            "n_langs",
            "n_dup_docs",
            F.expr("(n_dup_docs * 1000000) DIV n_docs")
            .cast("bigint")
            .alias("dup_ppm"),
        )
    )


_register(
    "p_dataset_card",
    p_dataset_card,
    f"""WITH d AS (
  SELECT doc_id, source, lang, text,
         CAST(len({tokens_sql('text')}) AS BIGINT) AS n_tokens
  FROM documents
), tc AS (
  SELECT text, COUNT(*) AS __c FROM d GROUP BY text
), flagged AS (
  SELECT d.*, CAST(tc.__c > 1 AS BIGINT) AS __dup
  FROM d JOIN tc ON d.text IS NOT DISTINCT FROM tc.text
)
SELECT source,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
       CAST(SUM(n_tokens) // COUNT(*) AS BIGINT) AS avg_tokens,
       CAST(COUNT(DISTINCT lang) AS INT) AS n_langs,
       CAST(SUM(__dup) AS BIGINT) AS n_dup_docs,
       CAST((SUM(__dup) * 1000000) // COUNT(*) AS BIGINT) AS dup_ppm
FROM flagged
GROUP BY source""",
)


def t_chi2_drift(spark, sf_dir):
    """Distribution-drift detection (r13): per-source chi-squared
    statistic of the document-length distribution against the whole
    corpus — the drift check a training pipeline runs per ingest
    batch before trusting a source's mixture weight (a source whose
    length profile shifts is re-crawled, re-filtered, or quarantined).

    Length buckets: floor(n_chars/500) clamped to 10 cells (the
    t_length_buckets grain). Observed counts are exact; expected
    e = row_total × col_total / N uses one double expression with
    identical parenthesization in both engines; and the per-source
    SUM over the ≤10 per-bucket terms is made ORDER-FREE by rounding
    each term to fixed-point micro-units (ppm) BIGINT first — a sum of
    doubles would depend on addition order across partitions, an
    integer sum cannot (the t_domain_weights fixed-point discipline).
    chi2 is emitted in micro-units so both engines' integer sums
    compare exactly (measured: every term sits ≥0.02 micro-units from
    a rounding boundary across all five fixtures — ~20× the worst
    ulp-divergence a long double expression has shown in this repo);
    dof = buckets with any corpus mass, minus one.

    The term sum runs over the FULL per-source bucket domain, not just
    observed cells (ADVICE r13): a source with ZERO docs in a
    corpus-populated bucket is the strongest drift signal — its cell
    contributes (0−e)²/e = e — and summing observed cells only would
    silently drop exactly those terms while dof still counted every
    corpus bucket. The domain is sources × corpus buckets (row_tot ⨯
    the ≤10-row col_tot, both broadcast — constant-size at any SF),
    left-joined back to observed counts with o=0 fill.

    ``cells`` feeds five branches (row/col/grand totals, the domain
    join, the dof count); persisted — ONE corpus scan materializes the
    ≤ |sources|×10-row aggregate and every branch reads the cache (the
    t_tfidf/t_dsir discipline; unpersist is the ContextCleaner's on
    plan GC)."""
    from pyspark import StorageLevel

    d = _docs(spark, sf_dir).select(
        "source",
        F.least(F.floor(F.col("n_chars") / 500), F.lit(9))
        .cast("int")
        .alias("bucket"),
    )
    cells = (
        d.groupBy("source", "bucket")
        .agg(F.count(F.lit(1)).cast("bigint").alias("o"))
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    row_tot = cells.groupBy("source").agg(F.sum("o").alias("row_n"))
    col_tot = cells.groupBy("bucket").agg(F.sum("o").alias("col_n"))
    grand = cells.agg(F.sum("o").alias("grand_n"))
    domain = (
        row_tot.crossJoin(F.broadcast(col_tot))
        .join(F.broadcast(cells), ["source", "bucket"], "left")
        .select(
            "source",
            "bucket",
            "row_n",
            "col_n",
            F.coalesce(F.col("o"), F.lit(0)).cast("bigint").alias("o"),
        )
    )
    e = (
        F.col("row_n").cast("double")
        * F.col("col_n").cast("double")
        / F.col("grand_n").cast("double")
    )
    term = (F.col("o").cast("double") - e) * (F.col("o").cast("double") - e) / e
    scored = domain.crossJoin(F.broadcast(grand)).select(
        "source",
        "row_n",
        F.round(term * 1000000.0).cast("bigint").alias("term_micro"),
    )
    n_buckets = col_tot.agg(F.count(F.lit(1)).alias("k"))
    return (
        scored.groupBy("source")
        .agg(
            F.max("row_n").cast("bigint").alias("n_docs"),
            F.sum("term_micro").cast("bigint").alias("chi2_micro"),
        )
        .crossJoin(F.broadcast(n_buckets))
        .select(
            "source",
            "n_docs",
            "chi2_micro",
            (F.col("k") - 1).cast("int").alias("dof"),
        )
    )


_register(
    "t_chi2_drift",
    t_chi2_drift,
    """WITH cells AS (
  SELECT source,
         CAST(LEAST(FLOOR(n_chars / 500), 9) AS INT) AS bucket,
         CAST(COUNT(*) AS BIGINT) AS o
  FROM documents GROUP BY source, CAST(LEAST(FLOOR(n_chars / 500), 9) AS INT)
), row_tot AS (
  SELECT source, SUM(o) AS row_n FROM cells GROUP BY source
), col_tot AS (
  SELECT bucket, SUM(o) AS col_n FROM cells GROUP BY bucket
), grand AS (
  SELECT SUM(o) AS grand_n FROM cells
), domain AS (
  SELECT r.source, r.row_n, t.bucket, t.col_n,
         CAST(COALESCE(c.o, 0) AS BIGINT) AS o
  FROM row_tot r
  CROSS JOIN col_tot t
  LEFT JOIN cells c ON c.source = r.source AND c.bucket = t.bucket
), scored AS (
  SELECT d.source, d.row_n,
         CAST(ROUND(
           (CAST(d.o AS DOUBLE)
              - CAST(d.row_n AS DOUBLE) * CAST(d.col_n AS DOUBLE)
                / CAST(g.grand_n AS DOUBLE))
           * (CAST(d.o AS DOUBLE)
              - CAST(d.row_n AS DOUBLE) * CAST(d.col_n AS DOUBLE)
                / CAST(g.grand_n AS DOUBLE))
           / (CAST(d.row_n AS DOUBLE) * CAST(d.col_n AS DOUBLE)
                / CAST(g.grand_n AS DOUBLE))
           * 1000000.0) AS BIGINT) AS term_micro
  FROM domain d
  CROSS JOIN grand g
)
SELECT source,
       CAST(MAX(row_n) AS BIGINT) AS n_docs,
       CAST(SUM(term_micro) AS BIGINT) AS chi2_micro,
       (SELECT CAST(COUNT(*) - 1 AS INT) FROM col_tot) AS dof
FROM scored
GROUP BY source""",
)
