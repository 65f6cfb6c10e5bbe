"""LLM-data extension surface, round 2: exact substring dedup,
semantic dedup (SemDeDup), k-means centroid training, and a
Gopher-rule quality filter.

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

from f1_realtime_data_pipeline_spark.functions.text import (
    STOPWORDS,
    tokens,
    tokens_sql,
)
from f1_realtime_data_pipeline_spark.operators import dedup as dd
from f1_realtime_data_pipeline_spark.operators import similarity as sim
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


def t_quality_gopher(spark, sf_dir):
    """Gopher-rule quality filter: per-doc metrics, one boolean per
    rule, and the conjunction as ``keep``.

    Scale shape: every metric except the top-term fraction is a
    map-only higher-order expression over the materialized token
    array (inlining the split re-runs it per reference — the measured
    ~10× trap). The top-term fraction needs a per-(doc, word) count —
    explode + two partial-agg groupBys keyed on doc_id, then a
    broadcast-size join back. All integer counts; the only doubles
    are final divisions (IEEE-deterministic).
    """
    d = _docs(spark, sf_dir).select("doc_id", tokens("text").alias("toks"))
    toks = F.col("toks")
    metrics = d.select(
        "doc_id",
        "toks",
        F.size(toks).cast("int").alias("n_words"),
        (
            F.aggregate(
                F.transform(toks, lambda w: F.length(w).cast("bigint")),
                F.lit(0).cast("bigint"),
                lambda acc, v: acc + v,
            ).cast("double")
            / F.size(toks)
        ).alias("mean_word_len"),
        F.size(F.filter(toks, lambda t: t.isin(*STOPWORDS))).cast("int").alias("n_stop"),
        (F.size(F.array_distinct(toks)).cast("double") / F.size(toks)).alias("ttr"),
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
    m = metrics.join(top, "doc_id")
    words_ok = (F.col("n_words") >= GOPHER_MIN_WORDS) & (
        F.col("n_words") <= GOPHER_MAX_WORDS
    )
    mwl_ok = (F.col("mean_word_len") >= GOPHER_MWL_LO) & (
        F.col("mean_word_len") <= GOPHER_MWL_HI
    )
    stop_ok = F.col("n_stop") >= GOPHER_MIN_STOP
    rep_ok = F.col("top_term_frac") <= GOPHER_MAX_TOP_FRAC
    ttr_ok = F.col("ttr") >= GOPHER_MIN_TTR
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


_GOPHER_STOP_LIST = ", ".join(f"'{w}'" for w in STOPWORDS)

_register(
    "t_quality_gopher",
    t_quality_gopher,
    f"""WITH t AS (
  SELECT doc_id, {tokens_sql("text")} AS toks FROM documents
), metrics AS (
  SELECT doc_id,
         CAST(len(toks) AS INT) AS n_words,
         CAST(list_reduce(list_transform(toks, w -> CAST(len(w) AS BIGINT)),
                          (a, b) -> a + b) AS DOUBLE) / len(toks) AS mean_word_len,
         CAST(len(list_filter(toks, x -> x IN ({_GOPHER_STOP_LIST}))) AS INT) AS n_stop,
         CAST(len(list_distinct(toks)) AS DOUBLE) / len(toks) AS ttr
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
       (m.mean_word_len >= {GOPHER_MWL_LO} AND m.mean_word_len <= {GOPHER_MWL_HI}) AS mwl_ok,
       (m.n_stop >= {GOPHER_MIN_STOP}) AS stop_ok,
       (top.top_term_frac <= {GOPHER_MAX_TOP_FRAC}) AS rep_ok,
       (m.ttr >= {GOPHER_MIN_TTR}) AS ttr_ok,
       (m.n_words >= {GOPHER_MIN_WORDS} AND m.n_words <= {GOPHER_MAX_WORDS}
        AND m.mean_word_len >= {GOPHER_MWL_LO} AND m.mean_word_len <= {GOPHER_MWL_HI}
        AND m.n_stop >= {GOPHER_MIN_STOP}
        AND top.top_term_frac <= {GOPHER_MAX_TOP_FRAC}
        AND m.ttr >= {GOPHER_MIN_TTR}) AS keep
FROM metrics m JOIN top USING (doc_id)""",
)
