"""Data-selection extension surface (round 6).

The corpus operators a training-data pipeline runs AFTER dedup and
quality filtering, when deciding WHAT to keep and in what proportion:

- :func:`t_dsir_select` — DSIR-shaped importance selection: a hashed
  token-level domain classifier scores every document's affinity to a
  target domain (here ``lang='en'``); documents above an importance
  threshold are selected. The Data-Selection-via-Importance-Resampling
  shape (Xie et al. 2023) with the n-gram feature model reduced to
  engine-portable integer arithmetic.
- :func:`t_priority_sample` / :func:`t_weighted_sample` — deterministic
  uniform / size-biased k-samples via hash priorities. No RNG: the
  priority IS the sample, reproducible in any engine and stable under
  re-partitioning (the property a resumable 100 TB job needs).
- :func:`e_diverse_topk` — diversity-aware retrieval (the scalable MMR
  shape): LSH-shortlisted kNN candidates are re-ranked round-robin
  across LSH buckets so the top-k spans distinct semantic regions
  instead of k near-copies of the best hit.
- :func:`w_anomaly_mad` — median/MAD robust outlier detection per
  event type, the telemetry-cleaning twin of the quality filters.

Same contract as ``plans.llm_ext``: every query has a DuckDB oracle
twin with identical column aliases, integer fixed-point wherever a
group-sum could be partition-order-dependent, no Python UDFs on the
text path (the only Python is the Arrow-batched media decode, which
lives in ``operators.multimodal``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from f1_realtime_data_pipeline_spark.functions.text import (
    HASH_MOD,
    HASH_MULT,
    tokens,
    tokens_sql,
)
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


def _events(spark: SparkSession, sf_dir: str) -> DataFrame:
    return read_table(spark, sf_dir, "events")


# ---------------------------------------------------------------------------
# DSIR-shaped importance selection
#
# The paper trains two hashed n-gram LMs (target, raw) and keeps raw
# documents with high log-ratio. The engine-portable reduction here is
# the equivalent Naive-Bayes domain classifier on token occurrences:
# P(target | w) = cnt_target(w) / cnt_all(w) per token instance, mean
# over the document in ppm. cnt_target ≤ cnt_all always, so the ratio
# is an exact integer in [0, 1e6] — no logs, no floats, and the
# group-sum is shuffle-order-independent (the same fixed-point
# discipline as t_bigram_quality).
#
# Scale shape: one scan explodes token instances; the count tables are
# vocab-bounded (the target table strictly smaller); instances join
# back on the token key. At 100 TB swap the string key for
# xxhash64(token) so every shuffle row is 8 bytes, and broadcast the
# count tables when the vocab fits (they are df-capped in practice).
# The threshold form (selected = affinity ≥ τ) is deliberate: a global
# top-fraction would need a corpus-wide rank; the paper's resampling
# is threshold-equivalent for a fixed budget.
# ---------------------------------------------------------------------------

#: target-affinity threshold (ppm): keep docs whose mean token mass
#: is majority target-domain
DSIR_TAU_PPM = 500_000


def t_dsir_select(spark, sf_dir):
    """Importance selection toward the ``lang='en'`` target domain:
    per-doc mean P(target|token) in ppm, selected when ≥ τ."""
    d = _docs(spark, sf_dir).select("doc_id", "lang", tokens("text").alias("toks"))
    inst = d.select("doc_id", "lang", F.explode("toks").alias("w"))
    call = inst.groupBy("w").agg(F.count(F.lit(1)).alias("c_all"))
    ctgt = (
        inst.filter(F.col("lang") == "en")
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("c_tgt"))
    )
    counts = call.join(ctgt, "w", "left").select(
        "w", "c_all", F.coalesce("c_tgt", F.lit(0)).alias("c_tgt")
    )
    return (
        inst.join(counts, "w")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("int").alias("n_toks"),
            F.sum(F.expr("(c_tgt * 1000000) DIV c_all")).alias("__sum_ppm"),
        )
        .select(
            "doc_id",
            "n_toks",
            F.expr("__sum_ppm DIV n_toks").cast("bigint").alias("affinity_ppm"),
        )
        .withColumn("selected", F.col("affinity_ppm") >= DSIR_TAU_PPM)
    )


_register(
    "t_dsir_select",
    t_dsir_select,
    f"""WITH inst AS (
  SELECT doc_id, lang, w
  FROM (SELECT doc_id, lang, {tokens_sql('text')} AS t FROM documents),
       UNNEST(t) AS u(w)
), call AS (
  SELECT w, COUNT(*) AS c_all FROM inst GROUP BY w
), ctgt AS (
  SELECT w, COUNT(*) AS c_tgt FROM inst WHERE lang = 'en' GROUP BY w
), counts AS (
  SELECT call.w, c_all, COALESCE(c_tgt, 0) AS c_tgt
  FROM call LEFT JOIN ctgt ON call.w = ctgt.w
), scored AS (
  SELECT doc_id,
         CAST(COUNT(*) AS INT) AS n_toks,
         SUM((c_tgt * 1000000) // c_all) AS sum_ppm
  FROM inst JOIN counts USING (w)
  GROUP BY doc_id
)
SELECT doc_id, n_toks,
       CAST(sum_ppm // n_toks AS BIGINT) AS affinity_ppm,
       (sum_ppm // n_toks >= {DSIR_TAU_PPM}) AS selected
FROM scored""",
)


# ---------------------------------------------------------------------------
# deterministic hash-priority sampling
#
# priority(doc) = (doc_id · HASH_MULT) mod HASH_MOD — a fixed
# pseudo-random total order. The k smallest priorities ARE a uniform
# k-sample without replacement; dividing the priority by a weight
# makes it size-biased (the A-ES weighted-reservoir idea with the
# exponential draw replaced by an integer quotient, keeping both
# engines bit-exact). orderBy+limit compiles to TakeOrderedAndProject:
# each task keeps a local k-heap and the driver merges 32·k rows —
# no global sort, no single-task window, same plan at any corpus size.
# ---------------------------------------------------------------------------

#: sample size for the registered probes
SAMPLE_K = 64


def _priority():
    return F.pmod(F.col("doc_id") * F.lit(HASH_MULT), F.lit(HASH_MOD))


def t_priority_sample(spark, sf_dir):
    """Uniform deterministic k-sample: k smallest hash priorities
    (ties broken by doc_id; HASH_MOD is prime so collisions are rare
    and the order is total either way)."""
    d = _docs(spark, sf_dir)
    return (
        d.select("doc_id", "lang", _priority().alias("h"))
        .orderBy(F.col("h").asc(), F.col("doc_id").asc())
        .limit(SAMPLE_K)
    )


_register(
    "t_priority_sample",
    t_priority_sample,
    f"""SELECT doc_id, lang, (doc_id * {HASH_MULT}) % {HASH_MOD} AS h
FROM documents
ORDER BY h ASC, doc_id ASC LIMIT {SAMPLE_K}""",
)


def t_weighted_sample(spark, sf_dir):
    """Size-biased deterministic k-sample: priority = hash DIV weight,
    so a doc with twice the chars is ~twice as likely in the k head —
    the length-proportional sampling a token-budgeted eval draw uses."""
    d = _docs(spark, sf_dir)
    pri = F.expr(
        f"(((doc_id * {HASH_MULT}) % {HASH_MOD} + 1) * 1000000) DIV n_chars"
    )
    return (
        d.select("doc_id", "n_chars", pri.alias("priority"))
        .orderBy(F.col("priority").asc(), F.col("doc_id").asc())
        .limit(SAMPLE_K)
    )


_register(
    "t_weighted_sample",
    t_weighted_sample,
    f"""SELECT doc_id, n_chars,
       (((doc_id * {HASH_MULT}) % {HASH_MOD} + 1) * 1000000) // n_chars AS priority
FROM documents
ORDER BY priority ASC, doc_id ASC LIMIT {SAMPLE_K}""",
)


# ---------------------------------------------------------------------------
# diversity-aware retrieval (the scalable MMR shape)
#
# True maximal-marginal-relevance is a sequential greedy loop (each
# pick depends on all previous picks) — inherently driver-side. The
# distributed equivalent: shortlist candidates with the LSH kNN
# (bounded per query), then round-robin across the candidates' own
# LSH buckets — rank 1 of every bucket first, then rank 2, ... Every
# window partitions on (query, bucket) or (query) over a ≤SHORTLIST
# row set, so the op is per-query bounded work at any corpus size.
# ---------------------------------------------------------------------------

DIVERSE_QUERIES = 8
DIVERSE_SHORTLIST = 32
DIVERSE_K = 8


def e_diverse_topk(spark, sf_dir):
    """Top-k spanning distinct LSH buckets: bucket-round-robin re-rank
    of the LSH-shortlisted candidates."""
    embs = _embs(spark, sf_dir)
    short = sim.knn_lsh(embs, n_queries=DIVERSE_QUERIES, k=DIVERSE_SHORTLIST)
    bkt = sim.lsh_buckets(embs).withColumnRenamed("vec_id", "neighbor_id")
    j = short.join(F.broadcast(bkt), "neighbor_id")
    wb = Window.partitionBy("query_id", "bucket").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    wg = Window.partitionBy("query_id").orderBy(
        F.col("bucket_rnk").asc(), F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return (
        j.withColumn("bucket_rnk", F.row_number().over(wb).cast("int"))
        .withColumn("sel_rnk", F.row_number().over(wg).cast("int"))
        .filter(F.col("sel_rnk") <= DIVERSE_K)
        .select("query_id", "neighbor_id", "sel_rnk", "bucket", "cosine")
    )


_register(
    "e_diverse_topk",
    e_diverse_topk,
    f"""WITH short AS (
  SELECT * FROM ({sim.knn_lsh_sql(DIVERSE_QUERIES, DIVERSE_SHORTLIST)})
), bkt AS (
  {sim.LSH_BUCKETS_SQL}
), ranked AS (
  SELECT s.query_id, s.neighbor_id, b.bucket, s.cosine,
         CAST(ROW_NUMBER() OVER (PARTITION BY s.query_id, b.bucket
              ORDER BY s.cosine DESC, s.neighbor_id ASC) AS INT) AS bucket_rnk
  FROM short s JOIN bkt b ON b.vec_id = s.neighbor_id
)
SELECT query_id, neighbor_id, sel_rnk, bucket, cosine FROM (
  SELECT *, CAST(ROW_NUMBER() OVER (PARTITION BY query_id
            ORDER BY bucket_rnk ASC, cosine DESC, neighbor_id ASC) AS INT) AS sel_rnk
  FROM ranked
) WHERE sel_rnk <= {DIVERSE_K}""",
)


# ---------------------------------------------------------------------------
# robust outlier detection (median / MAD)
# ---------------------------------------------------------------------------


def w_anomaly_mad(spark, sf_dir):
    """Per-event-type robust outlier profile: median, median absolute
    deviation, and the count of values beyond 3·MAD. Two tiny
    aggregate dims (one row per event type) broadcast back onto the
    fact — the fact shuffles once per aggregation on the type key,
    never on value. Spark ``percentile`` and DuckDB ``quantile_cont``
    both linearly interpolate, so med/MAD are bit-identical (the
    a_percentiles parity)."""
    ev = _events(spark, sf_dir).select("event_type", "value")
    med = ev.groupBy("event_type").agg(
        F.percentile("value", F.lit(0.5)).alias("med")
    )
    dev = ev.join(F.broadcast(med), "event_type").withColumn(
        "adev", F.abs(F.col("value") - F.col("med"))
    )
    mad = dev.groupBy("event_type").agg(
        F.percentile("adev", F.lit(0.5)).alias("mad")
    )
    return (
        dev.join(F.broadcast(mad), "event_type")
        .groupBy("event_type", "med", "mad")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.sum(
                F.when(F.col("adev") > 3 * F.col("mad"), 1).otherwise(0)
            ).cast("bigint").alias("n_outliers"),
        )
        .select("event_type", "n", "med", "mad", "n_outliers")
    )


_register(
    "w_anomaly_mad",
    w_anomaly_mad,
    """WITH med AS (
  SELECT event_type, quantile_cont(value, 0.5) AS med
  FROM events GROUP BY event_type
), dev AS (
  SELECT e.event_type, m.med, abs(e.value - m.med) AS adev
  FROM events e JOIN med m USING (event_type)
), mad AS (
  SELECT event_type, quantile_cont(adev, 0.5) AS mad
  FROM dev GROUP BY event_type
)
SELECT d.event_type,
       CAST(COUNT(*) AS BIGINT) AS n,
       d.med, m.mad,
       CAST(SUM(CASE WHEN d.adev > 3 * m.mad THEN 1 ELSE 0 END) AS BIGINT)
           AS n_outliers
FROM dev d JOIN mad m USING (event_type)
GROUP BY d.event_type, d.med, m.mad""",
)
